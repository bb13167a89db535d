package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * built from codegen'd higher-order functions (`zip_with`, `aggregate`,
  * `transform`) — distributed, no UDF, no driver round-trip.
  */
object VectorFunctions {

  /** Dot product of two numeric arrays (computed in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector has zero norm. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** L2-normalized copy of the vector (unit length); zero vector passes
    * through unchanged. Pre-normalizing once turns per-pair cosine into a
    * plain dot product — at 100 TB that halves the FLOPs of an ANN sweep.
    */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Coarse LSH bucket id for cosine ANN: sign bits of `nBits` fixed
    * pseudo-random hyperplane projections (deterministic seed). Vectors
    * in the same bucket are ANN candidates — turns an O(N^2) similarity
    * sweep into a per-bucket join.
    *
    * The hyperplanes are derived per-dimension from xxhash64(seed, dim,
    * bit) mapped to [-1, 1] — fully deterministic and computable inside
    * codegen without shipping a matrix.
    */
  def cosineLshBucket(vec: Column, nBits: Int, seed: Long = 42L): Column = {
    // projection p_b = sum_i v[i] * h(b, i), h in [-1, 1] derived from a hash
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) => {
          val h = xxhash64(lit(seed), lit(b), i)
          // map 64-bit hash to [-1, 1)
          v.cast("double") * (h.cast("double") / lit(Long.MaxValue.toDouble))
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
