package graft

import org.apache.spark.sql.functions._

/** The properties q_hll_persisted's two-stage shape depends on:
  * DataSketches HLL sketches survive a parquet round-trip, and the
  * union of per-partition sketches estimates the same cardinality as
  * one global sketch — without both, "sketch once, merge forever"
  * would silently re-read the corpus or drift on merge.
  */
class HllPersistedSpec extends SparkSpec {
  import spark.implicits._

  test("split-union-estimate ≡ whole-estimate, through a parquet round-trip") {
    val n = 20000
    val df = (1 to n).map(i => (s"part${i % 4}", (i % 7001).toLong))
      .toDF("part", "v")
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"), 14)))
      .collect().head.getLong(0)

    val dir = java.nio.file.Files.createTempDirectory("graft_hll_spec_").toString
    df.groupBy("part").agg(hll_sketch_agg(col("v"), 14).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect().head.getLong(0)

    // HllSketch union of disjoint-keyed partitions is the same sketch
    // state as one pass — estimates must agree EXACTLY, not just within
    // error (both saw identical values; union is associative)
    assert(merged == whole, s"merged=$merged whole=$whole")
    // and the estimate is actually close to the 7001 true distinct
    assert(math.abs(merged - 7001.0) / 7001.0 < 0.05, s"estimate $merged")
  }

  test("incremental append: a new source's sketch refines the rollup without old data") {
    val a = (1 to 5000).map(i => ("srcA", (i % 1000).toLong)).toDF("source", "v")
    val b = (1 to 5000).map(i => ("srcB", (i % 1000 + 500).toLong)).toDF("source", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_spec2_").toString
    a.groupBy("source").agg(hll_sketch_agg(col("v"), 14).as("sk"))
      .write.mode("overwrite").parquet(dir)
    // day 2: append srcB's sketch only — srcA's rows are never re-read
    b.groupBy("source").agg(hll_sketch_agg(col("v"), 14).as("sk"))
      .write.mode("append").parquet(dir)
    val est = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect().head.getLong(0)
    // true distinct of {0..999} ∪ {500..1499} = 1500
    assert(math.abs(est - 1500.0) / 1500.0 < 0.05, s"estimate $est")
  }
}
