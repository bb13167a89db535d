package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query surface lives in [[Queries]]; this object adapts it to
  * the driver's Map-based shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A TPC-H-Q1-style scan→aggregate (the reference's bread-and-butter
    * group-by, SURVEY.md §2.5).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.all.find(_.name == "q_agg").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Since round 8 the hash-based families
    * (MinHash/SimHash LSH, BPE, feature hashing, sampling) are covered
    * too — [[OracleSqlGen]] replays the engine's xxhash64/murmur3
    * bit-for-bit in SQL. Since round 9 there are NO omissions: the
    * float32-bound approximate queries (ANN LSH/IVF, embedding cosine)
    * carry real oracles on the strength of tools/ann_margin_audit.py
    * (every float decision sits 8–10 orders of magnitude above
    * summation-order noise at this SF, so the candidate sets are
    * engine-independent), and CORRECTNESS_r09 shows the whole
    * 124-query surface rows+schema+hash green.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
