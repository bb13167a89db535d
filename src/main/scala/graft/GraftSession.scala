package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine assumes:
  * UTC timestamps (oracle parity), AQE on (runtime re-planning for skew
  * and post-shuffle coalescing at scale), shuffle partitions sized for
  * the local harness (a real deployment overrides per cluster).
  */
object GraftSession {
  def builder(master: String = "local[32]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // STATIC conf (only honored by the first session in the JVM): the
      // default 100-entry generated-class cache thrashes on a
      // 124-query surface — every pass re-Janino-compiles ~every plan,
      // and the churned one-shot classes fill the JIT code cache until
      // even a FIXED cached plan (the bench's compute canary) degrades
      // ~2x by pass 3 (measured round 11, idle machine: canary 0.47 ->
      // 1.04 s across one sweep). Sized to hold every plan this engine's
      // full surface compiles, with headroom for a real deployment's
      // query mix.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // every session built through here gets the graft SQL functions —
      // at the BUILDER level, so builder(...)-customizing callers (the
      // common path) are covered, not just the no-arg wrapper
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
