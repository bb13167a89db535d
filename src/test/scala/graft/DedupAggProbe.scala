package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 near-unique-key aggregation probe (VERDICT r12 #2) — NOT a
  * spec: like [[SpillProbe]] it needs separate SparkContexts because
  * `spark.memory.fraction` is static. SpillProbe measured unconstrained
  * hash aggregation 6× SLOWER than the spill-constrained run on
  * near-unique keys (SCALING.md "Measured spill" #3), and the dedup
  * suite aggregates on near-unique keys on its scale paths —
  * `Dedup.exact` groups by content fingerprint, `lineDedup` by line
  * hash, the CDC census by chunk fingerprint. This probe reproduces the
  * regime ON THE REAL `Dedup.exact` census and measures the mitigation:
  *
  *   A. pathology regime: an all-unique-fingerprint corpus in FEW input
  *      partitions, so each task's partial aggregation map grows toward
  *      the memory region (the map delivers zero reduction on unique
  *      keys — all cost, no combine);
  *   B. split-sizing mitigation: the SAME corpus in many input
  *      partitions — each partial map stays small/young-gen sized.
  *      This is the knob a deployment actually has: parquet split size
  *      (`spark.sql.files.maxPartitionBytes`, default 128 MB ≈ 10⁵
  *      documents per task — orders of magnitude BELOW the regime
  *      boundary, i.e. the census avoids the pathology by construction
  *      at default split sizing; only a many-GB split could enter it);
  *   C. constrained memory (`spark.memory.fraction` 0.05) on the few-
  *      partition corpus: the early sort-based fallback SpillProbe saw
  *      win — confirms the pathology is the oversized in-region map,
  *      not the aggregation itself.
  *
  * All three regimes must produce the identical census checksum.
  * Results + the keys-per-task sizing rule are recorded in SCALING.md
  * ("Near-unique-key aggregation") and COVERAGE.md.
  *
  * Run: sbt 'Test/runMain graft.DedupAggProbe [nRows]'  (default 80M)
  */
object DedupAggProbe {

  private def session(tag: String, fraction: Option[String]): SparkSession = {
    val b = GraftSession.builder(master = "local[8]", shufflePartitions = 64)
      .appName(s"dedup-agg-probe-$tag")
    val s = fraction.fold(b)(f => b.config("spark.memory.fraction", f)).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** (wallSec, gcSec, spillMb, checksum) of the Dedup.exact census over
    * n unique-text rows laid out in `parts` input partitions. */
  private def run(spark: SparkSession, n: Long, parts: Int) = {
    val m = BenchMetrics.attach(spark)
    // unique text per row -> unique content fingerprint per row: the
    // worst case for hash aggregation (zero combine)
    val docs = spark.range(0L, n, 1L, parts)
      .select(col("id").as("doc_id"), hex(xxhash64(col("id"))).as("text"))
    val s0 = m.snapshot()
    val gc0 = gcMillis()
    val t0 = System.nanoTime()
    val census = graft.operators.Dedup.exact(docs, "text", "doc_id")
    val checksum = census
      .agg(expr("bit_xor(xxhash64(keep_id, dup_count))")).head().getLong(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val gcSec = (gcMillis() - gc0) / 1e3
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    val snap = m.snapshot() - s0
    BenchMetrics.detach(spark, m)
    (wall, gcSec, BenchMetrics.mb(snap.spillB), checksum)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(80000000L)
    def r2(d: Double) = math.rint(d * 100) / 100

    val sA = session("few-parts", None)
    val (wA, gA, spA, ckA) = run(sA, n, parts = 8) // n/8 keys per partial map
    sA.stop()

    val sB = session("many-parts", None)
    val (wB, gB, spB, ckB) = run(sB, n, parts = 512) // n/512 keys per map
    sB.stop()

    val sC = session("constrained", Some("0.05"))
    val (wC, gC, spC, ckC) = run(sC, n, parts = 8)
    sC.stop()

    assert(ckA == ckB && ckB == ckC,
      s"census checksum drifted across regimes: $ckA / $ckB / $ckC")
    println(s"""{"probe":"dedup_agg","n":$n,"checksum_equal":true,""" +
      s""""few_parts_8":{"wall_sec":${r2(wA)},"gc_sec":${r2(gA)},"spill_mb":$spA},""" +
      s""""many_parts_512":{"wall_sec":${r2(wB)},"gc_sec":${r2(gB)},"spill_mb":$spB},""" +
      s""""constrained_frac_0.05_parts_8":{"wall_sec":${r2(wC)},"gc_sec":${r2(gC)},"spill_mb":$spC},""" +
      s""""speedup_split_sizing":${r2(wA / wB)},"speedup_constrained":${r2(wA / wC)}}""")
  }
}
