package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 spill probe — NOT a spec: it needs two SparkContexts with
  * different STATIC memory configs (`spark.memory.fraction` is read
  * once at UnifiedMemoryManager construction), impossible inside the
  * shared-session suite. It MEASURES what the suite could only assert:
  * that the engine's heavy paths (global sort, high-cardinality hash
  * aggregation) degrade gracefully under memory pressure — same job,
  * same result checksum, NONZERO measured spill, job completes — the
  * 100 TB graceful-degradation story in numbers (VERDICT r11 #4; the
  * whole bench suite reads spill 0.0 at sf0.1, so without this the
  * claim was untested).
  *
  * Workload: real sf0.1 lineitem amplified 32x in-plan (~19M rows of
  * wide md5-keyed records, ~2 GB), globally ordered on the synthetic
  * high-cardinality key (range exchange + per-partition external sort:
  * the canonical ExternalSorter spill path), then a distinct-key
  * aggregation (UnsafeFixedWidthAggregationMap -> sort-based fallback
  * under pressure). Run 1 at the default `spark.memory.fraction` 0.6
  * (8 GB heap: fits, expect ~0 spill); run 2 at 0.05 (~400 MB unified
  * region shared by 8 tasks: each ~250 MB sort partition must spill).
  *
  * Run: sbt 'Test/runMain graft.SpillProbe /root/testdata/sf0.1'
  * Results are recorded in SCALING.md ("Measured spill").
  */
object SpillProbe {

  private val Amplify = 32

  private def session(constrained: Boolean): SparkSession = {
    val b = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .appName(if (constrained) "spill-probe-constrained" else "spill-probe")
    val s = (if (constrained) b.config("spark.memory.fraction", "0.05") else b)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** (sortSec, aggSec, checksum, snapshot) for one memory regime. */
  private def run(spark: SparkSession, dir: String) = {
    val m = BenchMetrics.attach(spark)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val big = li
      .withColumn("rep", explode(sequence(lit(1), lit(Amplify))))
      .withColumn("k", md5(concat_ws("-",
        col("l_orderkey"), col("l_partkey"), col("rep"))))
      // ~100B deterministic payload per row so the pressure is
      // realistic wide-record pressure, not just 8-byte keys
      .withColumn("payload", repeat(col("k"), 3))

    val s0 = m.snapshot()
    val t0 = System.nanoTime()
    big.orderBy("k").write.format("noop").mode("overwrite").save()
    val sortSec = (System.nanoTime() - t0) / 1e9
    val sSort = m.snapshot() - s0

    val t1 = System.nanoTime()
    val agg = big.groupBy("k")
      .agg(sum("l_quantity").as("q"), max("payload").as("c"))
    val checksum = agg // xor-fold: order-independent, never overflows
      .agg(expr("bit_xor(xxhash64(k, q, c))")).head().getLong(0)
    val aggSec = (System.nanoTime() - t1) / 1e9
    val sAgg = m.snapshot() - sSort - s0

    BenchMetrics.detach(spark, m)
    (sortSec, aggSec, checksum, sSort, sAgg)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def r2(d: Double) = math.rint(d * 100) / 100

    val sA = session(constrained = false)
    val (sortA, aggA, ckA, snapSortA, snapAggA) = run(sA, dir)
    sA.stop()

    val sB = session(constrained = true)
    assert(sB.sparkContext.getConf.get("spark.memory.fraction") == "0.05")
    val (sortB, aggB, ckB, snapSortB, snapAggB) = run(sB, dir)
    sB.stop()

    // graceful degradation means: completed, same answer, said its spill
    assert(ckA == ckB, s"checksum drifted under memory pressure: $ckA vs $ckB")
    println(s"""{"probe":"spill","amplify":$Amplify,"checksum_equal":true,""" +
      s""""unconstrained":{"sort_sec":${r2(sortA)},"agg_sec":${r2(aggA)},""" +
      s""""sort_spill_mb":${BenchMetrics.mb(snapSortA.spillB)},"agg_spill_mb":${BenchMetrics.mb(snapAggA.spillB)}},""" +
      s""""constrained_frac_0.05":{"sort_sec":${r2(sortB)},"agg_sec":${r2(aggB)},""" +
      s""""sort_spill_mb":${BenchMetrics.mb(snapSortB.spillB)},"agg_spill_mb":${BenchMetrics.mb(snapAggB.spillB)}},""" +
      s""""slowdown_sort":${r2(sortB / sortA)},"slowdown_agg":${r2(aggB / aggA)}}""")
    assert(snapSortB.spillB > 0 || snapAggB.spillB > 0,
      "constrained run measured ZERO spill — the probe no longer exercises the pressure path")
  }
}
