package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** The bench's evidence pass rests on two properties of
  * [[BenchMetrics]]: a shuffling query's bytes show up in the delta,
  * and a narrow query between two drain points attributes ~nothing —
  * otherwise bench_metrics.json would smear one query's shuffle onto
  * the next and the ids-only numbers in SCALING.md would be fiction.
  */
class BenchMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("shuffle bytes attribute to the query that shuffled, narrow queries to ~zero") {
    val ml = BenchMetrics.attach(spark)
    try {

    // shuffling query: groupBy over enough distinct long keys that the
    // exchange provably writes bytes
    ml.resetPeak()
    val s0 = ml.snapshot()
    force(spark.range(0L, 100000L, 1L, 4)
      .select((col("id") % 5000).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s")))
    GraftBridge.drainListenerBus(spark)
    val shuffled = ml.snapshot() - s0
    assert(shuffled.shuffleWriteB > 0, "groupBy must report shuffle write bytes")
    assert(shuffled.shuffleWriteRec >= 5000,
      "partial-agg output must carry at least one record per distinct key")
    assert(shuffled.stages >= 2 && shuffled.tasks >= 2)

    // narrow query between drains: no shuffle may leak into its delta
    val s1 = ml.snapshot()
    force(spark.range(0L, 100000L, 1L, 4).select((col("id") * 2).as("d")))
    GraftBridge.drainListenerBus(spark)
    val narrow = ml.snapshot() - s1
    assert(narrow.shuffleWriteB == 0 && narrow.shuffleReadB == 0,
      s"narrow projection must attribute zero shuffle, got $narrow")
    assert(narrow.tasks >= 1, "the narrow query's own tasks still count")
    } finally BenchMetrics.detach(spark, ml) // shared session: never leak
  }

  test("peak memory is a per-query mark after resetPeak, and spill stays zero here") {
    val ml = BenchMetrics.attach(spark)
    try {
    ml.resetPeak()
    val s0 = ml.snapshot()
    force(spark.range(0L, 50000L, 1L, 4)
      .select((col("id") % 100).as("k")).groupBy("k").count())
    GraftBridge.drainListenerBus(spark)
    val d = ml.snapshot() - s0
    assert(d.peakTaskMemB >= 0)
    assert(d.spillB == 0, "an in-memory 50k-row agg must not spill")
    // the mark resets — a later tiny job must not inherit the agg's peak
    ml.resetPeak()
    val s1 = ml.snapshot()
    force(spark.range(0L, 10L, 1L, 1).select(col("id")))
    GraftBridge.drainListenerBus(spark)
    val tiny = ml.snapshot() - s1
    assert(tiny.peakTaskMemB <= d.peakTaskMemB)
    } finally BenchMetrics.detach(spark, ml) // shared session: never leak
  }
}
