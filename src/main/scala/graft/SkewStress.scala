package graft

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Boilerplate-gram skew stress for [[Dedup.spanDuplication]] — the
  * measurement behind SCALING.md "Span dedup under boilerplate skew".
  *
  * Corpus: `N` docs of 5 unique tokens; HALF also carry the same
  * 3-token boilerplate tail, so with n=3 exactly ONE gram hash occurs
  * in 50% of documents (straddling grams mix unique tokens and stay
  * unique). The skew lands in the dup-flag join's probe-side shuffle —
  * the document-frequency aggregate is immune (map-side partial
  * combine collapses the hot gram to one row per map partition).
  *
  * What the three configs establish:
  *  - `off`    — AQE disabled, plain join: the naked straggler.
  *  - `aqe`    — AQE enabled with skew thresholds tuned far below the
  *               hot partition's size (8 MB threshold, factor 2,
  *               4 MB advisory). The split STILL never fires:
  *               OptimizeSkewedJoin only matches
  *               SortMergeJoin(Sort(ShuffleQueryStage),
  *               Sort(ShuffleQueryStage)) where BOTH stages carry the
  *               ENSURE_REQUIREMENTS origin, and the dup-gram
  *               aggregate — already partitioned on the join key —
  *               fuses into the join stage with its exchange elided
  *               (a hand-inserted repartition doesn't help either:
  *               REPARTITION_BY_COL is rejected by the same matcher).
  *  - `salted` — AQE disabled, `saltBuckets = 32`: the explicit
  *               mitigation the operator ships, spreading the hot
  *               gram's probe rows across 32 reducers.
  *
  * Broadcast demotion is disabled in EVERY config
  * (autoBroadcastJoinThreshold = -1, static and adaptive): the
  * synthetic dup-gram table is one row, so AQE would otherwise convert
  * the join to broadcast and no skewed exchange would exist to
  * measure. That conversion is real and desirable at THIS size, but
  * the regime the operator's `saltBuckets` knob addresses is a
  * web-scale corpus whose dup-gram set (millions of boilerplate
  * grams) far exceeds any broadcast threshold — there the sort-merge
  * path is forced and the hot gram's probe-side partition is the
  * straggler this stress isolates.
  *
  * Usage: `sbt "runMain graft.SkewStress <off|aqe|salted> [nDocs]
  * [shufflePartitions]"` (default 8M docs, 256 partitions) — ONE
  * config per JVM, because an early in-process measurement poisons
  * later ones (accumulated shuffle spill + GC pressure inflated a
  * repeat of the warmup config 3.6× in the same JVM). Prints wall
  * seconds + max single-task ms (median of 3 after one warmup); set
  * GRAFT_SKEW_STAGES=1 for a per-stage task-time breakdown and DEBUG
  * logs from the adaptive planner.
  *
  * 256 partitions (not the suite's 32) models the cluster regime the
  * claim is about: thousands of reducers, each holding a sliver of the
  * corpus, EXCEPT the one that owns the hot gram — at 32 partitions on
  * 8M docs every reducer carries ~1.1M rows and the 5M-row hot
  * partition barely pokes above the pack, which hides exactly the
  * straggler a 1000-executor run would see.
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("salted")
    val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(8000000L)
    val nPart = args.drop(2).headOption.map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", nPart)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_SKEW_STAGES"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)
    import spark.implicits._

    // 5 unique tokens per doc (hash-derived, no RNG); even ids append
    // the boilerplate tail -> ONE gram ("bp1 bp2 bp3") in 50% of docs
    val tok = (k: Int) => hex(xxhash64(col("id") * lit(k) + lit(k)))
    val corpus = spark.range(0L, nDocs, 1L, 32)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          tok(1), tok(2), tok(3), tok(4), tok(5),
          when(pmod(col("id"), lit(2)) === 0, lit("bp1 bp2 bp3"))
            .otherwise(lit(""))).as("text"))
      .localCheckpoint(true) // generation cost stays out of the timings

    @volatile var maxTaskMs = 0L
    val stageStats = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          maxTaskMs = math.max(maxTaskMs, t.taskInfo.duration)
          stageStats.merge(t.stageId, (1, t.taskInfo.duration),
            (a, b) => (a._1 + b._1, math.max(a._2, b._2)))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // model the corpus-scale regime: dup-gram set too big to broadcast
    val noBroadcast = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val (confs, saltBuckets) = mode match {
      case "off" =>
        (noBroadcast + ("spark.sql.adaptive.enabled" -> "false"), 1)
      case "aqe" =>
        (noBroadcast ++ Map(
          "spark.sql.adaptive.enabled" -> "true",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m"), 1)
      case "salted" =>
        (noBroadcast + ("spark.sql.adaptive.enabled" -> "false"), 32)
      case other => sys.error(s"unknown mode '$other' (off|aqe|salted)")
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    def once(): (Double, Long) = {
      maxTaskMs = 0L
      stageStats.clear()
      val t0 = System.nanoTime()
      Dedup.spanDuplication(corpus, "text", "doc_id", n = 3, minDocs = 2,
          saltBuckets = saltBuckets)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener events are async; let the bus drain
      if (sys.env.contains("GRAFT_SKEW_STAGES")) {
        import scala.jdk.CollectionConverters._
        println(stageStats.asScala.toSeq.sortBy(_._1)
          .map { case (sid, (n, mx)) => s"stage=$sid tasks=$n maxTask=${mx}ms" }
          .mkString("[stages] ", " | ", ""))
      }
      (wall, maxTaskMs)
    }
    once() // warmup: codegen + page-in
    val times = (1 to 3).map(_ => once())
    val med = times.sortBy(_._1).apply(times.size / 2)
    println(f"[skew] $mode%-8s nDocs=$nDocs parts=$nPart wall=${med._1}%6.2f s  maxTask=${med._2}%5d ms" +
      s"  (all walls: ${times.map(t => f"${t._1}%.2f").mkString(", ")})")

    spark.stop()
  }
}
