package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line of per-query seconds.
  *
  * Methodology: a warmup action first absorbs JVM/codegen/parquet-footer
  * costs (otherwise whichever query runs first eats ~4 s of startup);
  * results are forced through the `noop` sink so every output column is
  * actually computed — `.count()` would let Catalyst prune a
  * projection-only query down to a scan. Each query runs
  * SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the per-query
  * MEDIAN — a single contended run on a shared machine must not
  * masquerade as a regression (round 2's single-shot artifact read 1.9×
  * on noise alone).
  *
  * Contention canary (round 7): round 6's driver bench ran on a machine
  * so contended the artifact was unusable (sbt 1192 s vs 191 s idle;
  * per-query inflation NON-uniform — single-stage controls ~1.5–2× but
  * multi-stage queries 10–80×, because the per-stage scheduling floor
  * multiplies). Medians can't save a run where EVERY pass is contended,
  * so the bench now measures the machine itself with two fixed-cost,
  * data-independent probes and emits the ratio against pinned idle
  * values:
  *   - compute canary: one 10M-row in-memory shuffle+agg (one exchange,
  *     codegen arithmetic) — tracks raw CPU/memory-bandwidth contention;
  *   - scheduling canary: 8 consecutive tiny shuffled actions — tracks
  *     the per-stage scheduling floor that inflates multi-stage queries
  *     far more than single-stage ones.
  * A canary sample runs before each query pass and once after the last,
  * and the JSON line carries the medians plus
  * `contention_factor` (compute) and `sched_factor` (scheduling).
  * Reading rule (also in BASELINE.md): factors ≤1.5 → times are
  * evidence; either factor >2 → adjudicate any apparent regression with
  * an idle `SPARK_GRAFT_BENCH_ONLY` re-run before believing it, and
  * expect multi-stage queries to inflate ~sched_factor while
  * single-stage ones inflate ~contention_factor.
  */
object Bench {
  /** Idle-machine pinned canary medians (this sandbox, local[32],
    * measured round 7: two independent 4-sample medians gave
    * compute 0.62/0.60 s and sched 2.38/1.86 s). If the harness
    * hardware changes, re-pin by running the bench idle and copying the
    * canary medians from the JSON line.
    */
  val PinnedComputeSec = 0.60
  val PinnedSchedSec = 2.10
  /** The pins above are only valid at this parallelism (the driver's
    * `cpus: 32` in every BENCH artifact). The canary cost scales with
    * `local[N]` — at other cpus the factors are emitted as -1 rather
    * than as a false contention signal. */
  val PinnedCpus = 32

  /** Aggregate execution-metric fields for the main JSON line: totals
    * over all benched queries (the per-query detail is in
    * bench_metrics.json). Empty string when the metrics pass is off. */
  private def metricAggFields(rows: Seq[(String, BenchMetrics.Snap)]): String =
    if (rows.isEmpty) "" else {
      val w = rows.map(_._2.shuffleWriteB).sum
      val sp = rows.map(_._2.spillB).sum
      s""","shuffle_write_mb_total":${BenchMetrics.mb(w)},"spill_mb_total":${BenchMetrics.mb(sp)}"""
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // testdata-drift tripwire (round 7: a silent regeneration broke six
    // queries) — loud stderr diff, and the drift count rides the JSON line
    val schemaDrift = SchemaGuard.warn(spark, sfDir)

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: one small end-to-end action per table family
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      force(li.groupBy("l_returnflag").agg(count(lit(1))))
      force(spark.read.parquet(s"$sfDir/documents.parquet").limit(100))
      force(spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100))
    } catch { case _: Throwable => () }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // Fixed-cost machine probes — in-memory `range` sources, so the cost
    // is pure compute + scheduling and never parquet/page-cache state.
    def canarySample(): (Double, Double) = {
      import org.apache.spark.sql.functions._
      val par = cpus.toInt
      val t0 = System.nanoTime()
      // xxhash64 gives real per-row compute; % 1e6 keeps the 10M-row sum
      // far from Long overflow under ANSI mode
      force(spark.range(0L, 10000000L, 1L, par)
        .select((col("id") % 1024).as("k"),
          (xxhash64(col("id")) % 1000000L).as("v"))
        .groupBy("k").agg(sum("v").as("s"), avg("v").as("a"),
          max("v").as("m")))
      val compute = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      (1 to 8).foreach { _ =>
        force(spark.range(0L, 1000L, 1L, par)
          .select((col("id") % 7).as("k"))
          .groupBy("k").agg(count(lit(1)).as("c")))
      }
      val sched = (System.nanoTime() - t1) / 1e9
      (compute, sched)
    }
    // one throwaway canary absorbs its own codegen compilation
    canarySample()

    // run-major order (all queries, then the next full pass) so repeated
    // runs of one query don't benefit from a still-hot page cache more
    // than the driver's single-pass methodology would
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b narrows the surface for local
    // iteration on one query's plan; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the query surface: " +
          s"${unknown.toSeq.sorted.mkString(",")} — a typo would silently bench nothing")
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val canaries = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val samples = (1 to runs).map { _ =>
      canaries += canarySample()
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { force(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    canaries += canarySample()
    val results = names.map { case (name, _) =>
      val mine = samples.map(_.find(_._1 == name).get)
      (name, median(mine.map(_._2)), mine.forall(_._3))
    }

    // ---- evidence pass (untimed): per-query shuffle/input/spill
    // accounting via task metrics. Runs AFTER the timed passes so the
    // listener-bus drain points can't perturb the timing methodology.
    // SCALING.md's "shuffles carry ids/sketches, not documents" and
    // "no spill at this SF" claims become measured numbers here.
    val metricsOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_METRICS", "1") != "0"
    val metricErrors = scala.collection.mutable.ArrayBuffer.empty[String]
    val metricRows: Seq[(String, BenchMetrics.Snap)] = if (!metricsOn) Nil else {
      val ml = BenchMetrics.attach(spark)
      val rows = names.flatMap { case (name, fn) =>
        ml.resetPeak()
        val before = ml.snapshot()
        val ok =
          try { force(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            // same contract as the timed pass: a failure is NAMED, and
            // its truncated metrics never masquerade as a measurement
            System.err.println(s"[bench] metrics pass: $name FAILED: ${e.getMessage}")
            metricErrors += name
            false
          }
        org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        // drain again after a failure: cancelled tasks can still post
        // TaskEnd events that would smear into the NEXT query's delta
        if (!ok) org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
        if (ok) Some((name, ml.snapshot() - before)) else None
      }
      BenchMetrics.detach(spark, ml)
      rows
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries are named explicitly — a time-to-failure must never
    // read as a fast success
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    val canaryCompute = r3(median(canaries.map(_._1).toSeq))
    val canarySched = r3(median(canaries.map(_._2).toSeq))
    // factors against pins measured at a DIFFERENT parallelism would be
    // systematically wrong in both directions (local[4] idle reads >2×
    // the local[32] compute pin) — emit the sentinel instead
    val pinsValid = cpus.toInt == PinnedCpus
    val contentionFactor = if (pinsValid) r3(canaryCompute / PinnedComputeSec) else -1.0
    val schedFactor = if (pinsValid) r3(canarySched / PinnedSchedSec) else -1.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"cpus":$cpus,""" +
        s""""canary_compute_sec":$canaryCompute,"canary_sched_sec":$canarySched,""" +
        s""""pinned_compute_sec":$PinnedComputeSec,"pinned_sched_sec":$PinnedSchedSec,"pinned_cpus":$PinnedCpus,""" +
        s""""contention_factor":$contentionFactor,"sched_factor":$schedFactor,""" +
        s""""schema_drift":${schemaDrift.size},"sf":"$sfDir"""" +
        metricAggFields(metricRows) + "}"
    println(line)
    // per-query execution metrics land in their own artifact — the main
    // line stays within the driver's capture window; the detail file is
    // committed and interpreted in SCALING.md
    if (metricRows.nonEmpty) {
      val body = metricRows.map { case (n, s) => "\"" + n + "\":{" + s.jsonFields + "}" }
        .mkString("{", ",", "}")
      val mErrs = metricErrors.map("\"" + _ + "\"").mkString("[", ",", "]")
      val doc = s"""{"sf":"$sfDir","cpus":$cpus,"metrics_errors":$mErrs,"queries":$body}"""
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_metrics.json"), doc + "\n")
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write bench_metrics.json: ${e.getMessage}")
      }
    }
    // the driver's stdout capture has truncated the tail of this line in
    // past rounds (BENCH_r07 showed 56/88 queries) — persist the full
    // line in-repo so the artifact never depends on a capture window
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write bench_last.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
