package graft

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pins the bench's budget-degradation contract (round 10's flagship,
  * previously demonstrated only by one contended driver run): an
  * exhausted wall budget must DEGRADE the run — pass 1 complete,
  * later passes dropped, metrics skipped, everything said out loud in
  * the artifact — never truncate it. Driven through [[Bench.run]] with
  * an explicit config; no env vars, no subprocess, deterministic by
  * construction (a sub-millisecond budget is over before pass 1 ends,
  * so the between-pass stop is guaranteed, and pass 1 still completes
  * because the contract says it always does).
  */
class BenchBudgetSpec extends SparkSpec {
  private val mapper = new ObjectMapper()
  private val surface = Set("q_agg", "q_filter", "q_select_rename_cast")

  private def cfg(dir: String, budget: Double) = Bench.BenchConfig(
    sfDir = "/root/testdata/sf0.001",
    cpus = 4, runs = 3, budgetSec = budget, only = Some(surface),
    metricsOn = true,
    summaryPath = s"$dir/summary.json",
    ledgerPath = s"$dir/ledger.jsonl",
    metricsPath = s"$dir/metrics.json")

  test("budget narrowing (r13): controls, then loop queries, then new, then " +
    "alphabetical — cost-greedy, controls unconditional, skipped returned") {
    val all = Seq("q_agg", "q_alpha", "q_dup_clusters_dist", "q_filter",
      "q_kmeans", "q_pagerank", "q_zeta")
    val est = Map("q_agg" -> 1.0, "q_filter" -> 1.0, "q_pagerank" -> 10.0,
      "q_dup_clusters_dist" -> 10.0, "q_kmeans" -> 10.0,
      "q_alpha" -> 1.0, "q_zeta" -> 1.0)
    // budget 90 (= 100 × 0.9), runs 3: controls cost 3+3, pagerank 30
    // (cum 36), dup_clusters_dist 30 (66), kmeans 30 would hit 96 > 90
    // → SKIPPED; the cheaper alphabetical tail still fits (69, 72)
    val (keep, skip) = Bench.narrowSurface(all, est, remainingSec = 100.0, runs = 3)
    assert(skip === Seq("q_kmeans"))
    assert(keep.toSet === all.toSet - "q_kmeans")
    // surface order is preserved for a stable artifact layout
    assert(keep === all.filterNot(_ == "q_kmeans"))

    // zero remaining budget: the controls are kept UNCONDITIONALLY (the
    // evidence verdict is computed from them), everything else drops
    val (keepMin, skipMin) = Bench.narrowSurface(all, est, remainingSec = 0.0, runs = 3)
    assert(keepMin === Seq("q_agg", "q_filter"))
    assert(skipMin.toSet === all.toSet -- keepMin)

    // a query the warmup never reached is costed as bad as the WORST
    // observed estimate (here q_big's 10 s) — optimism must not
    // re-inflate the surface: q_unseen projects at 30 s and drops,
    // while the cheap measured query still fits
    val (keepW, skipW) = Bench.narrowSurface(
      Seq("q_agg", "q_big", "q_cheap", "q_unseen"),
      Map("q_agg" -> 1.0, "q_big" -> 10.0, "q_cheap" -> 1.0),
      remainingSec = 10.0, runs = 3)
    assert(!keepW.contains("q_unseen") && keepW.contains("q_cheap"))
    assert(skipW.toSet === Set("q_big", "q_unseen"))

    // a surface without controls never narrows to nothing
    val (keepNc, _) = Bench.narrowSurface(
      Seq("q_x", "q_y"), Map("q_x" -> 5.0, "q_y" -> 5.0),
      remainingSec = 0.0, runs = 3)
    assert(keepNc.nonEmpty)
  }

  test("new queries derive from the committed pin surface, not a " +
    "hand-maintained list (r15, VERDICT r14 #2)") {
    val all = Seq("q_agg", "q_filter", "q_new_a", "q_new_b", "q_old")
    // everything pinned last round except the two r-new queries
    val prevPinned = Set("q_agg", "q_filter", "q_old")
    assert(Bench.newQueries(all, prevPinned) === Seq("q_new_a", "q_new_b"))
    // no history → nothing distinguishable as new (never guess)
    assert(Bench.newQueries(all, Set.empty) === Seq.empty)
    // and the derived set rides the priority tier: under a budget that
    // fits only controls + 2 more, the NEW queries survive while the
    // alphabetically-earlier old query drops
    val est = all.map(_ -> 1.0).toMap
    val (keep, _) = Bench.narrowSurface(all, est, remainingSec = 14.0,
      runs = 3, newQs = Seq("q_new_a", "q_new_b"))
    assert(keep.toSet === Set("q_agg", "q_filter", "q_new_a", "q_new_b"))
  }

  test("skip rotation: queries skipped last sweep run first in the " +
    "residual, so the full surface is covered within 2 pressured rounds") {
    val all = (1 to 8).map(i => f"q_t$i%02d") ++ Seq("q_agg", "q_filter")
    val est = all.map(_ -> 1.0).toMap
    // budget fits controls + 4 residuals per round (remaining 20 ×
    // 0.9 = 18; 6 queries × 3 runs = 18)
    val (keep1, skip1) = Bench.narrowSurface(all, est, 20.0, 3)
    assert(keep1.count(_.startsWith("q_t")) === 4)
    // round 2: last round's skips go first
    val (keep2, skip2) = Bench.narrowSurface(all, est, 20.0, 3,
      skippedFirst = skip1)
    assert(skip1.toSet.subsetOf(keep2.toSet),
      s"rotation must run all previously-skipped first: $skip1 vs $keep2")
    // two pressured rounds cover every query
    assert((keep1 ++ keep2).toSet === all.toSet)
    assert(skip2.toSet.subsetOf(keep1.toSet))
  }

  test("priorSurface reads the committed sweep (pinned set + skipped " +
    "list) and never dies on absent/garbage history") {
    val dir = Files.createTempDirectory("graft_hist").toString
    val p = s"$dir/hist.json"
    Files.write(Paths.get(p),
      """{"queries":{"q_a":1.0,"q_b":2.0},"queries_skipped_budget":["q_c","q_d"]}"""
        .getBytes("UTF-8"))
    assert(Bench.priorSurface(p) === ((Set("q_a", "q_b"), Seq("q_c", "q_d"))))
    assert(Bench.priorSurface(s"$dir/absent.json") === ((Set.empty, Seq.empty)))
    Files.write(Paths.get(p), "not json{".getBytes("UTF-8"))
    assert(Bench.priorSurface(p) === ((Set.empty, Seq.empty)))
  }

  test("exhausted budget degrades to a full-surface 1-pass artifact") {
    val dir = Files.createTempDirectory("graft_benchbudget").toString
    val line = Bench.run(spark, cfg(dir, budget = 0.001))
    val root = mapper.readTree(line) // the whole line parses
    // pass 1 always completes: every query sampled exactly once, ok
    assert(root.get("passes_completed").asInt() === 1)
    assert(root.get("queries").properties().asScala.map(_.getKey).toSet === surface)
    root.get("queries").properties().asScala.foreach { e =>
      assert(e.getValue.asDouble() > 0.0, s"${e.getKey} has no real sample")
    }
    assert(root.get("errors").size() === 0)
    // one pass ⇒ the jitter spread collapses onto the single sample
    surface.foreach { q =>
      assert(root.get("queries_min").get(q).asDouble() ===
        root.get("queries_max").get(q).asDouble())
    }
    // the curtailment is SAID, both ways it can happen
    assert(root.get("budget_stopped").asBoolean(), "between-pass budget exit must set budget_stopped")
    assert(root.get("metrics_skipped_budget").asBoolean())
    // an exhausted budget also means no warmup sweep completed — the
    // artifact must not claim a steady-state window it never had
    assert(root.get("warmup_passes").asInt() === 0)
    // with no warmup sweep there are no per-query estimates, so the
    // r13 narrowing CANNOT engage — the surface stays full and the
    // skip list is affirmatively empty (not absent)
    assert(root.get("queries_skipped_budget").size() === 0)
    // skipped metrics ⇒ no aggregate totals that could masquerade as a
    // full-surface measurement
    assert(root.get("shuffle_write_mb_total") == null)
    assert(root.get("metrics_queries_covered") == null)
    // the persisted summary equals the returned line, and the ledger is
    // line-parseable with the stop events on record
    assert(Files.readString(Paths.get(s"$dir/summary.json")).trim === line)
    val events = Files.readAllLines(Paths.get(s"$dir/ledger.jsonl")).asScala
      .filter(_.nonEmpty).map(l => mapper.readTree(l).get("event").asText())
    assert(events.count(_ == "query") === surface.size)
    assert(events.contains("budget_stop_between_passes"))
    assert(events.contains("metrics_skipped_budget"))
  }

  test("planted mid-run failure (r14): errors name the query, the jitter " +
    "spread covers SUCCESSFUL samples only, a zero-success query nulls out") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_benchfail").toString
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    // fails on its SECOND timed invocation only (warmup=0 below, so the
    // call sequence is exactly pass1 ok, pass2 FAIL, pass3 ok)
    val flaky: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame = (s, _) =>
      if (calls.incrementAndGet() == 2)
        s.range(1).select(raise_error(lit("planted pass-2 failure")).as("x"))
      else s.range(1000).select((col("id") % 7).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
    // fails on EVERY invocation: the zero-success shape
    val dead: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame = (s, _) =>
      s.range(1).select(raise_error(lit("planted always-fail")).as("x"))
    val c = cfg(dir, budget = 3600.0).copy(
      only = Some(surface ++ Set("q_flaky_planted", "q_dead_planted")),
      warmup = 0, metricsOn = false,
      extraQueries = Map("q_flaky_planted" -> flaky, "q_dead_planted" -> dead))
    val line = Bench.run(spark, c)
    val root = mapper.readTree(line)
    assert(root.get("passes_completed").asInt() === 3)
    // a time-to-failure must never read as a fast success
    val errs = root.get("errors").asScala.map(_.asText()).toSet
    assert(errs === Set("q_flaky_planted", "q_dead_planted"))
    // recompute the expected spread from the ledger's per-sample truth:
    // min/max must equal the extremes of the OK samples alone
    val samples = Files.readAllLines(Paths.get(s"$dir/ledger.jsonl")).asScala
      .filter(_.nonEmpty).map(mapper.readTree(_))
      .filter(n => n.get("event").asText() == "query" &&
        n.get("q").asText() == "q_flaky_planted")
    assert(samples.size === 3)
    assert(samples.map(_.get("ok").asBoolean()).toSeq === Seq(true, false, true))
    val okSecs = samples.filter(_.get("ok").asBoolean()).map(_.get("sec").asDouble())
    assert(root.get("queries_min").get("q_flaky_planted").asDouble() === okSecs.min)
    assert(root.get("queries_max").get("q_flaky_planted").asDouble() === okSecs.max)
    // zero successful passes: spread is null (the query is already in
    // errors), never a min/max synthesized from failure times
    assert(root.get("queries_min").get("q_dead_planted").isNull)
    assert(root.get("queries_max").get("q_dead_planted").isNull)
    // untouched queries keep a full non-null spread
    surface.foreach { q =>
      assert(!root.get("queries_min").get(q).isNull)
      assert(root.get("queries_min").get(q).asDouble() > 0.0)
    }
  }

  test("ample budget completes all passes and reports full metrics coverage") {
    val dir = Files.createTempDirectory("graft_benchbudget").toString
    val line = Bench.run(spark, cfg(dir, budget = 3600.0))
    val root = mapper.readTree(line)
    assert(root.get("passes_completed").asInt() === 3)
    // the default single warmup sweep ran to completion under an ample
    // budget, so the timed window measured the steady state
    assert(root.get("warmup_passes").asInt() === 1)
    assert(!root.get("budget_stopped").asBoolean())
    assert(!root.get("metrics_skipped_budget").asBoolean())
    // ample budget: warmup projection fits, nothing narrowed
    assert(root.get("queries_skipped_budget").size() === 0)
    // full coverage is structurally visible (ADVICE r10): covered==total
    assert(root.get("metrics_queries_covered").asInt() === surface.size)
    assert(root.get("metrics_queries_total").asInt() === surface.size)
    // cpus=4 ≠ pinned 32 → factors are sentinels and evidence is null,
    // never a false contention verdict
    assert(root.get("contention_factor").asDouble() === -1.0)
    assert(root.get("evidence").isNull)
    // per-query jitter fields (r12): min/max across the 3 passes bracket
    // the median, on the full surface — the artifact self-documents its
    // noise floor so pins compare median-to-median against a spread
    for (f <- Seq("queries_min", "queries_max"))
      assert(root.get(f).properties().asScala.map(_.getKey).toSet === surface)
    surface.foreach { q =>
      val mn = root.get("queries_min").get(q).asDouble()
      val mx = root.get("queries_max").get(q).asDouble()
      val med = root.get("queries").get(q).asDouble()
      assert(mn > 0.0 && mn <= mx, s"$q spread [$mn, $mx] inverted")
      // r3 rounding on the extremes: tolerate half-a-milli on the edges
      assert(med >= mn - 0.0005 && med <= mx + 0.0005,
        s"$q median $med outside [$mn, $mx]")
    }
    val mRoot = mapper.readTree(Files.readString(Paths.get(s"$dir/metrics.json")))
    assert(mRoot.get("queries").properties().asScala.map(_.getKey).toSet === surface)
  }
}
