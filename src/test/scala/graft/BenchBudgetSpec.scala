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
