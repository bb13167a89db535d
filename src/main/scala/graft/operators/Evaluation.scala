package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scorer evaluation for a training-data pipeline: once a corpus has
  * quality / importance / classifier scores, the pipeline needs to
  * know whether the scorer actually RANKS the target class above the
  * rest (ROC-AUC, KS) and how its score distribution maps to empirical
  * label rates (calibration table) before anyone gates terabytes of
  * data on a threshold.
  *
  * Both metrics are computed over SCORE BINS, not individual rows —
  * the standard sketch for ranking metrics at scale (a per-row exact
  * AUC needs a global sort of the corpus; the binned estimator needs
  * one aggregation to `bins` rows and treats same-bin rows as ties,
  * under-resolving only scores closer than (max−min)/bins). The bin
  * table is bounded by the `bins` PARAMETER, so the prefix-sum window
  * that follows runs over ≤ `bins` rows — a model-sized table, never
  * the corpus (same bounded-window contract as the classifier's
  * weight frame).
  *
  * DETERMINISM: every accumulation is integer (counts, and score sums
  * pre-quantized to 1e-6 — exact in doubles to 2^53), so no float sum
  * order can drift; floats appear only in per-row bin assignment
  * (min-max normalize, floor — exactly-specified IEEE ops) and in ONE
  * final division per metric. That is what lets the DuckDB oracle
  * replay both queries bit-for-bit ([[graft.OracleSqlGen]]).
  */
object Evaluation {

  /** Quantization for exact score sums: scores enter rounded to 1e-6
    * (the repo-wide score contract), so ·1e6 is integral. */
  val MicroScale: Double = 1e6

  private def checkBins(bins: Int): Unit =
    require(bins >= 2 && bins <= (1 << 16), s"bins must be in [2, 2^16], got $bins")

  /** (bin, y) rows: min-max normalize the score and floor into `bins`
    * buckets; a constant score column collapses to bin 0 (metrics then
    * read all-ties: AUC = 0.5, KS = 0). Null scores/labels are the
    * caller's filter — this projects, it does not judge. */
  private def binned(scored: DataFrame, scoreCol: String, labelCol: String,
                     bins: Int): DataFrame = {
    val flt = scored
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("long").as("y"))
    val mm = flt.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    flt.crossJoin(broadcast(mm))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("s") - col("mn")) / (col("mx") - col("mn"))
              * lit(bins.toDouble)).cast("long"),
            lit(bins - 1L))).as("bin"),
        col("y"), col("s"))
  }

  /** One summary row: n, n_pos, n_neg, auc, ks.
    *
    * AUC is the Mann-Whitney rank form over bins — positives in
    * strictly higher bins count 1, same-bin ties count ½:
    * auc = Σ_b np_b·(2·cumneg_b + nn_b) / (2·P·N), with the numerator
    * an exact BIGINT. KS is max_b |F_pos(b) − F_neg(b)| with the
    * per-bin numerator |cumpos_b·N − cumneg_b·P| formed in doubles
    * (identical IEEE products on both engines). Degenerate inputs
    * (no positives or no negatives) yield NULL metrics, never a
    * divide-by-zero NaN. */
  def binnedRankingMetrics(scored: DataFrame, scoreCol: String,
                           labelCol: String, bins: Int = 256): DataFrame = {
    checkBins(bins)
    val perBin = binned(scored, scoreCol, labelCol, bins)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
      .withColumn("nn", col("n") - col("np"))
    // prefix sums over the ≤`bins`-row bin table (see object scaladoc).
    // Totals ride a full-frame window over the SAME single-partition
    // sort instead of a second aggregation branch — a separate
    // `perBin.agg(...)` subtree recomputes the whole upstream scorer
    // (scan + fit + join) a third time, which at sf0.1 doubled this
    // query's stage count for a ≤bins-row table (r17, VERDICT r16 #1).
    // Integer sums are order-exact, so the window form is bit-identical.
    val below = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val full = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = perBin
      .withColumn("cumneg", coalesce(sum(col("nn")).over(below), lit(0L)))
      .withColumn("cumpos", coalesce(sum(col("np")).over(below), lit(0L)))
      .withColumn("p_tot", sum(col("np")).over(full))
      .withColumn("n_tot", sum(col("nn")).over(full))
    cum
      .agg(sum(col("n")).as("n"), max(col("p_tot")).as("n_pos"),
        max(col("n_tot")).as("n_neg"),
        // decimal BEFORE the product: np·2·cumneg is corpus² — past
        // long range once both classes exceed ~2·10⁹ rows
        sum(col("np").cast("decimal(38,0)")
          * (lit(2L) * col("cumneg") + col("nn")).cast("decimal(38,0)"))
          .as("num2"),
        max(abs((col("cumpos") + col("np")).cast("double")
            * col("n_tot").cast("double")
          - (col("cumneg") + col("nn")).cast("double")
            * col("p_tot").cast("double"))).as("ksnum"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("num2").cast("double")
            / (lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")), 6)).as("auc"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("ksnum")
            / (col("n_pos").cast("double") * col("n_neg").cast("double")),
            6)).as("ks"))
  }

  /** Gate the corpus at a target keep-rate: keep (kept = 1) every row
    * whose score falls in the HIGHEST bins whose combined mass first
    * reaches ceil(keepRate·n) — the binned version of "keep the top
    * p% by score". The guarantee is bin-granular: at least keepRate·n
    * rows are kept, overshooting by at most one bin's population
    * (same-bin rows are indistinguishable — there is no row-level
    * tiebreak, which is exactly what makes the gate a bounded
    * aggregation instead of a global sort). Null-score rows are
    * dropped: a gate must never pass a row it could not score.
    * Output: the input columns plus `kept`. */
  def gateTopRate(scored: DataFrame, scoreCol: String, keepRate: Double,
                  bins: Int = 256): DataFrame = {
    checkBins(bins)
    require(keepRate > 0.0 && keepRate <= 1.0,
      s"keepRate must be in (0, 1], got $keepRate")
    val flt = scored.filter(col(scoreCol).isNotNull)
    // the corpus total rides the same one-pass stats aggregate as the
    // min/max — a separate `perBin.agg(sum(n))` branch would recompute
    // the entire upstream scorer a fourth time (r17, VERDICT r16 #1)
    val mm = flt.agg(min(col(scoreCol).cast("double")).as("mn"),
      max(col(scoreCol).cast("double")).as("mx"),
      count(lit(1)).as("__total"))
    val withBin = flt.crossJoin(broadcast(mm))
      .withColumn("__bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col(scoreCol).cast("double") - col("mn"))
              / (col("mx") - col("mn")) * lit(bins.toDouble)).cast("long"),
            lit(bins - 1L))))
      .drop("mn", "mx")
    val perBin = withBin.groupBy(col("__bin"))
      .agg(count(lit(1)).as("n"), max(col("__total")).as("__total"))
    // suffix sums over the ≤`bins`-row bin table, highest bin first
    val fromTop = Window.orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tDf = perBin
      .withColumn("cum", sum(col("n")).over(fromTop))
      .filter(col("cum") >= ceil(lit(keepRate) * col("__total").cast("double")))
      .agg(max(col("__bin")).as("__t"))
    withBin.crossJoin(broadcast(tDf))
      .withColumn("kept", (col("__bin") >= col("__t")).cast("bigint"))
      .drop("__bin", "__t", "__total")
  }

  /** Calibration table: one row per non-empty bin with its size, the
    * positive rate, and the mean score — both as exact-integer-derived
    * quotients (score sums are pre-quantized micro-units, so the mean
    * is sum/(1e6·n): one division, no float accumulation). */
  def binnedCalibration(scored: DataFrame, scoreCol: String,
                        labelCol: String, bins: Int = 256): DataFrame = {
    checkBins(bins)
    binned(scored, scoreCol, labelCol, bins)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(round(col("s") * lit(MicroScale), 0).cast("decimal(38,0)"))
          .as("micro"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round(col("micro").cast("double") / (lit(MicroScale) * col("n")
          .cast("double")), 6).as("mean_score"))
  }

  /** Population-Stability-Index drift report between a BASE corpus
    * snapshot and a CURRENT one — the monitoring gate that catches a
    * shifted ingest mix before it trains into a model. Fixed-width
    * bins from the base's [min, max] (the deployed convention: the
    * baseline defines the grid, out-of-range current values clamp to
    * the edge bins), per-bin fractions ε-floored at 1e-6, and
    * PSI = Σ (p − q)·ln(p/q); the conventional reading: < 0.1 stable,
    * 0.1–0.25 moderate shift, > 0.25 action.
    *
    * Scale shape: two bins-bounded partial aggregations (one per
    * snapshot), a 2-value stats broadcast, a bins-row join — the
    * corpora stream once each and nothing corpus-sized shuffles. Every
    * arithmetic step is written in the order the ANSI oracle replays
    * (round(·,6) absorbs the ≤1-ulp ln/summation variation across
    * engines, the sampleWeighted precedent). NULL values are excluded
    * from both snapshots.
    */
  def psiReport(base: DataFrame, current: DataFrame, valueCol: String,
                bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins must be in [2, 10000], got $bins")
    val v = col(valueCol).cast("double")
    val stats = base.filter(v.isNotNull)
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    def binned(df: DataFrame, cname: String): DataFrame =
      df.filter(v.isNotNull).crossJoin(broadcast(stats))
        .select(when(col("__mx") === col("__mn"), lit(0L)).otherwise(
          least(lit(bins - 1L), greatest(lit(0L),
            floor((v - col("__mn")) /
              ((col("__mx") - col("__mn")) / bins)).cast("long"))))
          .as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cname))
    val b = binned(base, "__bc")
    val c = binned(current, "__cc")
    val joined = b.join(c, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("__bc"), lit(0L)).as("__bc"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
    val totals = joined.agg(sum(col("__bc")).as("__bt"),
      sum(col("__cc")).as("__ct"))
    val eps = lit(1e-6)
    val scored = joined.crossJoin(broadcast(totals))
      .withColumn("base_frac",
        greatest(col("__bc").cast("double") / col("__bt").cast("double"), eps))
      .withColumn("cur_frac",
        greatest(col("__cc").cast("double") / col("__ct").cast("double"), eps))
      .withColumn("__contrib",
        (col("base_frac") - col("cur_frac")) *
          log(col("base_frac") / col("cur_frac")))
    val total = scored.agg(sum(col("__contrib")).as("__psi"))
    scored.crossJoin(broadcast(total))
      .select(col("bin").cast("bigint").as("bin"),
        round(col("base_frac"), 6).as("base_frac"),
        round(col("cur_frac"), 6).as("cur_frac"),
        round(col("__contrib"), 6).as("psi_contrib"),
        round(col("__psi"), 6).as("psi_total"))
  }
}
