package graft

import graft.operators.Evaluation
import org.apache.spark.sql.functions._

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(rows: Seq[(Double, Int)], bins: Int = 256) =
    Evaluation.binnedRankingMetrics(rows.toDF("s", "y"), "s", "y", bins)
      .collect().head

  test("perfect separation: auc = 1, ks = 1") {
    val r = metrics(Seq((0.9, 1), (0.95, 1), (0.1, 0), (0.05, 0)))
    assert(r.getLong(0) == 4 && r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("constant score: all ties, auc = 0.5, ks = 0") {
    val r = metrics(Seq((0.7, 1), (0.7, 0), (0.7, 1), (0.7, 0)))
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.0)
  }

  test("hand-computed mixed case with a tie") {
    // scores: pos {0.8, 0.4}, neg {0.6, 0.4}; pairs (pos, neg):
    // (0.8>0.6)=1 (0.8>0.4)=1 (0.4<0.6)=0 (0.4=0.4)=0.5 -> auc 2.5/4
    // bins=4 over [0.4, 0.8]: 0.4->bin0, 0.6->bin2, 0.8->bin3
    val r = metrics(Seq((0.8, 1), (0.4, 1), (0.6, 0), (0.4, 0)), bins = 4)
    assert(r.getDouble(3) == 0.625)
    // F_pos after bin0 = 0.5, F_neg = 0.5 -> 0; after bin2: 0.5 vs 1.0
    assert(r.getDouble(4) == 0.5)
  }

  test("reversed scorer scores below 0.5") {
    val r = metrics(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)))
    assert(r.getDouble(3) == 0.0)
  }

  test("degenerate single-class input yields NULL metrics, not NaN") {
    val r = metrics(Seq((0.9, 1), (0.1, 1)))
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("null scores and labels are excluded from n") {
    val df = Seq((Some(0.9), Some(1)), (None, Some(0)), (Some(0.2), None),
      (Some(0.1), Some(0))).toDF("s", "y")
    val r = Evaluation.binnedRankingMetrics(df, "s", "y").collect().head
    assert(r.getLong(0) == 2 && r.getDouble(3) == 1.0)
  }

  test("calibration bins: exact counts, rates, and quantized means") {
    val df = Seq((0.0, 0), (0.25, 0), (0.25, 1), (1.0, 1)).toDF("s", "y")
    val out = Evaluation.binnedCalibration(df, "s", "y", bins = 4)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L))
    val b1 = out(1) // the two 0.25 rows
    assert(b1.getLong(1) == 2 && b1.getLong(2) == 1)
    assert(b1.getDouble(3) == 0.5 && b1.getDouble(4) == 0.25)
  }

  test("negative and wide score domains normalize into range") {
    val r = metrics(Seq((-10.0, 0), (-2.0, 0), (3.5, 1), (40.0, 1)))
    assert(r.getDouble(3) == 1.0)
  }

  test("gate keeps exactly the top-rate rows when bins resolve scores") {
    val df = (1 to 100).map(i => (i.toLong, i / 100.0)).toDF("id", "s")
    val out = Evaluation.gateTopRate(df, "s", keepRate = 0.25, bins = 256)
      .select("id", "kept").as[(Long, Long)].collect().toMap
    assert(out.values.sum == 25)
    assert((76 to 100).forall(i => out(i.toLong) == 1L))
  }

  test("gate overshoots only at bin granularity on ties") {
    // 4 rows at the top score, need = ceil(0.1*10) = 1 -> all 4 kept
    val df = ((1 to 6).map(i => (i.toLong, i / 10.0)) ++
      (7 to 10).map(i => (i.toLong, 0.9))).toDF("id", "s")
    val out = Evaluation.gateTopRate(df, "s", keepRate = 0.1, bins = 8)
      .select("id", "kept").as[(Long, Long)].collect().toMap
    assert((7 to 10).forall(i => out(i.toLong) == 1L))
    assert(out.values.sum == 4)
  }

  test("gate at keepRate 1.0 keeps everything; null scores are dropped") {
    val df = Seq((1L, Some(0.4)), (2L, Some(0.9)), (3L, None))
      .toDF("id", "s")
    val out = Evaluation.gateTopRate(df, "s", keepRate = 1.0)
      .select("id", "kept").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("argument guards") {
    val df = Seq((0.5, 1)).toDF("s", "y")
    intercept[IllegalArgumentException](
      Evaluation.binnedRankingMetrics(df, "s", "y", bins = 1))
    intercept[IllegalArgumentException](
      Evaluation.binnedCalibration(df, "s", "y", bins = 1 << 17))
    intercept[IllegalArgumentException](
      Evaluation.gateTopRate(df, "s", keepRate = 0.0))
    intercept[IllegalArgumentException](
      Evaluation.gateTopRate(df, "s", keepRate = 1.5))
  }

  test("psiReport: identical snapshots read zero; a planted shift crosses the action bar") {
    val base = (1 to 400).map(i => (i % 100).toDouble).toDF("v")
    val same = Evaluation.psiReport(base, base, "v", bins = 10)
      .select("psi_total").distinct().as[Double].head()
    assert(same == 0.0)
    // shift the mass far right: most rows change bins
    val cur = (1 to 400).map(i => (i % 100).toDouble + 60).toDF("v")
    val rows = Evaluation.psiReport(base, cur, "v", bins = 10)
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val psi = rows.head._5
    assert(psi > 0.25, s"psi $psi") // the conventional action threshold
    // out-of-range current values clamp to the edge bin
    assert(rows.exists(r => r._1 == 9L && r._3 > r._2))
  }

  test("psiReport: empty bins use the epsilon floor; nulls excluded; constant base degenerates to one bin") {
    val base = Seq(0.0, 0.0, 10.0, 10.0).toDF("v")
    val cur = Seq(Some(0.0), Some(0.0), None).toDF("v") // upper bin empty, null dropped
    val rows = Evaluation.psiReport(base, cur, "v", bins = 2)
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    assert(rows(1)._3 == 1e-6) // empty current bin floored, not 0 (ln stays finite)
    assert(rows(0)._3 == 1.0)
    // constant base: everything lands in bin 0, identical snapshots -> 0
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val c = Evaluation.psiReport(const, const, "v", bins = 4)
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(c.map(_._1).toSeq == Seq(0L) && c.head._5 == 0.0)
    intercept[IllegalArgumentException](Evaluation.psiReport(base, cur, "v", 1))
  }
}
