package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark join"),
    (2L, "spark join window group"),
    (3L, "filter scan sort merge"),
    (4L, ""),
    (5L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("bm25 matches a hand-computed score") {
    // corpus: N=5 (empty AND null docs count toward N), but avgdl skips
    // the NULL-text doc exactly like SQL AVG over a NULL dl — so
    // avgdl = (4+4+4+0)/4. df(spark)=2. doc 2: tf=1, dl=4.
    val n = 5.0; val df = 2.0; val avgdl = (4 + 4 + 4 + 0) / 4.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val out = Ranking.bm25(docs, "text", "doc_id", Seq("spark"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    assert(math.abs(out(2L) - term(1, 4)) < 1e-6)
    assert(math.abs(out(1L) - term(3, 4)) < 1e-6)
    // saturation: 3 occurrences scores higher, but < 3x the single hit
    assert(out(1L) > out(2L) && out(1L) < 3 * out(2L))
  }

  test("bm25 multi-term sums per-term contributions; rarer term weighs more") {
    val out = Ranking.bm25(docs, "text", "doc_id", Seq("spark", "window"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    // doc 2 has both terms — strictly more than its spark-only score
    val sparkOnly = Ranking.bm25(docs, "text", "doc_id", Seq("spark"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(out(2L) > sparkOnly(2L))
    // window (df=1) is rarer than spark (df=2): its idf is larger
    val windowOnly = Ranking.bm25(docs, "text", "doc_id", Seq("window"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    assert(windowOnly(2L) > sparkOnly(2L))
  }

  test("bm25 plan: no explode, stats join is broadcast") {
    val plan = Ranking.bm25(docs, "text", "doc_id", Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan)    // no corpus explode
    assert(plan.contains("Broadcast"), plan)    // one-row stats broadcast
  }

  test("tfIdf: zero-hit docs excluded, higher tf -> higher score") {
    val out = Ranking.tfIdf(docs, "text", "doc_id", Seq("spark"))
      .select("doc_id", "tfidf").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) > out(2L))
  }

  test("empty and null text never throw, never score") {
    val out = Ranking.bm25(docs, "text", "doc_id", Seq("nosuchterm"))
    assert(out.count() == 0)
  }

  test("topRanks: score-desc rank, id tiebreak, k cap, null scores dropped") {
    val list = Seq((1L, 0.9), (2L, 0.5), (3L, 0.9), (4L, 0.1))
      .toDF("id", "s")
      .union(Seq((5L, null.asInstanceOf[java.lang.Double]))
        .toDF("id", "s").select(col("id"), col("s").cast("double")))
    val out = Ranking.topRanks(list, "id", "s", k = 3)
      .as[(Long, Long)].collect().toMap
    // 0.9 tie → smaller id first; k=3 drops the 0.1 row; null never ranks
    assert(out == Map(1L -> 1L, 3L -> 2L, 2L -> 3L))
  }

  test("rrfFuse: hand-computed fusion, single-list docs keep partial score") {
    val lex = Seq((10L, 5.0), (20L, 4.0), (30L, 3.0)).toDF("id", "s1")
    val sem = Seq((20L, 0.9), (40L, 0.8)).toDF("id", "s2")
    val out = Ranking.rrfFuse(lex, sem, "id", "s1", "s2",
        k = 10, kRrf = 60, topN = 10)
      .select("id", "rank_lex", "rank_sem", "rrf")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3))).toSeq
    def rrf(a: Option[Int], b: Option[Int]) = BigDecimal(
      a.fold(0.0)(r => 1.0 / (60 + r)) + b.fold(0.0)(r => 1.0 / (60 + r)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20 is in both lists (lex rank 2, sem rank 1) and must win
    assert(out.head == ((20L, Some(2L), Some(1L), rrf(Some(2), Some(1)))))
    assert(out.map(_._1) == Seq(20L, 10L, 40L, 30L))
    // single-list docs carry a NULL rank on the missing side
    assert(out.find(_._1 == 40L).get._2.isEmpty)
    assert(out.find(_._1 == 10L).get._3.isEmpty)
  }

  test("rrfFuse topN truncates by fused score") {
    val lex = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "s1")
    val sem = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "s2")
    val out = Ranking.rrfFuse(lex, sem, "id", "s1", "s2", topN = 2)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 2L))
  }
}
