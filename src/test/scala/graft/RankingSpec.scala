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
}
