package graft

import graft.operators.Importance
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  test("fitLogRatios: dense bucket axis, smoothed log-ratio formula") {
    val target = Seq("aa aa bb", "aa").toDF("text")
    val source = Seq("cc cc cc dd").toDF("text")
    val r = Importance.fitLogRatios(target, source, "text", B)
    val rows = r.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(rows.size == B) // every bucket present, even empty ones
    // manual check for the bucket of "aa": ct=3 of 4 target words,
    // cs=0 of 4 source words
    val bAa = Seq("aa").toDF("w")
      .select(Importance.bucket(col("w"), B)).as[Long].head()
    val expected = math.log((3 + 1.0) / (4 + B)) - math.log((0 + 1.0) / (4 + B))
    assert(math.abs(rows(bAa) - expected) < 1e-12)
    // a bucket hit by neither corpus carries exactly the smoothing mass
    val usedBuckets = Seq("aa", "bb", "cc", "dd").toDF("w")
      .select(Importance.bucket(col("w"), B)).as[Long].collect().toSet
    val emptyB = (0L until B).find(!usedBuckets(_)).get
    assert(math.abs(rows(emptyB) -
      (math.log(1.0 / (4 + B)) - math.log(1.0 / (4 + B)))) < 1e-12)
  }

  test("score: mean lambda over occurrences; zero-word docs keep NULL") {
    val target = Seq("aa aa").toDF("text")
    val source = Seq("cc").toDF("text")
    val ratios = Importance.fitLogRatios(target, source, "text", B)
    val lam = ratios.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val bucketOf = (w: String) => Seq(w).toDF("w")
      .select(Importance.bucket(col("w"), B)).as[Long].head()
    val docs = Seq((1L, "aa cc aa"), (2L, "   "), (3L, "cc")).toDF("doc_id", "text")
    val out = Importance.score(docs, "text", "doc_id", ratios, B)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1L)._1 == 3)
    val want1 = (2 * lam(bucketOf("aa")) + lam(bucketOf("cc"))) / 3.0
    assert(math.abs(out(1L)._2.get - math.rint(want1 * 1e6) / 1e6) < 1e-9)
    assert(out(2L) == ((0L, None))) // whitespace-only: no silent 0
    // target-vocab doc outranks source-vocab doc
    assert(out(1L)._2.get > out(3L)._2.get)
  }

  test("selectTopK: exactly k selected, rounded-score order, id tie-break") {
    val scored = Seq(
      (1L, 5L, Some(0.5)), (2L, 5L, Some(0.5)), (3L, 5L, Some(0.9)),
      (4L, 5L, Some(0.1)), (5L, 0L, None)).toDF("doc_id", "n_words", "score")
    val out = Importance.selectTopK(scored, "doc_id", k = 3)
      .select("doc_id", "selected").as[(Long, Long)].collect().toMap
    // 0.9 first, then the 0.5 tie broken by doc_id asc; NULL sorts last
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }

  test("selectTopK plans as TakeOrdered + broadcast join — no global window") {
    // a non-local input, or Catalyst folds the limit into a LocalRelation
    val scored = spark.range(1000).select(col("id").as("doc_id"),
      lit(3L).as("n_words"), (col("id") % 7).cast("double").as("score"))
    val p = Importance.selectTopK(scored, "doc_id", 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
  }
}
