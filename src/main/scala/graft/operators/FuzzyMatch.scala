package graft.operators

import graft.functions.JaroWinkler.jaro_winkler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity best-match join — the reference's `FuzzyMatch` step
  * (motogp.ktr:3022-3152): for every main-stream row, find the single
  * closest lookup row by Jaro-Winkler similarity (case-insensitive,
  * unfiltered best match, ties resolved to the first lookup row in load
  * order) and append chosen lookup columns plus the match value + score.
  *
  * Spark plan: broadcast the (small, dimension-sized) lookup side,
  * cross-join, score with the codegen'd
  * [[org.apache.spark.sql.JaroWinklerSimilarity]] expression, argmax per
  * main row via `row_number` over (score desc, lookup load order asc).
  * The cross-join is BroadcastNestedLoopJoin — embarrassingly parallel
  * over the main side, so it scales linearly with main-side partitions;
  * the lookup side must be broadcast-sized (dimension tables), which
  * matches every use in the reference (68 circuits, 313 races).
  *
  * Appended lookup columns whose names collide with main columns are
  * dropped from the output — mirroring the reference, where such
  * collisions become `_N` debris that the downstream SelectValues never
  * keep.
  */
object FuzzyMatch {

  private def prepared(lookup: DataFrame, lookupField: String,
                       appendCols: Seq[String]): DataFrame = {
    val cols = (lookupField +: appendCols).distinct
    // pin Kettle's "first lookup row wins ties" with an explicit load
    // order; prefix everything so no lookup name can collide with main
    lookup
      .select(cols.map(col): _*)
      .withColumn("__lk_order", monotonically_increasing_id())
      .select(col(lookupField).as("__lk_key") +: col("__lk_order") +:
        appendCols.distinct.map(c => col(c).as(s"__lk_$c")): _*)
  }

  private def finish(scored: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
                     mainCols: Seq[String], appendCols: Seq[String],
                     matchCol: String, scoreCol: String): DataFrame = {
    val keep = appendCols.distinct.filterNot(mainCols.contains)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(mainCols.map(col) ++
        keep.map(c => col(s"__lk_$c").as(c)) ++
        Seq(col("__lk_key").as(matchCol), col("__sim").as(scoreCol)): _*)
  }

  /** @param main       large stream
    * @param mainField  column of `main` to match on
    * @param lookup     broadcast-sized lookup table
    * @param lookupField column of `lookup` to match against
    * @param appendCols lookup columns to carry onto matched rows
    * @param matchCol   output name for the matched lookup value
    *                   (reference calls it `corrispondenza`)
    * @param scoreCol   output name for the similarity score
    */
  def bestMatch(main: DataFrame, mainField: String,
                lookup: DataFrame, lookupField: String,
                appendCols: Seq[String],
                matchCol: String = "match_value",
                scoreCol: String = "match_score"): DataFrame = {
    // a synthetic per-row id keeps duplicate main rows distinct (Kettle
    // emits one output per input row); partitioning the argmax by the
    // main columns would collapse duplicates to a single output
    val mainCols = main.columns.toSeq
    val withId = main.withColumn("__main_row", monotonically_increasing_id())
    val scored = withId
      .crossJoin(broadcast(prepared(lookup, lookupField, appendCols)))
      .withColumn("__sim", jaro_winkler(lower(col(mainField)), lower(col("__lk_key"))))
    val w = Window.partitionBy(col("__main_row"))
      .orderBy(col("__sim").desc, col("__lk_order").asc)
    finish(scored, w, mainCols, appendCols, matchCol, scoreCol)
  }

  /** Variant keyed by an explicit unique id on the main side — avoids
    * partitioning the argmax window by every main column (cheaper and
    * null-safe when main rows are not unique).
    */
  def bestMatchById(main: DataFrame, mainId: String, mainField: String,
                    lookup: DataFrame, lookupField: String,
                    appendCols: Seq[String],
                    matchCol: String = "match_value",
                    scoreCol: String = "match_score"): DataFrame = {
    val mainCols = main.columns.toSeq
    val scored = main
      .crossJoin(broadcast(prepared(lookup, lookupField, appendCols)))
      .withColumn("__sim", jaro_winkler(lower(col(mainField)), lower(col("__lk_key"))))
    val w = Window.partitionBy(col(mainId))
      .orderBy(col("__sim").desc, col("__lk_order").asc)
    finish(scored, w, mainCols, appendCols, matchCol, scoreCol)
  }
}
