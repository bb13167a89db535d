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
  * cross-join, score with the codegen'd [[graft.functions.JaroWinklerSimilarity]]
  * expression, argmax per main row via `row_number` over
  * (score desc, lookup load order asc). The cross-join is
  * BroadcastNestedLoopJoin — embarrassingly parallel over the main side,
  * so it scales linearly with main-side partitions; the lookup side must
  * be broadcast-sized (dimension tables), which matches every use in the
  * reference (68 circuits, 313 races).
  */
object FuzzyMatch {

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
    val mainCols = main.columns.toSeq

    // pin Kettle's "first lookup row wins ties" with an explicit load order
    val lk = lookup
      .select((lookupField +: appendCols).distinct.map(col): _*)
      .withColumn("__lk_order", monotonically_increasing_id())
      .withColumnRenamed(lookupField, "__lk_key")

    val scored = main
      .crossJoin(broadcast(lk))
      .withColumn("__sim", jaro_winkler(lower(col(mainField)), lower(col("__lk_key"))))

    val w = Window
      .partitionBy(mainCols.map(col): _*)
      .orderBy(col("__sim").desc, col("__lk_order").asc)

    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn(matchCol, col("__lk_key"))
      .withColumn(scoreCol, col("__sim"))
      .select((mainCols ++ appendCols.filterNot(mainCols.contains) ++ Seq(matchCol, scoreCol)).map(col): _*)
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
    val lk = lookup
      .select((lookupField +: appendCols).distinct.map(col): _*)
      .withColumn("__lk_order", monotonically_increasing_id())
      .withColumnRenamed(lookupField, "__lk_key")

    main.crossJoin(broadcast(lk))
      .withColumn("__sim", jaro_winkler(lower(col(mainField)), lower(col("__lk_key"))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(mainId)).orderBy(col("__sim").desc, col("__lk_order").asc)))
      .filter(col("__rn") === 1)
      .withColumn(matchCol, col("__lk_key"))
      .withColumn(scoreCol, col("__sim"))
      .select((mainCols ++ appendCols.filterNot(mainCols.contains) ++ Seq(matchCol, scoreCol)).map(col): _*)
  }
}
