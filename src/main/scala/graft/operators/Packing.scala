package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign token chunks to fixed-budget training
  * sequences (bins), the last mile of a training-data pipeline: chunked
  * documents become the ~budget-token rows a trainer actually consumes.
  */
object Packing {

  /** Greedy next-fit packing by running token count: within each group
    * (in `orderBy` order) a chunk goes to bin
    * `floor(tokens_before_it / budget)` — i.e. bins are consecutive
    * ~budget-token spans of the ordered chunk stream. A chunk straddling
    * a boundary stays in the earlier bin (bins may exceed `budget` by up
    * to one chunk; trainers truncate or pad the tail). Deterministic:
    * pure function of the order columns.
    *
    * One window per group — the packing is sequential BY DEFINITION
    * (each bin depends on everything before it), so the parallelism
    * unit is the group. At 100 TB the caller picks group granularity
    * accordingly (e.g. (lang, doc_id mod K) shards rather than bare
    * lang) — packing quality is unaffected because bins never span
    * groups anyway.
    */
  def packChunks(chunks: DataFrame, groupCols: Seq[String],
                 orderBy: Seq[Column], nTokensCol: String,
                 budget: Int, as: String = "bin"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks.withColumn(as,
      floor((sum(col(nTokensCol)).over(w) - col(nTokensCol)) / budget)
        .cast("long"))
  }

  /** Per-bin roll-up of a packed chunk stream: how many chunks/tokens
    * landed in each training sequence — the sanity report (and the
    * oracle-checkable face) of [[packChunks]].
    */
  def binStats(packed: DataFrame, groupCols: Seq[String],
               nTokensCol: String, binCol: String = "bin"): DataFrame =
    packed.groupBy((groupCols :+ binCol).map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(col(nTokensCol)).cast("long").as("n_tokens"))
}
