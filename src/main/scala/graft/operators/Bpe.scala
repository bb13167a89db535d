package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed trainer over the word
  * dictionary + corpus-scale encoder ([[graft.functions.BpeKernels]]
  * via the codegen `BpeTokens` expression).
  *
  * Scale shape: training never touches the corpus after ONE
  * tokenize+count shuffle — every iteration runs over the DISTINCT
  * word dictionary (Zipf-bounded: orders of magnitude smaller than the
  * corpus, and at 100 TB you additionally cap it to the top-K words by
  * count, which is what every production tokenizer trainer does). The
  * per-iteration argmax is one LIMIT-1 collect — merge selection is
  * inherently sequential (each merge depends on the previous), so
  * that driver round-trip is the algorithm, not a shortcut. Encoding
  * is embarrassingly parallel: the learned merges ride the expression
  * to every executor and each document is one codegen pass.
  *
  * Exactness: the merge-application step is `replace` on a
  * doubled-separator symbol string — one `\na\n\nb\n` -> `\nab\n`
  * replacement IS the greedy left-to-right non-overlapping merge pass
  * (boundaries are shared, never consumed — property-checked against
  * the array kernel in BpeSpec), and the same replace runs verbatim in
  * the DuckDB oracle. `\n` can never appear inside a symbol because
  * words are whitespace-split. Pair counts include overlapping
  * occurrences ("aaa" counts (a,a) twice); ties break on (count DESC,
  * a ASC, b ASC) — Spark and DuckDB both order strings by UTF-8
  * bytes, so the tie-break is collation-safe.
  */
object Bpe {

  private val Sep = "\n"
  private val WsClass = "[ \\t\\n\\x0B\\f\\r]+"

  /** The word dictionary of `textCol`: one row per distinct
    * lowercased whitespace token, with its corpus count and initial
    * symbol string (code points, doubled-separator form). */
  def wordDict(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.{BpeInitRepr, GraftBridge}
    docs
      .select(explode(split(lower(trim(col(textCol))), WsClass)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("r",
        GraftBridge.column(BpeInitRepr(GraftBridge.expression(col("w")))))
  }

  /** Train `numMerges` merges; returns them in rank order. Stops early
    * if the dictionary runs out of adjacent pairs.
    *
    * `maxDictWords` caps the dictionary to the top-K words by count
    * (ties broken by word, so the cap is deterministic) — the standard
    * 100 TB move: the Zipf tail contributes negligible pair mass, and
    * the cap bounds every iteration's cost regardless of corpus size.
    * The default keeps every word (exact classic BPE).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxDictWords: Int = Int.MaxValue): Seq[(String, String)] = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges must be in [1, 65536], got $numMerges")
    require(maxDictWords >= 1, s"maxDictWords must be >= 1, got $maxDictWords")
    val full = wordDict(docs, textCol)
    var dict = (if (maxDictWords == Int.MaxValue) full
      else full.orderBy(desc("cnt"), asc("w")).limit(maxDictWords))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val best = dict
        .select(col("cnt"),
          filter(split(col("r"), Sep + Sep), x => x =!= "").as("s"))
        .select(col("cnt"), explode(when(size(col("s")) > 1,
          transform(sequence(lit(1), size(col("s")) - 1), i =>
            struct(element_at(col("s"), i).as("a"),
              element_at(col("s"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        // localCheckpoint per iteration keeps the lineage flat — the
        // alternative is a k-deep stack of replace() projections that
        // Catalyst re-analyzes every round
        dict = dict.withColumn("r",
          replace(col("r"), lit(Sep + a + Sep + Sep + b + Sep),
            lit(Sep + a + b + Sep)))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Encoded token array of `text` under ranked `merges` — the
    * corpus-scale apply (one codegen pass per document). */
  def tokens(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.{BpeTokens, GraftBridge}
    GraftBridge.column(BpeTokens(GraftBridge.expression(text),
      merges.map(_._1), merges.map(_._2)))
  }

  /** The normalized whitespace tokens of `text` as a column — the same
    * tokenization the trainer, the encode kernel, and the oracle use. */
  def wordsCol(text: Column): Column =
    filter(split(lower(trim(text)), WsClass), x => x =!= "")
}
