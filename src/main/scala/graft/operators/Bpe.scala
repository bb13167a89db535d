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

  /** Re-checkpoint cadence for the trainer's dict and pair-count
    * frames: between boundaries the lineage grows by one narrow
    * projection (dict) / one broadcast join + union (pairs) per merge,
    * so analysis stays cheap, and a larger cadence amortizes the full
    * materialization cost of a checkpoint over more merges. */
  private val CkptEvery = 8

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

  /** Adjacent symbol pairs of `r`, exploded one row per occurrence
    * (overlaps included) and weighted `wt` — the shared building block
    * of the initial pair census and the per-merge deltas. */
  private def pairsWeighted(dict: DataFrame, wt: Column): DataFrame =
    dict
      .select(wt.as("wt"),
        filter(split(col("r"), Sep + Sep), x => x =!= "").as("s"))
      .select(col("wt"), explode(when(size(col("s")) > 1,
        transform(sequence(lit(1), size(col("s")) - 1), i =>
          struct(element_at(col("s"), i).as("a"),
            element_at(col("s"), i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("wt"))

  /** Train `numMerges` merges; returns them in rank order. Stops early
    * if the dictionary runs out of adjacent pairs.
    *
    * `maxDictWords` caps the dictionary to the top-K words by count
    * (ties broken by word, so the cap is deterministic) — the standard
    * 100 TB move: the Zipf tail contributes negligible pair mass, and
    * the cap bounds every iteration's cost regardless of corpus size.
    * The default keeps every word (exact classic BPE).
    *
    * Pair counts are maintained INCREMENTALLY: the full explode+count
    * census runs once, and each merge then updates only the words that
    * contain the just-merged pair — subtract every old pair of an
    * affected word, add back every new one (a word-level recount, so
    * exactness needs no occurrence-level adjacency bookkeeping; ties,
    * overlaps, and `aaa`-style self-runs come out right by
    * construction). The maintained frame is updated by a broadcast
    * LEFT join (never reshuffled): a pair's count can only INCREASE if
    * the pair involves the fresh symbol `a+b`, so net-new pairs are
    * exactly the positive-delta `a+b` pairs absent from the frame —
    * and `a+b` may already exist as a symbol via a different merge
    * path (`x·yz` and `xy·z` both yield `xyz`), which is why the fresh
    * branch anti-joins against the frame's `a+b` rows instead of
    * assuming novelty. Deltas and fresh rows are eagerly checkpointed
    * (they are dictionary-delta-sized, bounded by `maxDictWords` at
    * 100 TB) so the maintained frame's lineage stays a LINEAR chain of
    * broadcast joins over cached leaves; dict and frame re-checkpoint
    * every [[CkptEvery]] merges and superseded checkpoints are
    * unpersisted (`GraftBridge.unpersistCheckpoint`) so storage holds
    * O(1) generations, not O(numMerges). Per-merge cost is one narrow
    * dict scan + explode over AFFECTED words only — production-trainer
    * shape — vs the previous full-dictionary recount per merge.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxDictWords: Int = Int.MaxValue,
            onMerge: (Int, Long) => Unit = (_, _) => ()): Seq[(String, String)] = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges must be in [1, 65536], got $numMerges")
    require(maxDictWords >= 1, s"maxDictWords must be >= 1, got $maxDictWords")
    import org.apache.spark.sql.GraftBridge.unpersistCheckpoint
    val full = wordDict(docs, textCol)
    var dict = (if (maxDictWords == Int.MaxValue) full
      else full.orderBy(desc("cnt"), asc("w")).limit(maxDictWords))
      .localCheckpoint()
    // the maintained (a, b, c) pair-count frame: full census once
    var pc = pairsWeighted(dict, col("cnt"))
      .groupBy("a", "b").agg(sum("wt").as("c"))
      .localCheckpoint()
    // checkpoints superseded at the NEXT cadence boundary (they are
    // still referenced by the un-checkpointed lineage until then)
    var retired = List(dict, pc)
    var pending = List.empty[DataFrame]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var sinceCkpt = 0
    while (merges.size < numMerges && !exhausted) {
      val iterT0 = System.nanoTime()
      val best = pc.orderBy(desc("c"), asc("a"), asc("b")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val ab = a + b
        val pat = Sep + a + Sep + Sep + b + Sep
        val rep = Sep + ab + Sep
        val affected = dict.filter(col("r").contains(pat))
        val after = affected.withColumn("r", replace(col("r"), lit(pat), lit(rep)))
        // word-level recount of the affected words only; eager so the
        // two affected scans run exactly once
        val delta = pairsWeighted(affected, -col("cnt"))
          .unionAll(pairsWeighted(after, col("cnt")))
          .groupBy("a", "b").agg(sum("wt").as("dc"))
          .filter(col("dc") =!= 0)
          .localCheckpoint()
        // net-new pairs must involve the fresh symbol and miss the
        // frame; eager so the frame's lineage references pc once, not
        // exponentially through the anti-join's pc scan
        val fresh = delta
          .filter((col("a") === ab || col("b") === ab) && col("dc") > 0)
          .join(broadcast(
              pc.filter(col("a") === ab || col("b") === ab).select("a", "b")),
            Seq("a", "b"), "left_anti")
          .select(col("a"), col("b"), col("dc").as("c"))
          .localCheckpoint()
        pending = delta :: fresh :: pending
        pc = pc.join(broadcast(delta), Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("c") + coalesce(col("dc"), lit(0L))).as("c"))
          .filter(col("c") > 0)
          .unionAll(fresh)
        dict = dict.withColumn("r", replace(col("r"), lit(pat), lit(rep)))
        sinceCkpt += 1
        if (sinceCkpt >= CkptEvery && merges.size < numMerges) {
          dict = dict.localCheckpoint()
          pc = pc.localCheckpoint()
          (retired ++ pending).foreach(unpersistCheckpoint)
          retired = List(dict, pc)
          pending = Nil
          sinceCkpt = 0
        }
        // instrumentation hook (BpeScale / SCALING.md): rank + wall ms
        // of this merge, checkpoint cadence included
        onMerge(merges.size, (System.nanoTime() - iterT0) / 1000000L)
      }
    }
    (retired ++ pending).foreach(unpersistCheckpoint)
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
