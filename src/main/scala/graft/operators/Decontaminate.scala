package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with an evaluation/benchmark set, the standard guard against
  * test-set leakage when assembling a training corpus.
  *
  * Scale shape: the benchmark side (eval sets are thousands of
  * documents, not billions) collapses to a DISTINCT n-gram set that is
  * broadcast to the training scan, so the big side never shuffles — the
  * whole job is one corpus pass plus a per-document hash-map probe. The
  * per-document n-gram sets are deduplicated array-side
  * ([[TF.wordNgrams]] is distinct by construction), so `n_shared`
  * counts DISTINCT contaminated n-grams per training document.
  */
object Decontaminate {

  /** Training documents sharing at least `minShared` distinct word
    * `n`-grams with any benchmark document. Returns
    * (doc_id, n_shared) — join it back or anti-join to drop.
    *
    * Set `broadcastBench = false` when the benchmark n-gram set is too
    * large for one executor (rare; it then runs as a shuffle join —
    * same answer, bigger exchange).
    */
  def overlap(train: DataFrame, bench: DataFrame,
              textCol: String, idCol: String,
              n: Int = 5, minShared: Int = 1,
              broadcastBench: Boolean = true): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val benchGrams = bench
      .select(explode(TF.wordNgrams(col(textCol), n)).as("__gram"))
      .distinct()
    val benchSide = if (broadcastBench) broadcast(benchGrams) else benchGrams
    train
      .select(col(idCol).as("doc_id"),
        explode(TF.wordNgrams(col(textCol), n)).as("__gram"))
      .join(benchSide, Seq("__gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The apply side: training docs with contaminated rows removed. */
  def clean(train: DataFrame, bench: DataFrame,
            textCol: String, idCol: String,
            n: Int = 5, minShared: Int = 1): DataFrame = {
    val bad = overlap(train, bench, textCol, idCol, n, minShared)
      .select(col("doc_id").as("__bad_id"))
    train.join(bad, train(idCol) === col("__bad_id"), "left_anti")
  }
}
