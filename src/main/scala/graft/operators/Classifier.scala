package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SumIndexedLongs}
import org.apache.spark.sql.functions._

/** Distributed linear quality classifier over hashed token features —
  * the fastText/CCNet role (Joulin et al. 2016; Wenzek et al. 2020:
  * a cheap linear model over hashed n-grams labels documents for
  * corpus curation), trained entirely in DataFrame aggregations.
  *
  * DETERMINISM BY CONSTRUCTION (the PageRank trick applied to model
  * training): distributed training is normally not reproducible —
  * float gradient sums change in the last ulps with partition order,
  * task retries, and AQE re-plans, and the drift compounds across
  * iterations. Here every order-sensitive reduction is fixed-point:
  * per-row gradient contributions are rounded to 1e-12 resolution and
  * summed as exact decimals (commutative, associative), and the link
  * function is the "fast sigmoid" σ̃(z) = 0.5 + z / (2·(1+|z|)) whose
  * every operation (+, ·, /, |·|) is an exactly-specified IEEE-754 op
  * — unlike exp(), which varies between libm implementations. The
  * trained weights are therefore BIT-IDENTICAL on every run, cluster
  * layout, and engine — which is what lets a multi-iteration training
  * loop sit under the DuckDB hash oracle
  * ([[graft.OracleSqlGen.classifier]] replays it CTE by CTE).
  *
  * The update rule is the classic delta rule (ADALINE, Widrow-Hoff
  * 1960) on the fast-sigmoid output: w ← w − lr · mean((σ̃(w·x) − y)·x).
  * Full-batch, so one corpus pass per iteration.
  *
  * Scale shape: feature extraction is ONE explode + one partial-
  * aggregated shuffle into a cached per-doc incidence frame (id, y,
  * n_words, occupied-bucket set — bounded by `buckets` per row),
  * pre-partitioned by document; each training iteration is then a
  * narrow weight-literal projection, a doc-local dot product (no
  * exchange — the frame is already partitioned by doc), and ONE tiny
  * shuffle of (bucket, decimal) partial sums; the model itself is
  * `buckets` doubles, collected (bounded — the centroid-pull
  * contract) and re-broadcast as literals. A 100 TB corpus costs one
  * scan to featurize and zero further scans to train.
  */
object Classifier {

  /** Fixed-point resolution for gradient/dot-product sums. */
  val Scale: Double = 1e12

  /** σ̃: the fast sigmoid — strictly increasing, range (0,1), and every
    * op exactly specified by IEEE-754 (same bits on every engine). */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Hashed-unigram BINARY PRESENCE features, built in ONE corpus
    * aggregation: per doc (id, y, n_words, bs = set of occupied
    * buckets). The bucket set is bounded by `buckets` (≤2^20), so the
    * row stays small no matter how long the document is — this is the
    * compact incidence frame every training iteration runs on.
    *
    * Presence (x = 1.0 per occupied bucket, not count/n_words) is
    * load-bearing for convergence: with L1-normalized counts every
    * feature is O(1/doc_len), so the weights must grow to O(doc_len)
    * before z leaves the sigmoid's flat center — measured on the
    * sf0.01 corpus, normalized counts were still at the 0.77
    * majority-class floor after 64 iterations at every tested lr,
    * while presence features reach 0.996 by iteration 16 at lr=2.
    * Presence also keeps the feature scale corpus-independent, so one
    * lr works at every document length. */
  def perDocFeatures(docs: DataFrame, textCol: String, idCol: String,
                     labelCol: Column, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    docs
      .select(col(idCol).as("__id"), labelCol.cast("double").as("__y"),
        explode(Bpe.wordsCol(col(textCol))).as("w"))
      .select(col("__id"), col("__y"),
        Importance.bucket(col("w"), buckets).as("b"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_words"), first(col("__y")).as("y"),
        collect_set(col("b")).as("bs"))
  }

  /** The per-doc dot product z = Σ_{j ∈ bs} w_j as a NARROW array
    * fold over the occupied-bucket set — no explode, no group-by, no
    * join: with binary presence features the dot product is just a sum
    * of weight-array slots selected by the bucket set. Each term is
    * the same fixed-point quantization the gradient uses
    * (round(w_j·1.0·1e12) — ·1.0 elided, an IEEE identity), so the
    * sum is order-independent and bit-reproducible.
    *
    * The accumulator is a LONG, not a decimal: the per-doc sum has at
    * most `buckets` terms and each |w_j| ≤ lr·iters (every delta-rule
    * update moves a weight by at most lr·mean|err·x| ≤ lr), so
    * |z·1e12| ≤ buckets·lr·iters·1e12 — checked against Long range by
    * the trainScore guard. (The CORPUS-sized gradient sum stays
    * decimal: its term count grows with the data.)
    *
    * `qwArr` is the PRE-QUANTIZED weight array ([[quantize]] applied
    * per slot, once per iteration, driver-side), and the per-row sum
    * is the codegen [[org.apache.spark.sql.SumIndexedLongs]] kernel —
    * an interpreted `aggregate` lambda here cost ~6× the bare job
    * floor per training iteration (measured at sf0.1: round + multiply
    * + element_at re-evaluated interpretively per word-bucket per row).
    */
  /** zCol's long accumulator sums round(w_j·1e12) over at most
    * `buckets` terms; the caller must bound max|w|·buckets·1e12 « 2^63
    * BEFORE building the plan. Shared by trainScore (where the delta
    * rule bounds max|w| ≤ lr·iters a priori) and [[scoreRows]] (where
    * `w` is externally supplied and must be measured — round 9 shipped
    * scoreRows without this check, ADVICE item). /4 leaves headroom
    * for the rounding half-ulp per term. */
  private[operators] def requireFixedPointHeadroom(
      maxAbsW: Double, buckets: Int, what: String): Unit =
    require(buckets.toDouble * maxAbsW * Scale < Long.MaxValue / 4.0,
      s"$what: buckets=$buckets, max|w|=$maxAbsW could overflow the " +
        "fixed-point dot product (needs buckets*max|w|*1e12 << 2^63)")

  private def zCol(qwArr: Column, bs: Column): Column =
    GraftBridge.column(SumIndexedLongs(
      GraftBridge.expression(bs), GraftBridge.expression(qwArr)))
      .cast("double") / lit(Scale)

  /** round(w·1e12) exactly as Spark's `round(_, 0)` computes it for
    * doubles (BigDecimal.valueOf → setScale HALF_UP → toDouble, then
    * the long cast) — quantizing driver-side must not produce even
    * one different bit, or the oracle's in-SQL replay diverges.
    * Parity is pinned in ClassifierSpec across random and
    * half-boundary inputs, and end-to-end by the q_quality_classifier
    * hash. */
  def quantize(w: Double): Long =
    java.math.BigDecimal.valueOf(w * Scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** HOW THE MODEL REACHES EXECUTORS — the three designs measured:
    * the weights enter each iteration's plan as an ARRAY LITERAL
    * (typedlit of the pre-quantized longs). Complex-typed literals
    * become codegen REFERENCE OBJECTS, not inlined source, so all
    * iteration plans still share one compiled class, and the array is
    * one shared object per task — zero per-row cost. A broadcast
    * one-row frame (the PageRank pattern) was tried and rejected: its
    * BroadcastNestedLoopJoin APPENDS the weight array to every output
    * row, copying buckets·8 bytes per document per iteration —
    * measured at 4096 buckets / 200 k docs, 7× the iteration's real
    * work. (A fully-unrolled single-DAG loop — the oracle's CTE chain
    * as one Catalyst plan — was also tried: each iteration references
    * the previous weights TWICE, and with no CTE materialization in
    * Catalyst the plan grows 2^iters. The DuckDB oracle survives that
    * shape only because of its MATERIALIZED barriers; the per-
    * iteration collect below IS that barrier, driver-side.)
    *
    * Train `iters` delta-rule iterations from zero weights over the
    * cached per-doc frame (__id, y, n_words, bs); returns the weight
    * vector (index = bucket). All reductions fixed-point — see the
    * object scaladoc for why that makes this bit-reproducible. Each
    * iteration is ONE job: a narrow error projection over the cache,
    * one explode + (bucket, decimal) partial-aggregated shuffle of
    * ≤ `buckets`·partitions rows, and a bounded `buckets`-row
    * collect — the inherently-sequential global barrier of full-batch
    * gradient descent. */
  def train(perDoc: DataFrame, buckets: Int, iters: Int,
            lr: Double): Array[Double] =
    train(perDoc, buckets, iters, lr, perDoc.count())

  /** [[train]] with the doc count supplied — the one-vs-rest caller
    * ([[trainLangId]]) shares one count across every class instead of
    * re-counting the SAME cached frame per label. Semantics identical:
    * `n` enters the update rule as the fixed full-batch divisor. */
  private[operators] def train(perDoc: DataFrame, buckets: Int, iters: Int,
                               lr: Double, n: Long): Array[Double] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val w = Array.fill(buckets)(0.0)
    if (n == 0) return w
    for (_ <- 0 until iters) {
      val qw = typedlit(w.map(quantize).toIndexedSeq)
      val grads = perDoc
        .select((fastSigmoid(zCol(qw, col("bs"))) - col("y")).as("__err"),
          explode(col("bs")).as("b"))
        .groupBy(col("b"))
        .agg(sum(round(col("__err") * lit(Scale), 0)
          .cast("decimal(38,0)")).as("g"))
        .collect()
      grads.foreach { r =>
        val j = r.getLong(0).toInt
        val s = r.getDecimal(1)
        w(j) = w(j) - lr * (s.doubleValue() / Scale) / n
      }
    }
    w
  }

  /** Score rows against an already-trained weight vector as a PURE
    * PROJECTION — the per-row bucket set comes from a transform over
    * the row's own words (no group-by), so this runs unchanged inside
    * Structured Streaming: train offline with [[train]], embed `w`
    * into the 24/7 ingest query. Scores match [[trainScore]]'s
    * bit-for-bit — the fixed-point fold is order-independent, so the
    * per-row array order vs the batch collect_set order cannot
    * matter. Wordless/null docs score NULL, as in trainScore. */
  def scoreRows(docs: DataFrame, textCol: String, idCol: String,
                w: Array[Double], buckets: Int): DataFrame = {
    requireFixedPointHeadroom(
      w.foldLeft(0.0)((m, x) => math.max(m, math.abs(x))), buckets,
      "scoreRows")
    val bs = array_distinct(transform(Bpe.wordsCol(col(textCol)),
      wd => Importance.bucket(wd, buckets)))
    docs.select(col(idCol),
      when(size(bs) > 0,
        round(fastSigmoid(zCol(typedlit(w.map(quantize).toIndexedSeq), bs)), 6))
        .as("score"))
      .withColumn("predicted",
        when(col("score").isNull, lit(null).cast("bigint"))
          .otherwise((col("score") > 0.5).cast("bigint")))
  }

  /** End-to-end: featurize, train, score every document. Output: (id,
    * n_words, label, score [σ̃ rounded 6], predicted [score > 0.5]);
    * documents with no words keep NULL score/predicted — never a
    * silent 0.5 that would rank as "uncertain".
    *
    * `loopPartitions` sizes the TRAINING LOOP, not the corpus scan:
    * the loop runs over the per-doc incidence frame (≤ `buckets`+3
    * values per doc — orders of magnitude smaller than the text it
    * came from), so partitioning it like the corpus would pay 16
    * iterations of task-launch overhead for near-empty tasks. Default
    * 8 fits up to ~10^8 docs; raise it for more — it caps nothing,
    * it only sets the loop's parallelism. */
  def trainScore(docs: DataFrame, textCol: String, idCol: String,
                 labelCol: Column, buckets: Int = 256, iters: Int = 8,
                 lr: Double = 2.0, loopPartitions: Int = 8): DataFrame = {
    require(loopPartitions >= 1, s"loopPartitions must be >= 1, got $loopPartitions")
    // zCol's long accumulator needs buckets·(lr·iters)·1e12 « 2^63;
    // lr·iters bounds max|w| a priori (delta-rule step ≤ lr per iter)
    requireFixedPointHeadroom(lr * iters.max(1), buckets,
      s"trainScore(iters=$iters, lr=$lr)")
    import org.apache.spark.storage.StorageLevel
    // ONE corpus pass builds the cached per-doc frame every iteration
    // and the scoring pass read back
    val perDoc = perDocFeatures(docs, textCol, idCol, labelCol, buckets)
      .repartition(loopPartitions, col("__id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val w = train(perDoc, buckets, iters, lr)
      // scoring is one NARROW pass over the cached frame
      val scores = perDoc
        .select(col("__id"), col("n_words"),
          round(fastSigmoid(zCol(typedlit(w.map(quantize).toIndexedSeq),
            col("bs"))), 6).as("score"))
      docs.select(col(idCol).as("__id"), labelCol.cast("bigint").as("label"))
        .join(scores, Seq("__id"), "left")
        .select(col("__id").as(idCol),
          coalesce(col("n_words"), lit(0L)).as("n_words"), col("label"),
          col("score"),
          when(col("score").isNull, lit(null).cast("bigint"))
            .otherwise((col("score") > 0.5).cast("bigint")).as("predicted"))
    } finally {
      // lazy: the scoring plan above still reads the cache when the
      // caller materializes it; unpersist only drops the entry eagerly
      // enough to stop UNBOUNDED cache growth across calls. The scores
      // themselves are recomputable from lineage if a block is gone.
      perDoc.unpersist(blocking = false)
    }
  }

  // ---- hashed char-n-gram language ID (round 14) ---------------------
  //
  // The fastText language-ID recipe (Joulin et al. 2016) re-expressed
  // on the deterministic trainer above: character n-gram presence
  // features hashed into `buckets`, one binary delta-rule classifier
  // per language (one-vs-rest), prediction = argmax of the exact
  // fixed-point scores with ties to the FIRST label in training order.
  // Weights are bit-identical across runs/engines (the [[train]]
  // contract), so the whole train→predict chain replays under the
  // DuckDB oracle ([[graft.OracleSqlGen.langIdModel]]).

  /** Per-doc char-n-gram incidence frame (__id, n_words, __lang, bs):
    * the [[perDocFeatures]] shape with [[graft.functions.TextFunctions
    * .charShingles]] tokens — script-sensitive, so Cyrillic/Greek/CJK
    * text separates even when a word heuristic sees zero stopwords. */
  def perDocCharFeatures(docs: DataFrame, textCol: String, idCol: String,
                         labelCol: Column, buckets: Int,
                         n: Int = 3): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    docs
      .select(col(idCol).as("__id"), labelCol.as("__lang"),
        explode(graft.functions.TextFunctions.charShingles(col(textCol), n))
          .as("g"))
      .select(col("__id"), col("__lang"),
        Importance.bucket(col("g"), buckets).as("b"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_words"), first(col("__lang")).as("__lang"),
        collect_set(col("b")).as("bs"))
  }

  /** One-vs-rest training over a cached [[perDocCharFeatures]] frame,
    * JOINT per iteration (round 15, the corpus-scale training shape):
    * the K one-vs-rest problems are INDEPENDENT — class k's chain
    * never reads class j's weights — so iteration i can compute every
    * class's gradient in ONE aggregation pass (K error projections
    * over the shared cache, one explode, one (bucket, K decimal sums)
    * shuffle, one ≤`buckets`-row collect) instead of K separate jobs.
    * Weights are BIT-IDENTICAL to the sequential per-class chain
    * (same values, same fixed-point reductions, same within-class
    * order — ClassifierSpec pins equality), so q_langid_model's
    * oracle replays unchanged while the barrier count drops from
    * K·iters to iters: at fastText's ~200 languages that is the
    * difference between 800 and 4 sequential full-corpus passes. The
    * error projections stay BELOW the Generate (one evaluation per
    * doc, not per exploded bucket — the r14 ExtractGenerator trap,
    * pinned in PlanSpec). */
  def trainLangId(charFrame: DataFrame, labels: Seq[String], buckets: Int,
                  iters: Int, lr: Double): Seq[Array[Double]] = {
    require(labels.nonEmpty && labels.distinct == labels,
      s"labels must be non-empty and distinct, got $labels")
    requireFixedPointHeadroom(lr * iters.max(1), buckets,
      s"trainLangId(iters=$iters, lr=$lr)")
    val n = charFrame.count() // one count, shared by every class
    val k = labels.size
    val ws = Array.fill(k)(Array.fill(buckets)(0.0))
    if (n == 0) return ws.toSeq
    for (_ <- 0 until iters) {
      val grads = langIdIterGrads(charFrame, labels, ws).collect()
      grads.foreach { r =>
        val j = r.getLong(0).toInt
        var ki = 0
        while (ki < k) {
          val s = r.getDecimal(1 + ki)
          if (s != null) ws(ki)(j) = ws(ki)(j) - lr * (s.doubleValue() / Scale) / n
          ki += 1
        }
      }
    }
    ws.toSeq
  }

  /** One joint gradient pass: all K error projections evaluated in
    * their OWN select (once per doc), then a second select that
    * explodes the bucket set over cheap attribute refs, then one
    * (bucket, K decimal sums) aggregation. The two-select split is
    * load-bearing: with the explode in the same select,
    * ExtractGenerator hoists the error expressions into the Project
    * ABOVE the Generate and each σ̃(w·bs) dot product re-runs once per
    * exploded bucket element — O(K·|bs|²) per doc instead of O(K·|bs|)
    * (the r14 trap, measured 30× on the trainers; PlanSpec pins every
    * sum_indexed kernel below the Generate). */
  private[graft] def langIdIterGrads(charFrame: DataFrame,
      labels: Seq[String], ws: Array[Array[Double]]): DataFrame = {
    val errCols = labels.zipWithIndex.map { case (lbl, ki) =>
      val qw = typedlit(ws(ki).map(quantize).toIndexedSeq)
      (fastSigmoid(zCol(qw, col("bs"))) -
        (col("__lang") === lbl).cast("double")).as(s"__err$ki")
    }
    val gradExprs = labels.indices.map(ki =>
      sum(round(col(s"__err$ki") * lit(Scale), 0)
        .cast("decimal(38,0)")).as(s"__g$ki"))
    charFrame
      .select(errCols :+ col("bs"): _*)
      .select(labels.indices.map(ki => col(s"__err$ki")) :+
        explode(col("bs")).as("b"): _*)
      .groupBy(col("b"))
      .agg(gradExprs.head, gradExprs.tail: _*)
  }

  /** The pre-r15 sequential one-vs-rest chain — kept as the reference
    * [[trainLangId]] is pinned bit-identical against (ClassifierSpec);
    * also the shape to prefer when K is huge but only a few classes
    * are being re-trained. */
  private[graft] def trainLangIdSequential(charFrame: DataFrame,
      labels: Seq[String], buckets: Int, iters: Int,
      lr: Double): Seq[Array[Double]] = {
    val n = charFrame.count()
    labels.map { k =>
      train(charFrame.select(col("__id"), col("n_words"),
        (col("__lang") === k).cast("double").as("y"), col("bs")),
        buckets, iters, lr, n)
    }
  }

  /** Predicted label as a PURE PROJECTION over a bucket-set column —
    * argmax of the per-class exact fixed-point scores (σ̃ is monotone,
    * so the raw z ranks identically), ties to the first label. No
    * aggregation, no state: runs unchanged in append-mode Structured
    * Streaming — train offline, label the 24/7 ingest. */
  def langIdPredictCol(bs: Column, labels: Seq[String],
                       weights: Seq[Array[Double]]): Column = {
    require(labels.size == weights.size,
      s"${labels.size} labels vs ${weights.size} weight vectors")
    val zs = array(weights.map(w =>
      zCol(typedlit(w.map(quantize).toIndexedSeq), bs)): _*)
    // array_position returns the FIRST index holding the max — the
    // deterministic tie-break the oracle replays as (z DESC, class)
    element_at(typedlit(labels),
      array_position(zs, array_max(zs)).cast("int"))
  }

  /** The per-row bucket set for [[langIdPredictCol]], from raw text —
    * the streaming-safe featurization twin of [[perDocCharFeatures]]
    * (same distinct-bucket set, no group-by). */
  def charBucketSet(text: Column, buckets: Int, n: Int = 3): Column =
    array_distinct(transform(
      graft.functions.TextFunctions.charShingles(text, n),
      g => Importance.bucket(g, buckets)))
}
