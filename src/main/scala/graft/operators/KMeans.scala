package graft.operators

import org.apache.spark.sql.{ArgminSqDist, Column, DataFrame, GraftBridge, MinSqDist}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an embedding column — the
  * [[Classifier]] recipe applied to clustering: every quantity that a
  * float implementation would accumulate in addition-order-dependent
  * doubles is instead exact integer arithmetic, so the fitted
  * centroids and every assignment are BIT-IDENTICAL across partition
  * layouts, retries, and engines — which is what lets an iterative
  * clustering loop sit under the DuckDB hash oracle
  * ([[graft.OracleSqlGen.kmeans]] replays it CTE by CTE).
  *
  *  - components quantize to micro-units once (round(x·1e6) — the
  *    round-parity contract pinned in ClassifierSpec);
  *  - distances are exact long sums of squared integer diffs
  *    (≤ ~2.6·10¹⁴ at 64 dims — far inside long range);
  *  - assignment ties break to the LOWEST centroid id (a total order);
  *  - new centroids are floor(sum/count) per dimension — one exactly-
  *    specified IEEE division on integer-valued doubles, the PageRank
  *    floor-division trick (sums are exact to 2⁵³, i.e. ~9·10¹²
  *    micro-rows per cluster — documented bound, loudly guarded);
  *  - a cluster that captures nothing keeps its previous centroid.
  *
  * Init is deterministic farthest-first traversal (Gonzalez 1985) —
  * see [[farthestFirst]] for why (and for the measured failure of
  * naive lowest-id seeding). k-means++ would trade reproducibility
  * for expected quality — for a CURATION pipeline, auditability wins.
  *
  * Scale shape: quantization + cache is ONE corpus pass; each
  * iteration is a narrow codegen argmin over the broadcast centroid
  * array (k·d longs — the model), a posexplode to (cluster, dim)
  * partial sums, ONE k·d-row shuffle, and a bounded k·d collect.
  * Same template as [[Classifier.train]]: corpus scans don't grow
  * with iterations.
  */
object KMeans {

  /** Micro-unit quantization for embedding components. */
  val Micro: Double = 1e6

  private[operators] def qVec(vecCol: Column): Column =
    transform(vecCol,
      x => round(x.cast("double") * lit(Micro), 0).cast("long"))

  private[operators] def assignCol(qv: Column, qc: Column): Column =
    GraftBridge.column(ArgminSqDist(
      GraftBridge.expression(qv), GraftBridge.expression(qc)))

  /** Centroids as a broadcast ONE-ROW frame (`__qc`:
    * array<array<long>>, index = centroid id) — data, not plan
    * literals, for the codegen-cache reason documented on
    * [[Classifier]]. */
  private def cFrame(spark: org.apache.spark.sql.SparkSession,
                     cents: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(cents.map(_.toSeq).toSeq)).toDF("__qc")
  }

  private def minDistCol(qv: Column, qc: Column): Column =
    GraftBridge.column(MinSqDist(
      GraftBridge.expression(qv), GraftBridge.expression(qc)))

  /** Deterministic farthest-first seeding (Gonzalez 1985): start from
    * the lowest-id vector, then repeatedly take the vector FARTHEST
    * from the chosen set (ties to the lowest id). Lowest-id-only init
    * was tried first and measured: on the embeddings table the 10
    * lowest ids cover 7 of 10 planted classes (label 7 seeded four
    * times) and Lloyd's never recovers — purity 0.17, chance level.
    * Farthest-first covers every separated basin by construction, and
    * unlike k-means++ it is REPLAYABLE — no RNG, every pick a
    * TakeOrdered(1) over exact integer distances. Cost: k−1 narrow
    * corpus passes, init-only (sample first at very large k·corpus). */
  private def farthestFirst(qdf: DataFrame, k: Int): Array[Array[Long]] = {
    val spark = qdf.sparkSession
    val first = qdf.select(col("__id"), col("__qv"))
      .orderBy(col("__id")).limit(1).collect()
    if (first.isEmpty) return Array.empty
    val cents = scala.collection.mutable.ArrayBuffer(
      first(0).getSeq[Long](1).toArray)
    while (cents.length < k) {
      // always k picks, duplicates allowed when distinct vectors run
      // out (the duplicate cluster just stays empty) — mirrors the
      // oracle's fixed-k recursion exactly
      val pick = qdf
        .crossJoin(broadcast(cFrame(spark, cents.toArray)))
        .select(col("__id"), col("__qv"),
          minDistCol(col("__qv"), col("__qc")).as("__md"))
        .orderBy(col("__md").desc, col("__id"))
        .limit(1).collect()
      cents += pick(0).getSeq[Long](1).toArray
    }
    cents.toArray
  }

  /** Fit `iters` Lloyd iterations from farthest-first seeds over the
    * cached quantized frame (__id, __qv); returns the centroid
    * matrix (row = centroid id, micro-units). */
  def fit(qdf: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = qdf.sparkSession
    var cents = farthestFirst(qdf, k)
    if (cents.isEmpty) return cents
    for (_ <- 0 until iters) {
      val sums = qdf
        .crossJoin(broadcast(cFrame(spark, cents)))
        .select(assignCol(col("__qv"), col("__qc")).as("__cid"),
          posexplode(col("__qv")).as(Seq("__pos", "__q")))
        .groupBy(col("__cid"), col("__pos"))
        // sum in decimal FROM THE START (r10, ADVICE): summing in long
        // and casting after would let the accumulator wrap past 2^63
        // before the 2^53 guard below ever saw the value — the guard
        // must inspect an exact sum to fire with its diagnostic
        .agg(sum(col("__q").cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val cid = r.getLong(0).toInt
        val pos = r.getInt(1)
        val s = r.getDecimal(2)
        val n = r.getLong(3)
        require(s.abs.doubleValue() < 9.0e15, // 2^53 ≈ 9.007e15
          s"kmeans: cluster $cid dim-sum ${s} exceeds the exact-double bound — " +
            "shard the corpus or raise Micro resolution")
        next(cid)(pos) = math.floor(s.doubleValue() / n.toDouble).toLong
      }
      cents = next
    }
    cents
  }

  /** Quantize + fit over a raw embedding frame; returns the centroid
    * matrix (micro-units) for export, [[assignRows]], or inspection. */
  def fitCentroids(embs: DataFrame, vecCol: String, idCol: String, k: Int,
                   iters: Int, loopPartitions: Int = 8): Array[Array[Long]] = {
    import org.apache.spark.storage.StorageLevel
    require(loopPartitions >= 1, s"loopPartitions must be >= 1, got $loopPartitions")
    // long ids are the operator contract: the init ordering (and the
    // oracle's row_number replay) needs a total order the driver can
    // reproduce — cast upstream if the key is something else
    val qdf = embs
      .select(col(idCol).cast("long").as("__id"), qVec(col(vecCol)).as("__qv"))
      .repartition(loopPartitions, col("__id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try fit(qdf, k, iters)
    finally qdf.unpersist(blocking = false)
  }

  /** Assign rows against already-fitted centroids as a PURE
    * PROJECTION — no aggregation, no state, so it runs unchanged in
    * append-mode Structured Streaming: fit offline, cluster the 24/7
    * ingest. Assignments match [[fitAssign]]'s bit-for-bit (same
    * kernel, same quantization). */
  def assignRows(embs: DataFrame, vecCol: String, idCol: String,
                 cents: Array[Array[Long]]): DataFrame =
    embs.select(col(idCol).cast("long").as(idCol),
      assignCol(qVec(col(vecCol)),
        typedlit(cents.map(_.toSeq).toSeq)).as("cluster"))

  /** End-to-end: quantize, fit, assign every vector. Output: (id,
    * cluster) — assignment against the FINAL centroids, exactly the
    * oracle's last CTE. */
  def fitAssign(embs: DataFrame, vecCol: String, idCol: String, k: Int,
                iters: Int, loopPartitions: Int = 8): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(loopPartitions >= 1, s"loopPartitions must be >= 1, got $loopPartitions")
    val qdf = embs
      .select(col(idCol).cast("long").as("__id"), qVec(col(vecCol)).as("__qv"))
      .repartition(loopPartitions, col("__id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = fit(qdf, k, iters)
      qdf.crossJoin(broadcast(cFrame(qdf.sparkSession, cents)))
        .select(col("__id").as(idCol),
          assignCol(col("__qv"), col("__qc")).as("cluster"))
    } finally {
      qdf.unpersist(blocking = false)
    }
  }
}
