package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k, O(|queries| * |corpus|).
  *    Correctness baseline; right answer when |queries| is small (the
  *    corpus side streams, queries broadcast).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing: corpus hashed once
  *    into sign-pattern buckets, each query probes its own bucket (and,
  *    with `multiProbe`, every bucket at Hamming distance 1 — recall
  *    recovery at nBits× candidate cost), exact cosine re-ranks within
  *    candidates.
  *  - [[ivfTopK]]: IVF-style coarse quantizer — k-means centroids
  *    (Lloyd iterations as DataFrame jobs; only the tiny centroid table
  *    ever reaches the driver), corpus assigned to its nearest
  *    centroid's inverted list, queries probe the `nProbes` nearest
  *    lists. The standard billion-scale layout (IVF-Flat): candidate
  *    count scales with |corpus| * nProbes / nCentroids.
  */
object Similarity {

  /** Exact top-k by cosine. Queries are broadcast; the big corpus side
    * never shuffles — the only wide op is the per-query top-k window over
    * |queries| * k candidate rows.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        round(VectorFunctions.cosineSimilarity(col("__qv"), col("__cv")), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id").asc)))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** LSH-bucketed ANN: candidates = corpus vectors sharing the query's
    * hyperplane-sign bucket; exact cosine re-rank inside the bucket.
    * Recall is tunable via `nBits` (fewer bits = bigger buckets = higher
    * recall, more compute) and `multiProbe` (also probe the nBits
    * buckets one sign-flip away).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nBits: Int = 8, multiProbe: Boolean = false): DataFrame = {
    val c = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
      .withColumn("__bkt", VectorFunctions.cosineLshBucket(col("__cv"), nBits))
    val q0 = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qbkt", VectorFunctions.cosineLshBucket(col("__qv"), nBits))
    val q =
      if (!multiProbe) q0.withColumn("__bkt", col("__qbkt"))
      else q0.withColumn("__bkt", explode(array(
        col("__qbkt") +: (0 until nBits).map(b =>
          col("__qbkt").bitwiseXOR(lit(1L << b))): _*)))
    c.join(q.drop("__qbkt"), Seq("__bkt"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        round(VectorFunctions.cosineSimilarity(col("__qv"), col("__cv")), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id").asc)))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** Deterministic Lloyd k-means over unit vectors (cosine/spherical:
    * assignment by max dot product). Returns (centroid_id, vec) — a tiny
    * table; each iteration is one distributed assign + reduce, and only
    * nCentroids * dim doubles are collected.
    */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, idCol: String,
                      nCentroids: Int, iters: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    val unit = corpus.select(col(idCol).as("__id"),
      VectorFunctions.l2Normalize(col(vecCol)).as("__v"))
    // deterministic init: the nCentroids lowest-id vectors
    var centroids = unit.orderBy(col("__id").asc).limit(nCentroids)
      .select(row_number().over(Window.orderBy(col("__id"))).cast("long").as("centroid_id"),
        col("__v").as("__cvec"))
    import scala.jdk.CollectionConverters._
    var prevRows = centroids.collect().toSeq
    var schema = centroids.schema
    for (_ <- 1 to iters) {
      val current = spark.createDataFrame(prevRows.asJava, schema)
      val assigned = assign(unit, current)
      val means = assigned
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy("centroid_id", "__dim").agg(avg("__x").as("__m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("__dim"), col("__m")))).as("__p"))
        .select(col("centroid_id"),
          VectorFunctions.l2Normalize(
            transform(col("__p"), p => p.getField("__m"))).as("__cvec"))
      // materialize the tiny centroid table through the driver: breaks
      // the per-iteration lineage (otherwise iteration N re-executes all
      // prior assignments) — only nCentroids * dim doubles move. A
      // centroid that captured zero points this pass keeps its previous
      // position instead of vanishing (a shrinking centroid set would
      // silently degrade the nProbes/nCentroids recall math).
      val updated = means.collect().map(r => r.getLong(0) -> r).toMap
      schema = means.schema
      prevRows = prevRows.map(prev => updated.getOrElse(prev.getLong(0), prev))
    }
    spark.createDataFrame(prevRows.asJava, schema)
  }

  /** Nearest-centroid assignment (argmax dot) via broadcast + window. */
  private def assign(unit: DataFrame, centroids: DataFrame): DataFrame =
    unit.crossJoin(broadcast(centroids))
      .withColumn("__dot", VectorFunctions.dot(col("__v"), col("__cvec")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__dot").desc, col("centroid_id").asc)))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__v"), col("centroid_id"))

  /** IVF-Flat ANN: corpus bucketed by nearest centroid, queries probe the
    * `nProbes` nearest inverted lists, exact cosine re-rank within.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int,
              nCentroids: Int = 16, nProbes: Int = 2,
              kmeansIters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(corpus, vecCol, idCol, nCentroids, kmeansIters)
    val corpusUnit = corpus.select(col(idCol).as("corpus_id"),
      VectorFunctions.l2Normalize(col(vecCol)).as("__cv"))
    val corpusAssigned = corpusUnit
      .crossJoin(broadcast(centroids))
      .withColumn("__dot", VectorFunctions.dot(col("__cv"), col("__cvec")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("corpus_id"))
          .orderBy(col("__dot").desc, col("centroid_id").asc)))
      .filter(col("__rn") === 1)
      .select(col("corpus_id"), col("__cv"), col("centroid_id"))
    val queriesProbing = queries
      .select(col(idCol).as("query_id"),
        VectorFunctions.l2Normalize(col(vecCol)).as("__qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__dot", VectorFunctions.dot(col("__qv"), col("__cvec")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__dot").desc, col("centroid_id").asc)))
      .filter(col("__rn") <= nProbes)
      .select(col("query_id"), col("__qv"), col("centroid_id"))
    corpusAssigned.join(queriesProbing, Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      // unit vectors: cosine = dot
      .withColumn("cosine", round(VectorFunctions.dot(col("__qv"), col("__cv")), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id").asc)))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }
}
