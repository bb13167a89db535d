package graft

import graft.operators.Similarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by exact cosine, excludes self") {
    val out = Similarity.bruteForceTopK(corpus,
        corpus.filter(col("vec_id") === 1L), "embedding", "vec_id", k = 3)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect()
      .sortBy(_._3)
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 4L)) // by descending cosine
    assert(!out.exists(_._2 == 1L))
  }

  test("lshTopK puts identical vectors in the same bucket (recall on exact dups)") {
    val q = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(corpus, q, "embedding", "vec_id", k = 2, nBits = 2)
      .select("corpus_id").as[Long].collect().toSet
    assert(out.contains(1L)) // identical direction always shares the bucket
  }

  test("multi-probe LSH recall is a superset of single-probe") {
    val q = Seq((10L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    def ids(multi: Boolean) =
      Similarity.lshTopK(corpus, q, "embedding", "vec_id", k = 4,
        nBits = 2, multiProbe = multi)
        .select("corpus_id").as[Long].collect().toSet
    assert(ids(multi = false).subsetOf(ids(multi = true)))
  }

  test("ivfTopK recalls true neighbors on a clustered corpus") {
    // two tight clusters; IVF with 2 centroids must keep same-cluster
    // neighbors together
    val vecs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, Array(1.0f, 0.01f * i, 0.0f))
      else (i.toLong, Array(0.0f, 0.01f * i, 1.0f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "embedding", "vec_id", k = 3, nCentroids = 2, nProbes = 1)
      .select("corpus_id").as[Long].collect().toSet
    assert(out.nonEmpty && out.forall(_ % 2 == 0), s"crossed clusters: $out")
  }

  test("ivfTopK: empty corpus and null vectors degrade gracefully") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      corpus.schema)
    assert(Similarity.ivfTopK(empty, corpus, "embedding", "vec_id", k = 2).count() == 0)
    val withNull = corpus.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val out = Similarity.ivfTopK(withNull, withNull.filter(col("vec_id") === 1L),
      "embedding", "vec_id", k = 2, nCentroids = 2, nProbes = 2)
    assert(out.count() > 0) // null row excluded, no NPE
  }

  test("ANN recall vs exact brute force is measured, not assumed (floors pinned)") {
    // deterministic 300-vector corpus, 10 queries; ground truth = exact
    // top-5 — approximate paths must recover a pinned share of it
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 300)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", 5))
    assert(exact.size == 50)
    val lsh = pairs(Similarity.lshTopK(corpus, queries, "embedding", "vec_id", 5,
      nBits = 4, multiProbe = true))
    val ivf = pairs(Similarity.ivfTopK(corpus, queries, "embedding", "vec_id", 5,
      nCentroids = 8, nProbes = 3))
    val lshRecall = exact.count(lsh.contains).toDouble / exact.size
    val ivfRecall = exact.count(ivf.contains).toDouble / exact.size
    // everything is hash/seed-deterministic: these are measured values
    // with slack, not hopes — a broken bucket join drops them to ~0
    assert(lshRecall >= 0.3, s"LSH recall $lshRecall")
    assert(ivfRecall >= 0.3, s"IVF recall $ivfRecall")
  }

  test("multi-table LSH: recall never drops, output has no duplicate pairs") {
    val rnd = new scala.util.Random(17)
    val corpus = (0 until 300)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def run(tables: Int) = Similarity.lshTopK(corpus, queries,
      "embedding", "vec_id", 5, nBits = 6, nTables = tables)
    val one = run(1).select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val fourRows = run(4).select("query_id", "corpus_id").as[(Long, Long)].collect()
    val four = fourRows.toSet
    // a pair colliding in several tables must occupy ONE top-k slot
    assert(fourRows.length == four.size, "duplicate (query, corpus) pairs in output")
    val r1 = exact.count(one.contains).toDouble / exact.size
    val r4 = exact.count(four.contains).toDouble / exact.size
    assert(r4 >= r1, s"recall dropped with more tables: $r1 -> $r4")
    assert(r4 > 0.0)
  }

  test("two-phase top-k equals the single-window answer on a multi-partition corpus") {
    val rnd = new scala.util.Random(23)
    val corpus = (0 until 500)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(13) // many input partitions: local prune must not change results
    val queries = corpus.filter(col("vec_id") < 5)
    val out = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", 7)
    // reference answer via a plain global window in test code
    val c = corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val ref = c.crossJoin(q).filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", round(
        VectorFunctions.cosineSimilarity(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("corpus_id").asc)))
      .filter(col("rn") <= 7)
      .select(col("query_id"), col("corpus_id"), col("rn"))
    val got = out.select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val want = ref.as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("persistent IVF index: probe equals build-and-probe; scan prunes partitions") {
    val rnd = new scala.util.Random(31)
    val corpus = (0 until 200)
      .map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 6)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.buildIvfIndex(corpus, "embedding", "vec_id", dir,
      nCentroids = 8, kmeansIters = 3)
    val indexed = Similarity.ivfTopKIndexed(spark, dir, queries,
      "embedding", "vec_id", k = 4, nProbes = 2)
    val direct = Similarity.ivfTopK(corpus, queries, "embedding", "vec_id",
      k = 4, nCentroids = 8, nProbes = 2, kmeansIters = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    // deterministic k-means → the index holds the same inverted lists
    assert(rows(indexed) == rows(direct))
    // the probe must reach the scan as a PARTITION filter (skips files),
    // not a post-scan row filter
    val f = indexed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val scanLine = f.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("centroid_id"), f)
  }

  test("null embeddings never occupy top-k slots (brute force)") {
    // a null vector yields a null cosine; the collect_smallest struct
    // ordering would rank a null negc FIRST — both the upstream filter
    // and the topKPerQuery guard must keep such rows out
    val withNulls = corpus.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val out = Similarity.bruteForceTopK(withNulls,
      withNulls.filter(col("vec_id").isin(1L, 99L)), "embedding", "vec_id", k = 3)
    val rows = out.select("query_id", "corpus_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_._2 == 99L), "null-embedding corpus row ranked")
    assert(!rows.exists(_._1 == 99L), "null-embedding query emitted")
    val clean = Similarity.bruteForceTopK(corpus,
      corpus.filter(col("vec_id") === 1L), "embedding", "vec_id", k = 3)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val got = out.select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == clean, "null rows changed the non-null query's answer")
  }

  test("top_centroids kernels with equal centroid matrices compare equal") {
    // Array fields default to reference equality, which would defeat
    // Catalyst canonicalization / subexpression elimination — the
    // expression must compare the matrix by value
    def kernel(m: Array[Array[Double]]): Object =
      org.apache.spark.sql.TopCentroids(
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("embedding"), m, 1)
    val e1 = kernel(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val e2 = kernel(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1 != kernel(Array(Array(2.0, 0.0), Array(0.0, 1.0))))
  }

  test("vector functions: dot / norm / cosine / normalize") {
    val df = Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.l2Norm(col("a")).as("n"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"),
      element_at(VectorFunctions.l2Normalize(col("a")), 1).as("u0"))
      .as[(Double, Double, Double, Double)].collect().head
    assert(row._1 == 25.0 && row._2 == 5.0)
    assert(math.abs(row._3 - 1.0) < 1e-12)
    assert(math.abs(row._4 - 0.6) < 1e-12)
  }

  test("zero vectors: cosine defined as 0, normalize passes through") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val c = df.select(VectorFunctions.cosineSimilarity(col("a"), col("b")))
      .as[Double].collect().head
    assert(c == 0.0)
  }

  test("nearestCentroidConfusion: separable clusters classify diagonally, dups count") {
    // 3 well-separated clusters (orthogonal axes + small noise): the
    // confusion matrix must be purely diagonal with exact counts —
    // including two IDENTICAL vectors, which must each be counted
    val rnd = new scala.util.Random(11)
    val base = Array(Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f))
    val rows = (0 until 30).map { i =>
      val l = i % 3
      val v = base(l).map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      (i.toLong, l, v)
    } :+ ((100L, 0, base(0))) :+ ((101L, 0, base(0))) // exact duplicates
    val out = Similarity.nearestCentroidConfusion(
        rows.toDF("vec_id", "label", "embedding"), "embedding", "label", "vec_id")
      .as[(Int, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map((0, 0) -> 12L, (1, 1) -> 10L, (2, 2) -> 10L), out)
    // string labels are rejected up front (tie-break needs numeric order)
    intercept[IllegalArgumentException] {
      Similarity.nearestCentroidConfusion(
        rows.map { case (id, l, v) => (id, s"L$l", v) }.toDF("vec_id", "label", "embedding"),
        "embedding", "label", "vec_id")
    }
  }
}
