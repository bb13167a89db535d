package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three tight planted clusters around distinct corners
  private def planted(n: Int, jitter: Double = 0.01) = (0 until n).map { i =>
    val c = i % 3
    val base = c match {
      case 0 => Array(1.0, 0.0, 0.0, 0.0)
      case 1 => Array(0.0, 1.0, 0.0, 0.0)
      case _ => Array(0.0, 0.0, 1.0, 1.0)
    }
    val r = new scala.util.Random(i)
    (i.toLong, base.map(v => (v + (r.nextDouble() - 0.5) * jitter).toFloat).toSeq, c)
  }.toDF("id", "vec", "c")

  test("planted clusters recovered exactly (pure assignment per cluster)") {
    val out = KMeans.fitAssign(planted(90), "vec", "id", k = 3, iters = 5)
      .join(planted(90).select("id", "c"), Seq("id"))
      .select("cluster", "c").as[(Long, Int)].collect()
    // every true cluster maps to exactly one fitted cluster
    val m = out.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).distinct }
    assert(m.values.forall(_.size == 1), m)
    assert(m.values.flatten.toSet.size == 3)
  }

  test("assignments are bit-identical across partition layouts") {
    val base = planted(91)
    def run(df: org.apache.spark.sql.DataFrame) =
      KMeans.fitAssign(df, "vec", "id", k = 3, iters = 4)
        .as[(Long, Long)].collect().toMap
    assert(run(base.repartition(1)) == run(base.repartition(13, col("c"))))
  }

  test("empty cluster keeps its previous centroid instead of vanishing") {
    // all vectors identical with k = 2: farthest-first runs out of
    // distinct vectors and duplicates the seed, so cluster 1 is empty
    // from the first iteration — it must carry its position through 3
    // updates (no NaN/crash) and simply never win an assignment
    val df = Seq((0L, Seq(0.5f, 0.5f)), (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(0.5f, 0.5f))).toDF("id", "vec")
    val out = KMeans.fitAssign(df, "vec", "id", k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet == Set(0L))
  }

  test("distance ties break to the lowest centroid id") {
    // seeds: id 0 (lowest id), then id 1 (farthest). id 2 sits exactly
    // equidistant between them -> the tie must go to centroid 0.
    // iters = 0 isolates the tie-break from Lloyd drift.
    val df = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.5f, 0.5f))).toDF("id", "vec")
    val out = KMeans.fitAssign(df, "vec", "id", k = 2, iters = 0)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
  }

  test("real embeddings: purity matches what the geometry allows") {
    // this table's labels are only WEAKLY geometric: measured with
    // float64 numpy, nearest-label-centroid accuracy (the ceiling for
    // any centroid method) is 0.366, and float Lloyd's from the same
    // farthest-first seeds reaches purity 0.18. The assertion is
    // therefore calibrated to the DATA, not to a wished-for 0.9:
    // the fixed-point fit must land at the float implementation's
    // level (>= 0.16) and above the trivial one-cluster floor (0.126,
    // the largest label's share).
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = KMeans.fitAssign(embs, "embedding", "vec_id", k = 10, iters = 4)
      .join(embs.select(col("vec_id"), col("label")), Seq("vec_id"))
    val purity = out.groupBy("cluster", "label").count()
      .groupBy("cluster").agg(max("count").as("top"), sum("count").as("n"))
      .agg(sum("top").cast("double") / sum("n")).as[Double].head()
    assert(purity >= 0.16, s"cluster purity $purity below the float-Lloyd level")
    assert(purity > 0.126, s"cluster purity $purity no better than one cluster")
  }

  test("argument guards") {
    val df = planted(6)
    intercept[IllegalArgumentException](
      KMeans.fitAssign(df, "vec", "id", k = 0, iters = 1))
    intercept[IllegalArgumentException](
      KMeans.fitAssign(df, "vec", "id", k = 2, iters = -1))
  }
}
