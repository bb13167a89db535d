package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-ingest ANN measurement (round 13, VERDICT r12 #5): the
  * per-batch embedding near-dup screen probed against a persisted FLAT
  * IVF index vs the PQ index, at a geometric ladder of HISTORY sizes
  * with a fixed ingest batch — so "PQ changes the ingest economics"
  * carries measured growth exponents and the recall its shortlist
  * budget buys, not just the 64×-smaller-lists argument. Mirrors
  * [[AnnScale]]'s corpus (hash-derived clustered vectors, dim 64) and
  * methodology (medians of `runs` passes after one warmup; builds are
  * one-shot offline and reported separately).
  *
  * Usage: `sbt "runMain graft.IncrementalAnnScale [sizesCsv] [runs]"`
  * (default 20000,60000,200000 history and 3 runs; batch = 500).
  */
object IncrementalAnnScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("20000,60000,200000")
      .split(",").map(_.trim.toInt).toSeq
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val nBatch = 500
    val dim = 64
    val threshold = 0.8
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def u(x: Column): Column =
      (pmod(xxhash64(x), lit(2001)) - lit(1000)).cast("double") / lit(1000.0)

    // clustered corpus like AnnScale: center from the cluster hash,
    // per-vector perturbation from the id hash — near-dups are real
    def vecs(n: Int, seed: Int): DataFrame = {
      val cluster = pmod(col("vec_id") * lit(2654435761L) + lit(seed), lit(n / 100 + 1))
      spark.range(0L, n.toLong, 1L, 32)
        .select((col("id") + lit(seed.toLong * 1000000L)).as("vec_id"))
        .select(col("vec_id"),
          array((0 until dim).map(d =>
            (u(cluster * lit(1000) + lit(d)) +
              u(col("vec_id") * lit(31) + lit(d)) * lit(0.15)).cast("float")): _*)
            .as("embedding"))
        .localCheckpoint(true)
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println("[inc-ann] hist  flatBuild(s)  pqBuild(s)  flatProbe(s)  pqProbe(s)  pqRecallVsFlat")
    val pts = sizes.map { n =>
      val hist = vecs(n, 0)
      val batch = vecs(nBatch, 777)
      val nCentroids = math.max(16, math.sqrt(n.toDouble).toInt)
      val flatDir = s"/tmp/graft-inc-ann/flat/$n"
      val pqDir = s"/tmp/graft-inc-ann/pq/$n"
      val tFb = time(Similarity.buildIvfIndex(
        hist, "embedding", "vec_id", flatDir, nCentroids = nCentroids))
      val tPb = time(Similarity.buildIvfPqIndex(
        hist, "embedding", "vec_id", pqDir, nCentroids = nCentroids,
        pqM = 4, pqCodes = 16, pqIters = 2))
      def flat() = Dedup.incrementalEmbedding(
        batch, flatDir, "embedding", "vec_id", threshold, nProbes = 8)
      def pq() = Dedup.incrementalEmbeddingPq(
        batch, pqDir, "embedding", "vec_id", threshold, nProbes = 8,
        rerank = 100)
      force(flat()); force(pq()) // warmup
      val tf = median((1 to runs).map(_ => time(force(flat()))))
      val tp = median((1 to runs).map(_ => time(force(pq()))))
      // recall of the PQ screen vs the flat screen at the same probes:
      // the flat probe IS exact on the probed lists, so this isolates
      // what the ADC shortlist budget costs
      val truth = flat().select("new_id", "hist_id").localCheckpoint(true)
      val nTruth = truth.count().toDouble.max(1.0)
      val rec = truth.join(pq(), Seq("new_id", "hist_id"), "left_semi")
        .count() / nTruth
      import org.apache.spark.sql.GraftBridge.unpersistCheckpoint
      unpersistCheckpoint(truth); unpersistCheckpoint(hist); unpersistCheckpoint(batch)
      println(f"[inc-ann] $n%7d ${tFb}%12.2f ${tPb}%11.2f ${tf}%12.2f ${tp}%10.2f ${rec}%14.3f")
      (n, tf, tp)
    }
    pts.sliding(2).foreach {
      case Seq((n1, f1, p1), (n2, f2, p2)) =>
        def ex(a: Double, b: Double) = math.log(b / a) / math.log(n2.toDouble / n1)
        println(f"[inc-ann] $n1%d->$n2%d: flat-probe exp=${ex(f1, f2)}%.2f  " +
          f"pq-probe exp=${ex(p1, p2)}%.2f")
      case _ => ()
    }
    spark.stop()
  }
}
