package graft

import graft.operators.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical wall-time scaling of the ANN tier — the last operator
  * family whose 100 TB story rested on plan shapes alone (the dedup
  * chain and BPE trainer got measured exponents in rounds 8-9). This
  * main runs brute-force, LSH, and IVF top-k at a geometric ladder of
  * corpus sizes with a FIXED query set and prints per-method wall
  * times, growth exponents, and measured recall vs the brute-force
  * truth — so "IVF probes a nProbes/nCentroids fraction of the corpus"
  * is a measured slope, not an argument, and the speed is never quoted
  * without the recall it buys.
  *
  * Corpus: hash-derived (no RNG, reproducible), sf-shaped — dim-64
  * float vectors matching the embeddings table, planted as ~n/100
  * clusters (center from the cluster hash, per-vector perturbation
  * from the id hash) so IVF's centroids model real structure, the
  * same way DedupScale plants real near-dup families.
  *
  * Ladder defaults (20k/60k/200k = sf0.4- through sf4-equivalent
  * corpora at 200 queries) keep brute force tractable so recall is
  * always measured against the exact answer. nCentroids grows with
  * sqrt(n) (the standard IVF sizing); nBits/nProbes stay fixed so the
  * measured LSH/IVF slopes are bucket-density effects, not config
  * drift.
  *
  * Usage: `sbt "runMain graft.AnnScale [sizesCsv] [runs]"`
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("20000,60000,200000")
      .split(",").map(_.trim.toInt).toSeq
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val nQueries = 200
    val k = 10
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hash-uniform in [-1, 1]: (xxh64(x) mod 2001 - 1000) / 1000
    def u(x: Column): Column =
      (pmod(xxhash64(x), lit(2001)) - lit(1000)).cast("double") / lit(1000.0)

    def corpus(n: Int): DataFrame = {
      val nClusters = math.max(n / 100, 1)
      spark.range(0L, n.toLong, 1L, 32)
        .select(col("id").as("vec_id"),
          pmod(col("id"), lit(nClusters)).as("__c"))
        .select(col("vec_id"),
          array((0 until dim).map { d =>
            // tight planted clusters: dominant center + small jitter
            (u(col("__c") * lit(dim) + lit(d)) +
              lit(0.15) * u(col("vec_id") * lit(dim) + lit(d) + lit(1000000007L)))
              .cast("float")
          }: _*).as("embedding"))
        .localCheckpoint(true) // generation stays out of the timings
    }

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    println("[ann-scale] size  bruteT(s)  lshT(s)  sq8T(s)  ivfBuildT(s)  ivfProbeT(s)  pqBuildT(s)  pqProbeT(s)  lshRecall  sq8Recall  ivfRecall  pqRecall")
    println("[ann-scale] (brute/lsh/probe: per-column medians of the timed passes; build: ONE-shot offline buildIvfIndex/buildIvfPqIndex = fit + assign + partitioned write, amortized in production; probe = ivfTopKIndexed / ivfPqTopKIndexed partition-pruned scans)")
    val results = sizes.map { n =>
      val c = corpus(n)
      val q = c.filter(col("vec_id") < nQueries).localCheckpoint(true)
      val nCentroids = math.max(16, math.sqrt(n.toDouble).toInt)
      val idxDir = s"/tmp/graft-ann-scale-index/$n"
      val pqDir = s"/tmp/graft-ann-scale-pq/$n"
      // the index is built ONCE per size (production builds are offline
      // and amortized across every later query batch); its one-shot
      // wall time is reported alongside the per-pass medians.
      // buildIvfIndex persists fit + corpus assignment — O(n·sqrt(n)·d)
      // by the sqrt centroid sizing.
      val (tBuild, _) = time {
        Similarity.buildIvfIndex(c, "embedding", "vec_id", idxDir,
          nCentroids = nCentroids, kmeansIters = 3)
      }
      // PQ build adds codebook training + encode on top of the same
      // coarse fit; the scan-side payoff is codes-only candidate reads
      val (tPqBuild, _) = time {
        Similarity.buildIvfPqIndex(c, "embedding", "vec_id", pqDir,
          nCentroids = nCentroids, kmeansIters = 3,
          pqM = 4, pqCodes = 16, pqIters = 2)
      }
      def pass(): (Double, Double, Double, Double, Double, Double, Double, Double, Double) = {
        val (tBrute, truth) = time {
          val t = Similarity.bruteForceTopK(c, q, "embedding", "vec_id", k)
            .localCheckpoint(true)
          t
        }
        val (tLsh, lsh) = time {
          val r = Similarity.lshTopK(c, q, "embedding", "vec_id", k,
            nBits = 8, multiProbe = true).localCheckpoint(true)
          r
        }
        // SQ8 (r13): the brute-force sweep over 1-byte-per-dim codes —
        // train (one min/max pass) + encode + decode + rank per call,
        // the conservative reading (production trains once per corpus)
        val (tSq8, sq8) = time {
          val r = Similarity.sq8TopK(c, q, "embedding", "vec_id", k)
            .localCheckpoint(true)
          r
        }
        // the per-batch scale path: partition-pruned scan of the probed
        // lists, ~q · nProbes/nCentroids · n · d
        val (tProbe, ivf) = time {
          val r = Similarity.ivfTopKIndexed(spark, idxDir, q,
            "embedding", "vec_id", k, nProbes = 8).localCheckpoint(true)
          r
        }
        // same probe budget, candidates scanned as 4 codes instead of
        // 64 floats, O(M) ADC adds instead of O(dim) multiplies, then
        // the bounded exact refine. rerank = 10·k: on planted clusters
        // the ADC separates LISTS sharply but same-cluster candidates
        // only noisily (their true scores differ by jitter), so the
        // refine depth is the recall lever — measured 0.31 at 3·k,
        // 1.000 at 10·k (PqRecallProbe), the standard IVFPQ+refine
        // depth-vs-recall trade
        val (tPq, pq) = time {
          val r = Similarity.ivfPqTopKIndexed(spark, pqDir, q,
            "embedding", "vec_id", k, nProbes = 8, rerank = 10 * k)
            .localCheckpoint(true)
          r
        }
        val nTruth = truth.count().toDouble.max(1.0)
        def recall(out: DataFrame): Double =
          truth.join(out, Seq("query_id", "corpus_id"), "left_semi")
            .count() / nTruth
        val rLsh = recall(lsh)
        val rSq8 = recall(sq8)
        val rIvf = recall(ivf)
        val rPq = recall(pq)
        import org.apache.spark.sql.GraftBridge.unpersistCheckpoint
        unpersistCheckpoint(truth); unpersistCheckpoint(lsh)
        unpersistCheckpoint(sq8); unpersistCheckpoint(ivf)
        unpersistCheckpoint(pq)
        (tBrute, tLsh, tSq8, tProbe, tPq, rLsh, rSq8, rIvf, rPq)
      }
      pass() // warmup: codegen + checkpoint page-in
      val all = (1 to runs).map(_ => pass())
      // per-COLUMN medians: each method's median is its own — the
      // median-total run would let one method's noise pick another's
      // reading
      val tb = median(all.map(_._1)); val tl = median(all.map(_._2))
      val ts8 = median(all.map(_._3))
      val tp = median(all.map(_._4)); val tq = median(all.map(_._5))
      val rl = median(all.map(_._6)); val rs8 = median(all.map(_._7))
      val ri = median(all.map(_._8)); val rq = median(all.map(_._9))
      println(f"[ann-scale] $n%6d ${tb}%9.2f ${tl}%8.2f ${ts8}%8.2f ${tBuild}%12.2f ${tp}%12.2f ${tPqBuild}%11.2f ${tq}%11.2f ${rl}%9.3f ${rs8}%9.3f ${ri}%9.3f ${rq}%8.3f")
      import org.apache.spark.sql.GraftBridge.unpersistCheckpoint
      unpersistCheckpoint(q); unpersistCheckpoint(c)
      (n, tb, tl, ts8, tBuild, tp, tPqBuild, tq)
    }
    // pairwise growth exponents between adjacent ladder points
    results.sliding(2).foreach {
      case Seq((n1, tb1, tl1, ts1, tf1, tp1, tg1, tq1),
               (n2, tb2, tl2, ts2, tf2, tp2, tg2, tq2)) =>
        def ex(a: Double, b: Double) =
          math.log(b / a) / math.log(n2.toDouble / n1)
        println(f"[ann-scale] $n1%d->$n2%d: brute exp=${ex(tb1, tb2)}%.2f  " +
          f"lsh exp=${ex(tl1, tl2)}%.2f  sq8 exp=${ex(ts1, ts2)}%.2f  " +
          f"ivf-build exp=${ex(tf1, tf2)}%.2f  " +
          f"ivf-probe exp=${ex(tp1, tp2)}%.2f  pq-build exp=${ex(tg1, tg2)}%.2f  " +
          f"pq-probe exp=${ex(tq1, tq2)}%.2f")
      case _ => ()
    }
    spark.stop()
  }
}
