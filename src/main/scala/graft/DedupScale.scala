package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical wall-time scaling of the dedup core — the measurement
  * behind SCALING.md "Dedup core: measured scaling exponents"
  * (VERDICT r8 directive #5). The 100 TB claims for minhash → pairs →
  * distributed CC → apply rested on plan shapes and analysis; this
  * main runs the ACTUAL chain at a geometric ladder of corpus sizes
  * and prints per-stage wall times so the growth exponents are
  * measured, not argued.
  *
  * Corpus: hash-derived (no RNG, reproducible), sf-shaped — ~300-char
  * documents of ~50 Zipf-ish words. 10% of documents are near-dups: a
  * cluster of 2-5 docs shares a template with ONE word substituted per
  * member, so minhash at threshold 0.5 finds real pairs and CC builds
  * real multi-member clusters (pair/edge counts printed alongside so
  * the edge-linear CC claim is checkable against the edge count, not
  * just nDocs).
  *
  * Chain measured per size (matching q_dedup_minhash + q_dup_clusters_dist
  * + dedupByPairs configs): minhashLsh(shingle 5, 16 hashes, 4 bands,
  * threshold 0.5) -> dupClusters(localEdgeLimit = 0: FORCED distributed
  * pointer-jump CC) -> dedupByPairs apply. Each stage materialized via
  * noop write; times are medians of `runs` passes after one warmup.
  *
  * Usage: `sbt "runMain graft.DedupScale [sizesCsv] [runs]"`
  * (default sizes 5000,16000,50000 — sf0.1-equivalent up to
  * sf1-equivalent — and 3 runs).
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("5000,16000,50000")
      .split(",").map(_.trim.toInt).toSeq
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Int) = {
      // ~90% unique docs, ~10% in near-dup clusters of 2-5: member k of
      // a cluster perturbs ONE word of the cluster template
      val word = (k: Int, src: org.apache.spark.sql.Column) =>
        hex(pmod(xxhash64(src * lit(2654435761L) + lit(k)), lit(65536)))
      val base = spark.range(0L, n.toLong, 1L, 32)
        .select(col("id").as("doc_id"),
          // every 10th doc joins a cluster; 4 consecutive such docs
          // (ids 40j, 40j+10, 40j+20, 40j+30) share template j
          when(pmod(col("id"), lit(10)) === 0, floor(col("id") / lit(40)))
            .otherwise(col("id") + lit(1000000000L)).cast("long").as("tpl"),
          pmod(col("id"), lit(50)).as("perturb"))
      base.select(col("doc_id"),
        concat_ws(" ",
          (1 to 50).map(k =>
            when(lit(k) === pmod(col("perturb"), lit(50)) + 1,
              word(k, col("doc_id") + lit(7777)))
              .otherwise(word(k, col("tpl")))): _*).as("text"))
        .localCheckpoint(true) // generation stays out of the timings
    }

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    println("[dedup-scale] size  pairs  edgesT(s)  ccT(s)  applyT(s)  totalT(s)")
    val results = sizes.map { n =>
      val docs = corpus(n)
      def chain(): (Double, Double, Double, Long) = {
        val (tPairs, pairs) = time {
          val p = Dedup.minhashLsh(docs, "text", "doc_id",
            shingleSize = 5, numHashes = 16, bands = 4, threshold = 0.5)
            .localCheckpoint(true)
          p
        }
        val nPairs = pairs.count()
        val (tCc, clusters) = time {
          val c = Dedup.dupClusters(pairs, localEdgeLimit = 0L)
            .localCheckpoint(true)
          c
        }
        val (tApply, _) = time {
          Dedup.dedupByPairs(docs, "doc_id", pairs)
            .write.format("noop").mode("overwrite").save()
        }
        import org.apache.spark.sql.GraftBridge.unpersistCheckpoint
        unpersistCheckpoint(pairs); unpersistCheckpoint(clusters)
        (tPairs, tCc, tApply, nPairs)
      }
      chain() // warmup: codegen + page-in
      val all = (1 to runs).map(_ => chain())
      val med = all.sortBy(t => t._1 + t._2 + t._3).apply(all.size / 2)
      val (tp, tc, ta, np) = med
      println(f"[dedup-scale] $n%6d $np%6d ${tp}%9.2f ${tc}%7.2f ${ta}%9.2f ${tp + tc + ta}%9.2f")
      (n, np, tp, tc, ta)
    }
    // pairwise growth exponents between adjacent ladder points
    results.sliding(2).foreach {
      case Seq((n1, p1, tp1, tc1, ta1), (n2, p2, tp2, tc2, ta2)) =>
        def ex(a: Double, b: Double, s1: Double, s2: Double) =
          math.log(b / a) / math.log(s2 / s1)
        println(f"[dedup-scale] $n1%d->$n2%d: pairs x${p2.toDouble / p1}%.2f  " +
          f"minhash exp=${ex(tp1, tp2, n1, n2)}%.2f  " +
          f"cc exp-in-edges=${ex(tc1, tc2, p1.toDouble.max(1), p2.toDouble.max(1))}%.2f  " +
          f"apply exp=${ex(ta1, ta2, n1, n2)}%.2f")
      case _ => ()
    }
    spark.stop()
  }
}
