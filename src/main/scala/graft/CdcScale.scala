package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical wall-time scaling of the CDC chunking chain — the
  * measurement behind SCALING.md "Content-defined chunking" (the same
  * evidence rule DedupScale/AnnScale/BpeScale follow: exponents are
  * measured on a geometric corpus ladder, not argued from plan shapes).
  *
  * Corpus: hash-derived (reproducible, no RNG), ~600-char documents of
  * ~30 words. Every 5th document is an EDITED RECRAWL of the previous
  * one — identical text with one sentence substituted mid-document —
  * so `cdcSharedStats` finds real shifted overlap (the operator's
  * reason to exist) and the shared-chunk counts printed alongside make
  * the claim checkable.
  *
  * Chain measured per size (matching the q_cdc_* configs, maskBits 5 /
  * min 16 / max 128): cdcChunks (the narrow pass) -> cdcSharedStats
  * (census + rollup) -> incrementalCdc probe of a half-corpus index.
  * Expected: ~linear in total text for all three (chunking is one
  * pass; census/probe shuffle fingerprint triples).
  *
  * Usage: `sbt "runMain graft.CdcScale [sizesCsv] [runs]"`
  * (default 20000,60000,200000 docs — ~12 MB to ~120 MB of text — and
  * 3 runs).
  */
object CdcScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("20000,60000,200000")
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
      // doc i derives its words from template t(i); every 5th doc reuses
      // the PREVIOUS doc's template with word 13 substituted — an edited
      // recrawl whose overlap sits at shifted offsets
      val tpl = when(pmod(col("id"), lit(5)) === 0 && col("id") > 0,
        col("id") - 1).otherwise(col("id"))
      val word = (k: Int, src: org.apache.spark.sql.Column) =>
        hex(xxhash64(src * lit(2654435761L) + lit(k)))
      spark.range(0L, n.toLong, 1L, 32)
        .select(col("id").as("doc_id"), tpl.as("tpl"))
        .select(col("doc_id"),
          concat_ws(" ", (1 to 30).map(k =>
            if (k == 13)
              when(pmod(col("doc_id"), lit(5)) === 0,
                word(k, col("doc_id") + lit(999999999L)))
                .otherwise(word(k, col("tpl")))
            else word(k, col("tpl"))): _*).as("text"))
        .localCheckpoint(true) // generation stays out of the timings
    }

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    println("[cdc-scale] size  chunks  shared  chunkT(s)  statsT(s)  probeT(s)")
    val results = sizes.map { n =>
      val docs = corpus(n)
      val half = docs.filter(col("doc_id") % 2 === 0)
      val rest = docs.filter(col("doc_id") % 2 =!= 0)
      def chain(): (Double, Double, Double, Long, Long) = {
        val (tChunk, chunks) = time {
          Dedup.cdcChunks(docs, "text", "doc_id").localCheckpoint(true)
        }
        val nChunks = chunks.count()
        val (tStats, nShared) = time {
          Dedup.cdcSharedStats(chunks, "doc_id")
            .agg(sum(col("n_shared"))).collect()(0).getLong(0)
        }
        val (tProbe, _) = time {
          val idx = Dedup.cdcFpIndex(half, "text", "doc_id")
          Dedup.incrementalCdc(rest, idx, "text", "doc_id")
            .write.format("noop").mode("overwrite").save()
        }
        org.apache.spark.sql.GraftBridge.unpersistCheckpoint(chunks)
        (tChunk, tStats, tProbe, nChunks, nShared)
      }
      chain() // warmup: codegen + page-in
      val all = (1 to runs).map(_ => chain())
      val med = all.sortBy(t => t._1 + t._2 + t._3).apply(all.size / 2)
      val (tk, ts, tp, nc, nsh) = med
      println(f"[cdc-scale] $n%6d $nc%7d $nsh%7d ${tk}%9.2f ${ts}%9.2f ${tp}%9.2f")
      (n, tk, ts, tp)
    }
    results.sliding(2).foreach {
      case Seq((n1, tk1, ts1, tp1), (n2, tk2, ts2, tp2)) =>
        def ex(a: Double, b: Double) = math.log(b / a) / math.log(n2.toDouble / n1)
        println(f"[cdc-scale] $n1%d->$n2%d: chunk exp=${ex(tk1, tk2)}%.2f  " +
          f"stats exp=${ex(ts1, ts2)}%.2f  probe exp=${ex(tp1, tp2)}%.2f")
      case _ => ()
    }
    spark.stop()
  }
}
