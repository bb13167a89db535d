package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical wall-time scaling of the round-15 perceptual screen —
  * the measurement behind SCALING.md's incrementalPhash entry, in the
  * DedupScale pattern: the 100 TB story (index build linear, ingest
  * screen O(batch) with a (maxHamming+1)/bands-pruned index scan) is
  * run at a geometric corpus ladder and the growth exponents printed,
  * not argued.
  *
  * Corpus: in-plan 9×8 PGM images (the q_image_phash construction —
  * one transform lambda, quadratic-residue grays keyed by id), 10% of
  * ids carrying a two-pixel-edited twin of another image so the
  * screen finds real cross-split pairs. 75% of ids are history (the
  * persisted index), 25% the ingest batch.
  *
  * Stages per size (medians of `runs` passes after one warmup):
  *  - `build`: [[Dedup.phashIndex]] over history + partitionBy(band)
  *    parquet write;
  *  - `screen`: [[Dedup.incrementalPhash]] of the batch against the
  *    persisted index, materialized via noop write (pair count
  *    printed beside it — output-bound regimes are visible, not
  *    hidden in the exponent).
  *
  * Usage: `sbt "runMain graft.PhashScale [sizesCsv] [runs]"`
  * (default 20000,60000,200000 and 3 runs).
  */
object PhashScale {
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
    import org.apache.spark.sql.{Column, DataFrame}

    def image(id: Column): Column = {
      // xxhash-derived pixels: 64 gradient bits of near-full entropy, so
      // accidental Hamming≤6 pairs are ~zero at any ladder size and the
      // OUTPUT stays linear (planted twins only) — the first corpus
      // (q_image_phash's quadratic residue) collides structurally at
      // scale and measures output growth, not operator cost
      val base = when(pmod(id, lit(10)) === 1, id - 1).otherwise(id)
      val isDup = pmod(id, lit(10)) === 1
      val px = unhex(array_join(transform(sequence(lit(0), lit(71)), p => {
        val g0 = pmod(xxhash64(base, p), lit(256))
        val pert = when(isDup && p === 40, 90L).otherwise(0L)
        lpad(hex(pmod(g0 + pert, lit(256))), 2, "0")
      }), ""))
      concat(encode(lit("P5\n9 8\n255\n"), "UTF-8"), px)
    }

    def corpus(n: Int): DataFrame =
      spark.range(n).select(col("id").as("doc_id"), image(col("id")).as("img"))

    def timeMedian(f: () => Unit): Double = {
      f() // warmup
      val ts = (0 until runs).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(runs / 2)
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    println(f"${"n"}%10s ${"kb"}%3s ${"build_s"}%10s ${"screen_s"}%10s ${"pairs"}%10s")
    val rows = (for (kb <- Seq(1, 2)) yield sizes.map { n =>
      val c = corpus(n)
      val hist = c.filter(pmod(col("doc_id"), lit(4)) =!= 3)
      val batch = c.filter(pmod(col("doc_id"), lit(4)) === 3)
      val dir = java.nio.file.Files.createTempDirectory(s"phsc_${kb}_$n").toString
      val tBuild = timeMedian(() =>
        Dedup.phashIndex(hist, "img", "doc_id", keyBands = kb)
          .write.mode("overwrite").partitionBy("band").parquet(dir))
      val screen = () => Dedup.incrementalPhash(batch, dir, "img", "doc_id",
        maxHamming = 6, bands = 8, keyBands = kb)
      val pairs = screen().count()
      val tScreen = timeMedian(() => noop(screen()))
      println(f"$n%10d $kb%3d $tBuild%10.2f $tScreen%10.2f $pairs%10d")
      (n, tBuild, tScreen)
    }).toArray
    for ((kbRows, kb) <- rows.zip(Seq(1, 2)) if kbRows.size >= 2) {
      val (n0, b0, s0) = kbRows.head
      val (n1, b1, s1) = kbRows.last
      val k = math.log(n1.toDouble / n0)
      println(f"keyBands=$kb%d build exponent  ~ ${math.log(b1 / b0) / k}%.2f")
      println(f"keyBands=$kb%d screen exponent ~ ${math.log(s1 / s0) / k}%.2f")
    }
    spark.stop()
  }
}
