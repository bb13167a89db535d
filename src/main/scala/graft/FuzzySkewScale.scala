package graft

import graft.operators.FuzzyMatch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical skew + pruning measurement for the thresholded fuzzy join
  * (VERDICT r12 #3) — the numbers behind SCALING.md "Thresholded fuzzy
  * join: measured pruning and skew". The r12 scaladoc ASSERTED the
  * skew/pruning story; this main measures it along the three axes that
  * actually govern it:
  *
  *   1. tau: the pruning bounds tighten with the threshold (prefix
  *      length = L·(1−frac)+1, frac → 1 as tau → 1), so candidate
  *      share vs brute force is measured across a tau ladder;
  *   2. corpus shape: `names` (short diverse strings with planted
  *      near-dups — the reference's FuzzyMatch domain) vs
  *      `boilerplate` (one template, tiny varying suffix: every value
  *      in ONE length band sharing almost every signature char — the
  *      adversarial hot-key regime where candidates approach the
  *      distinct-value brute force BY CONSTRUCTION and the defense is
  *      the distinct-value collapse);
  *   3. growth: distinct-value ladders with fitted time/candidate
  *      exponents, plus Zipf row duplication at fixed distinct values
  *      (candidate work must track VALUES, not rows).
  *
  * Round-13 finding this probe forced: the r12 signature truncated by
  * RAW char order, putting the most common chars (space, digits) in
  * every prefix — candidates read ≈100% of brute force even on diverse
  * values. The scrambled-order rework (JaroWinkler.signature) is
  * measured here; the residual honest limitation — char-bag prefixes
  * cannot prune small-alphabet long strings at tau ≤ 0.9, where
  * frac = 0.5 keeps half the multiset — is documented with numbers.
  *
  * Usage: `sbt "runMain graft.FuzzySkewScale [runs]"` (default 2).
  */
object FuzzySkewScale {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def hw(src: Column, k: Int): Column =
      hex(pmod(xxhash64(src * lit(2654435761L) + lit(k)), lit(1 << 20)))

    // short diverse values with PLANTED near-dups: every 5th value is a
    // single-char-suffixed copy of another value, so qualifying pairs
    // exist at every tau (the reference's names-matching domain shape)
    def names(n: Int, seed: Int): DataFrame =
      spark.range(0L, n.toLong, 1L, 32)
        .select(col("id"),
          when(pmod(col("id"), lit(5)) === 0,
            concat(hw(floor(col("id") / 5) * 5 + 1 + lit(seed), 1), lit("x")))
            .otherwise(hw(col("id") + lit(seed), 1)).as("v"))
        .localCheckpoint(true)

    // one template, tiny varying suffix: one band, near-identical sigs
    def boilerplate(n: Int, seed: Int): DataFrame =
      spark.range(0L, n.toLong, 1L, 32)
        .select(col("id"),
          concat(lit("connection timeout contacting upstream host "),
            pmod(col("id") * lit(2654435761L) + lit(seed), lit(n * 10)))
            .as("v"))
        .localCheckpoint(true)

    def zipfRows(nRows: Int, nDistinct: Int): DataFrame = {
      val vals = boilerplate(nDistinct, 0).select(col("id").as("vid"), col("v"))
      spark.range(0L, nRows.toLong, 1L, 32)
        .select(col("id"),
          pmod(col("id") * lit(40503L), pmod(col("id"), lit(nDistinct)) + 1)
            .as("vid"))
        .join(vals, "vid")
        .select(col("id"), col("v"))
        .localCheckpoint(true)
    }

    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def measure(tag: String, main: DataFrame, lookup: DataFrame,
                tau: Double): (Double, Long) = {
      val mD = main.select(lower(col("v"))).distinct().count()
      val lD = lookup.select(lower(col("v"))).distinct().count()
      val brute = mD * lD
      val cands = FuzzyMatch.thresholdCandidates(main, "v", lookup, "v", tau).count()
      val quals = FuzzyMatch.thresholdJoin(
        main, "id", "v", lookup, "id", "v", tau).count()
      val t = median((1 to runs).map(_ => time(force(
        FuzzyMatch.thresholdJoin(main, "id", "v", lookup, "id", "v", tau)))))
      println(f"[fuzzy-skew] $tag%-26s tau=$tau mD=$mD%6d lD=$lD%5d " +
        f"brute=$brute%11d cands=$cands%10d (${100.0 * cands / math.max(brute, 1)}%7.3f%%) " +
        f"quals=$quals%7d t=$t%6.2fs")
      (t, cands)
    }

    println(s"[fuzzy-skew] runs=$runs (scrambled-order signature, round 13)")
    // ---- tau ladder on both shapes: pruning power vs threshold
    val nm = names(5000, 0); val nmL = names(1000, 500000)
    val bp = boilerplate(1000, 0); val bpL = boilerplate(250, 1)
    for (tau <- Seq(0.85, 0.9, 0.95, 0.99)) {
      measure("names 5000x1000", nm, nmL, tau)
      measure("boilerplate 1000x250", bp, bpL, tau)
    }

    // ---- distinct-values growth ladders at tau = 0.95
    def ladder(tag: String, sizes: Seq[Int], mk: (Int, Int) => DataFrame,
               lookupOf: Int => Int): Unit = {
      val pts = sizes.map { n =>
        val (t, c) = measure(f"$tag ladder n=$n", mk(n, 0), mk(lookupOf(n), 991), 0.95)
        (n, t, c)
      }
      pts.sliding(2).foreach {
        case Seq((n1, t1, c1), (n2, t2, c2)) =>
          val et = math.log(t2 / t1) / math.log(n2.toDouble / n1)
          val ec = math.log(c2.toDouble / math.max(c1, 1)) /
            math.log(n2.toDouble / n1)
          println(f"[fuzzy-skew] $tag%-12s $n1%6d->$n2%6d exponents: " +
            f"time $et%.2f cands $ec%.2f")
        case _ => ()
      }
    }
    ladder("names", Seq(2000, 5000, 12500), names, n => n / 5)
    ladder("boilerplate", Seq(500, 1000, 2000), boilerplate, n => n / 4)

    // ---- rows vs distinct values: Zipf duplication over 1000 values
    for (rows <- Seq(10000, 100000)) {
      val m = zipfRows(rows, 1000)
      val t = median((1 to runs).map(_ => time(force(
        FuzzyMatch.thresholdJoin(m, "id", "v", bpL, "id", "v", 0.95)))))
      println(f"[fuzzy-skew] zipf rows=$rows%7d distinct<=1000 t=$t%6.2fs")
    }
    spark.stop()
  }
}
