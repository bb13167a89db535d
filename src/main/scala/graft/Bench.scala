package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line of per-query seconds.
  *
  * Methodology: a warmup action first absorbs JVM/codegen/parquet-footer
  * costs (otherwise whichever query runs first eats ~4 s of startup);
  * results are forced through the `noop` sink so every output column is
  * actually computed — `.count()` would let Catalyst prune a
  * projection-only query down to a scan. Each query runs
  * SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the per-query
  * MEDIAN — a single contended run on a shared machine must not
  * masquerade as a regression (round 2's single-shot artifact read 1.9×
  * on noise alone).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: one small end-to-end action per table family
    try {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      force(li.groupBy("l_returnflag").agg(count(lit(1))))
      force(spark.read.parquet(s"$sfDir/documents.parquet").limit(100))
      force(spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100))
    } catch { case _: Throwable => () }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // run-major order (all queries, then the next full pass) so repeated
    // runs of one query don't benefit from a still-hot page cache more
    // than the driver's single-pass methodology would
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b narrows the surface for local
    // iteration on one query's plan; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the query surface: " +
          s"${unknown.toSeq.sorted.mkString(",")} — a typo would silently bench nothing")
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val samples = (1 to runs).map { _ =>
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { force(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    val results = names.map { case (name, _) =>
      val mine = samples.map(_.find(_._1 == name).get)
      (name, median(mine.map(_._2)), mine.forall(_._3))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries are named explicitly — a time-to-failure must never
    // read as a fast success
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
