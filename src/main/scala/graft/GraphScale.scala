package graft

import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical wall-time scaling of fixed-point PageRank — the
  * measurement behind SCALING.md "Link-graph centrality". The claims
  * (setup = one edge shuffle, per-round cost linear in |E| with
  * state-sized exchanges only) rest on the PlanSpec round pin and
  * analysis; this main runs the ACTUAL operator at a geometric ladder
  * of edge counts and prints setup/total wall times so the growth
  * exponents are measured, not argued.
  *
  * Graph: hash-derived (no RNG, reproducible) directed multigraph on
  * n = |E|/8 nodes — src uniform, dst hash-mixed with a bias that
  * gives ~8× in-degree skew to low ids (hubs), ~1/9 of nodes made
  * dangling by dropping their out-edges (exercises the dangling
  * broadcast path at every round).
  *
  * Usage: `sbt "runMain graft.GraphScale [edgesCsv] [iters] [runs]"`
  * (default 100000,400000,1600000 edges, 6 iterations, 3 runs).
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("100000,400000,1600000")
      .split(",").map(_.trim.toInt).toSeq
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges(m: Int) = {
      val n = (m / 8).max(16).toLong
      spark.range(0L, m.toLong, 1L, 32)
        .select(pmod(col("id") * 37L, lit(n)).as("src"),
          // quadratic residue concentrates dst mass on low ids (hubs)
          pmod(pmod(xxhash64(col("id")), lit(n)) * pmod(xxhash64(col("id")), lit(n)),
            lit(n)).as("dst"))
        .filter(pmod(col("src"), lit(9)) =!= 0) // src≡0 (mod 9) → dangling
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    println(f"${"edges"}%8s ${"nodes"}%8s ${"setup_s"}%9s ${"total_s"}%9s ${"perRound_s"}%11s")
    sizes.foreach { m =>
      val e = edges(m)
      // one warmup pass, then timed runs; noop write materializes
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        // setup probe: edge dedup + degrees + initial state, via iters=0
        Graph.pageRank(e, iters = 0)
          .write.format("noop").mode("overwrite").save()
        val setup = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        Graph.pageRank(e, iters = iters)
          .write.format("noop").mode("overwrite").save()
        (setup, (System.nanoTime() - t1) / 1e9)
      }
      once() // warmup
      val timed = (1 to runs).map(_ => once())
      val nNodes = (m / 8).max(16)
      val setup = median(timed.map(_._1))
      val total = median(timed.map(_._2))
      println(f"$m%8d $nNodes%8d $setup%9.2f $total%9.2f ${(total - setup) / iters}%11.2f")
    }
    spark.stop()
  }
}
