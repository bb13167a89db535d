package graft

/** Throwaway local profiling harness for q_pagerank — NOT a spec.
  * Run: sbt "Test/runMain graft.GraphProbe /root/testdata/sf0.1 32"
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).appName("graph-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries("q_pagerank")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      System.err.println(s"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
