package graft

/** Adjudication-evidence dump (round 12, VERDICT r11 #1): for the named
  * queries, write the physical plan plus MEASURED stage count, task
  * count, and shuffle bytes to a file that gets committed NEXT to the
  * BASELINE.md pin — so a future band inflation can be attributed
  * (same plan + same stage count + same shuffle bytes ⇒ scheduling
  * noise; any of them moved ⇒ a real plan regression the band must not
  * absorb).
  *
  * Run: sbt 'Test/runMain graft.PlanSnapshot /root/testdata/sf0.1 goldens/loop_plan_snapshot.txt q_pagerank,q_dup_clusters_dist'
  */
object PlanSnapshot {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outPath = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .appName("plan-snapshot").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = BenchMetrics.attach(spark)
    val sb = new StringBuilder
    sb.append(s"# Plan + metrics snapshot (sfDir=$dir)\n")
    sb.append("# Regenerate: sbt 'Test/runMain graft.PlanSnapshot <sfDir> <out> <names>'\n")
    names.foreach { name =>
      // the loop queries (pagerank, label propagation) run their
      // iterations EAGERLY at construction over checkpointed state, so
      // the metrics bracket must open before queries() is called — a
      // post-construction bracket would credit them one projection
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      val before = m.snapshot()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      // exact attribution needs the bus empty before the delta read
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      val snap = m.snapshot() - before
      sb.append(s"\n## $name\n")
      sb.append(f"stages=${snap.stages}%d tasks=${snap.tasks}%d " +
        f"shuffle_write_mb=${BenchMetrics.mb(snap.shuffleWriteB)}%.3f " +
        f"shuffle_read_mb=${BenchMetrics.mb(snap.shuffleReadB)}%.3f " +
        f"input_mb=${BenchMetrics.mb(snap.inputB)}%.3f " +
        f"spill_mb=${BenchMetrics.mb(snap.spillB)}%.3f\n")
      sb.append("```\n")
      // the final executed plan (post-AQE where applicable)
      sb.append(df.queryExecution.executedPlan.toString)
      sb.append("\n```\n")
    }
    BenchMetrics.detach(spark, m)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), sb.toString)
    System.err.println(s"[plan-snapshot] wrote $outPath")
    spark.stop()
  }
}
