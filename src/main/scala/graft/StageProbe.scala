package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r17 optimization round): per-STAGE time attribution for
  * one query — the local stand-in for the Spark UI's stage table
  * (guide §1.1/§7.1; `spark.ui.enabled` stays false in this sandbox).
  * Runs the query once untimed (codegen/JIT absorb), then once with a
  * stage listener, and prints each stage's wall duration, task count,
  * and name so the expensive stage is identified by MEASUREMENT
  * before anything is changed.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StageProbe <sfDir> <query> [runs]"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = Queries.all.find(_.name == qname)
      .getOrElse(sys.error(s"unknown query $qname"))
    def force(): Unit =
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    force() // warmup
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
          .getOrElse(-1L)
        stages.add((i.stageId, ms, i.numTasks, i.name.takeWhile(_ != '\n').take(90)))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    (0 until runs).foreach(_ => force())
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
    spark.sparkContext.removeSparkListener(l)
    println(f"[probe] $qname%s wall=${wall / runs}%.3f s x $runs%d runs")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, ms, n, name) =>
      println(f"[probe] stage $id%4d ${ms}%6d ms $n%4d tasks  $name%s")
    }
    spark.stop()
  }
}
