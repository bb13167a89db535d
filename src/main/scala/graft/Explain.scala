package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or all queries.
  * Usage: runMain graft.Explain <sfDir> [queryName]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.all.filter(q => only.forall(_ == q.name)).foreach { q =>
      println(s"\n===== ${q.name} =====")
      println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
