package graft
object KMeansProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{GraftBridge, ArgminSqDist}
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .appName("km-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val qdf = Seq((0L, Seq(1000000L, 0L)), (1L, Seq(1000000L, 0L)),
      (2L, Seq(500000L, 500000L))).toDF("__id", "__qv")
    val cents = Seq(Tuple1(Seq(Seq(1000000L, 0L), Seq(1000000L, 0L)))).toDF("__qc")
    val a = qdf.crossJoin(broadcast(cents))
      .select(col("__id"), GraftBridge.column(ArgminSqDist(
        GraftBridge.expression(col("__qv")), GraftBridge.expression(col("__qc")))).as("cid"))
    a.show()
    // and interpreted path (no codegen)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    a.show()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.stop()
  }
}
