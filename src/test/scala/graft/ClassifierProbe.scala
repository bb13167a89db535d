package graft

/** Throwaway tuning probe — NOT a spec. Prints accuracy over an
  * (iters, lr) grid for the contains-'spark' task at sf0.001/sf0.01.
  * Run: sbt "Test/runMain graft.ClassifierProbe"
  */
object ClassifierProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .appName("cls-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      for (iters <- Seq(8, 16, 24); lr <- Seq(1.0, 2.0, 4.0)) {
        val out = graft.operators.Classifier.trainScore(docs, "text", "doc_id",
          coalesce(col("text").contains("spark"), lit(false)),
          buckets = 256, iters = iters, lr = lr)
        val acc = out.filter(col("predicted").isNotNull)
          .select(avg((col("label") === col("predicted")).cast("double")))
          .head.getDouble(0)
        println(f"[probe] $dir iters=$iters%3d lr=$lr%5.1f acc=$acc%.3f")
      }
    }
    spark.stop()
  }
}
