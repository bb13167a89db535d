package graft

/** Throwaway timing probe for trainScore at sf0.1. */
object ClassifierTime {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .appName("cls-time").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[time] docs=${docs.count()}")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val lab = coalesce(col("text").contains("spark"), lit(false))
    for (r <- 1 to 4)
      t(s"r$r full trainScore")(
        graft.operators.Classifier.trainScore(docs, "text", "doc_id", lab,
          buckets = 256, iters = 8, lr = 2.0).count())
    spark.stop()
  }
}
