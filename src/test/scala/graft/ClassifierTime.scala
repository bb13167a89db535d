package graft

/** Throwaway timing probe for trainScore phases at sf0.1. */
object ClassifierTime {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .appName("cls-time").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val lab = coalesce(col("text").contains("spark"), lit(false))
    val perDoc = graft.operators.Classifier
      .perDocFeatures(docs, "text", "doc_id", lab, 256)
      .repartition(8, col("__id")).persist(StorageLevel.MEMORY_AND_DISK)
    t("featurize")(perDoc.count())
    t("warmup 2 iters")(graft.operators.Classifier.train(perDoc, 256, 2, 2.0))
    for (k <- Seq(0, 1, 2, 4, 8))
      t(s"train k=$k")(graft.operators.Classifier.train(perDoc, 256, k, 2.0))
    // raw job floor for comparison: same cache, trivial agg + collect
    t("floor: 8x count on cache") {
      for (_ <- 1 to 8) perDoc.groupBy(col("y")).count().collect()
    }
    spark.stop()
  }
}
