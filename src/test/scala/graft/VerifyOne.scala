package graft

/** Dev helper: dump + oracle a subset of queries (comma-separated). */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .appName("verify-one").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = names.split(",").toSet
    val qs = SparkEntry.queries.filter { case (k, _) => sel(k) }
    Verify.runQueries(spark, sfDir, outDir, qs).foreach(println)
    val json = SparkEntry.oracleSql.filter { case (k, _) => sel(k) }
      .map { case (k, v) => s"${Verify.jstr(k)}: ${Verify.jstr(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
