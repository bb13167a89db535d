package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Throwaway probe: IVF-PQ recall as a function of rerank depth and
  * codebook size on the AnnScale planted-cluster corpus — picks the
  * honest defaults. NOT a spec.
  * Run: sbt 'Test/runMain graft.PqRecallProbe'
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .appName("pq-recall-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def u(x: org.apache.spark.sql.Column) =
      (pmod(xxhash64(x), lit(2001)) - lit(1000)).cast("double") / lit(1000.0)
    val dim = 64
    val nClusters = math.max(n / 100, 1)
    val c = spark.range(0L, n.toLong, 1L, 32)
      .select(col("id").as("vec_id"), pmod(col("id"), lit(nClusters)).as("__c"))
      .select(col("vec_id"), array((0 until dim).map { d =>
        (u(col("__c") * lit(dim) + lit(d)) +
          lit(0.15) * u(col("vec_id") * lit(dim) + lit(d) + lit(1000000007L))).cast("float")
      }: _*).as("embedding"))
      .localCheckpoint(true)
    val q = c.filter(col("vec_id") < 100).localCheckpoint(true)
    val k = 10
    val nCentroids = math.max(16, math.sqrt(n.toDouble).toInt)
    val truth = Similarity.bruteForceTopK(c, q, "embedding", "vec_id", k)
      .select("query_id", "corpus_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).collect().toSet
    for (codes <- Seq(16, 64); rr <- Seq(3 * k, 10 * k, 30 * k)) {
      val out = Similarity.ivfPqTopK(c, q, "embedding", "vec_id", k,
          nCentroids = nCentroids, nProbes = 8, pqM = 4, pqCodes = codes,
          pqIters = 2, rerank = rr)
        .select("query_id", "corpus_id").as[(Long, Long)](
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong)).collect().toSet
      val r = truth.count(out.contains).toDouble / truth.size
      println(f"[pq-probe] n=$n codes=$codes rerank=$rr recall=$r%.3f")
    }
    spark.stop()
  }
}
