package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-probe for the r14 trainer rewrite: per-iteration cost of the
  * Lloyd reduction, old `.rdd.map/reduceByKey` shape vs the
  * DataFrame-native `kmeansIterSums` aggregation, on the AnnScale
  * planted-cluster corpus at one size/centroid-count. Prints one line
  * per variant per pass — wall seconds for ONE assignment+reduce
  * iteration (the init collect is excluded; both variants read the
  * same persisted unit frame).
  *
  * Usage: `sbt "runMain graft.TrainerProbe [n] [nCentroids] [passes]"`
  */
object TrainerProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val nCentroids = args.drop(1).headOption.map(_.toInt)
      .getOrElse(math.max(16, math.sqrt(n.toDouble).toInt))
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val dim = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def u(x: Column): Column =
      (pmod(xxhash64(x), lit(2001)) - lit(1000)).cast("double") / lit(1000.0)
    val nClusters = math.max(n / 100, 1)
    val corpus = spark.range(0L, n.toLong, 1L, 32)
      .select(col("id").as("vec_id"), pmod(col("id"), lit(nClusters)).as("__c"))
      .select(col("vec_id"),
        array((0 until dim).map { d =>
          (u(col("__c") * lit(dim) + lit(d)) +
            lit(0.15) * u(col("vec_id") * lit(dim) + lit(d) + lit(1000000007L)))
            .cast("float")
        }: _*).as("embedding"))
    val unit = corpus
      .select(col("vec_id").as("__id"),
        VectorFunctions.l2Normalize(col("embedding")).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = unit.orderBy(col("__id").asc).limit(nCentroids)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    println(s"[trainer-probe] n=$n nCentroids=$nCentroids dim=$dim")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[trainer-probe] $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    for (_ <- 1 to passes) {
      time("assign-only") { // the shared work: argmax over centroids
        unit.select(element_at(
            VectorFunctions.topCentroids(col("__v"), centroids, 1), 1)
            .as("centroid_id"))
          .groupBy(col("centroid_id")).agg(count(lit(1)))
          .collect()
      }
      time("old-rdd") {
        unit.withColumn("centroid_id", element_at(
            VectorFunctions.topCentroids(col("__v"), centroids, 1), 1))
          .select(col("centroid_id"), col("__v")).rdd
          .map { r => (r.getLong(0), (r.getSeq[Double](1).toArray, 1L)) }
          .reduceByKey { (a, b) =>
            val (va, na) = a; val (vb, nb) = b
            var i = 0
            while (i < va.length) { va(i) += vb(i); i += 1 }
            (va, na + nb)
          }
          .collectAsMap()
      }
      time("new-dataframe") {
        graft.operators.Similarity.kmeansIterSums(unit, centroids).collect()
      }
      time("df-2step") { // assignment in a select BELOW the generate
        unit.select(element_at(
            VectorFunctions.topCentroids(col("__v"), centroids, 1), 1)
            .as("centroid_id"), col("__v"))
          .select(col("centroid_id"), posexplode(col("__v")).as(Seq("__pos", "__x")))
          .groupBy(col("centroid_id"), col("__pos"))
          .agg(sum(col("__x")), count(lit(1)))
          .collect()
      }
      time("df-dimsums") { // no explode: dim element_at sums, one agg
        val dim = centroids(0).length
        unit.select(element_at(
            VectorFunctions.topCentroids(col("__v"), centroids, 1), 1)
            .as("centroid_id"), col("__v"))
          .groupBy(col("centroid_id"))
          .agg(count(lit(1)).as("n"),
            (0 until dim).map(d =>
              sum(element_at(col("__v"), d + 1)).as(s"s$d")): _*)
          .collect()
      }
    }
    spark.stop()
  }
}
