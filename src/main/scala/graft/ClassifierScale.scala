package graft

import graft.operators.Classifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured scaling evidence for the classifier trainer (the DedupScale
  * pattern): featurize and per-iteration cost on a geometric corpus
  * ladder with a plantable linear signal. The 100 TB claim to check is
  * the operator's own: featurization is the ONLY corpus-proportional
  * phase; each training iteration runs on the compact per-doc
  * incidence frame, so iteration cost must grow far slower than the
  * corpus (at these sizes it should hug the local job floor).
  *
  * Every doc draws 30 hash-derived words; even ids get the marker word
  * planted — label = "has marker", learnable by construction, so the
  * run also asserts accuracy stays ≥0.95 at every rung (a trainer that
  * scales but stops learning is not evidence).
  *
  * Usage: `sbt "runMain graft.ClassifierScale [sizesCsv] [runs]"`
  */
object ClassifierScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("20000,60000,200000")
      .split(",").map(_.trim.toInt).toSeq
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Int) = {
      val word = (k: Int) =>
        hex(xxhash64(col("id") * lit(2654435761L) + lit(k)))
      spark.range(0L, n.toLong, 1L, 32)
        .select(col("id").as("doc_id"),
          concat_ws(" ",
            (1 to 30).map(k =>
              if (k == 7) when(col("id") % 2 === 0, lit("marker"))
                .otherwise(word(k))
              else word(k)): _*).as("text"))
        .localCheckpoint(true) // generation stays out of the timings
    }

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    println("[cls-scale] size  featT(s)  it1T(s)  perIterT(s)  acc")
    val results = sizes.map { n =>
      val docs = corpus(n)
      import org.apache.spark.storage.StorageLevel
      def chain(): (Double, Double, Double, Double) = {
        val lab = col("text").contains("marker")
        val (tFeat, perDoc) = time {
          val pd = Classifier
            .perDocFeatures(docs, "text", "doc_id", lab, 4096)
            .repartition(8, col("__id")).persist(StorageLevel.MEMORY_AND_DISK)
          pd.count(); pd
        }
        val (t1, _) = time(Classifier.train(perDoc, 4096, 1, 2.0))
        // marginal per-iteration cost, first-iteration setup excluded
        val (t9, _) = time(Classifier.train(perDoc, 4096, 9, 2.0))
        val w = Classifier.train(perDoc, 4096, 8, 2.0)
        val acc = {
          val scored = Classifier.scoreRows(docs, "text", "doc_id", w, 4096)
            .join(docs.select(col("doc_id"),
              col("text").contains("marker").cast("bigint").as("y")),
              Seq("doc_id"))
          scored.filter(col("predicted").isNotNull)
            .select(avg((col("predicted") === col("y")).cast("double")))
            .collect()(0).getDouble(0)
        }
        perDoc.unpersist(blocking = true)
        (tFeat, t1, (t9 - t1) / 8.0, acc)
      }
      chain() // warmup: codegen + page-in
      val all = (1 to runs).map(_ => chain())
      val med = all.sortBy(t => t._1 + t._2 + t._3).apply(all.size / 2)
      val (tf, t1, ti, acc) = med
      println(f"[cls-scale] $n%6d ${tf}%9.2f ${t1}%8.2f ${ti}%11.3f $acc%5.3f")
      assert(acc >= 0.95, s"trainer stopped learning at n=$n: acc=$acc")
      (n, tf, ti)
    }
    results.sliding(2).foreach {
      case Seq((n1, f1, i1), (n2, f2, i2)) =>
        val r = math.log(n2.toDouble / n1)
        println(f"[cls-scale] $n1%6d->$n2%6d exponents: featurize " +
          f"${math.log(f2 / f1) / r}%5.2f  per-iter ${math.log(i2 / i1) / r}%5.2f")
      case _ =>
    }
    spark.stop()
  }
}
