package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-merge cost curve of [[graft.operators.Bpe.train]] — the
  * measurement behind SCALING.md "BPE training: incremental pair
  * counts".
  *
  * The round-8 trainer re-split, re-exploded, and re-aggregated the
  * ENTIRE word dictionary on every merge, so per-iteration cost was a
  * flat line at the full-census cost regardless of merge index. The
  * incremental trainer recounts only the words containing the
  * just-merged pair, so per-iteration cost should START near the
  * census cost (early merges touch common symbols and hence a large
  * dictionary fraction) and FLATTEN far below it as merges localize.
  * This main prints both: the one-off census time (the old trainer's
  * per-iteration floor) and the measured per-merge wall times.
  *
  * Corpus: `nDocs` rows of 8 words drawn Zipf-ish (uniform^3 over
  * `vocab` word ids, hex-encoded — a 16-symbol alphabet with shared
  * prefixes, which is what gives early merges their large affected
  * fractions). Hash-derived, no RNG, so runs are reproducible.
  *
  * Usage: `sbt "runMain graft.BpeScale [numMerges] [nDocs] [vocab]"`
  * (defaults 64 / 1M / 65536). Prints one line per merge plus a
  * head/tail summary.
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val numMerges = args.headOption.map(_.toInt).getOrElse(64)
    val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val vocab = args.drop(2).headOption.map(_.toInt).getOrElse(65536)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Zipf-ish word id: (h/2^20)^3 * vocab, h uniform from xxhash64
    def word(k: Int) = {
      val u = pmod(xxhash64(col("id") * lit(k) + lit(k)), lit(1048576L))
        .cast("double") / lit(1048576.0)
      hex(floor(pow(u, lit(3.0)) * lit(vocab.toDouble)).cast("long"))
    }
    val corpus = spark.range(0L, nDocs, 1L, 32)
      .select(concat_ws(" ", (1 to 8).map(word): _*).as("text"))
      .localCheckpoint(true) // generation cost stays out of the timings

    val nWords = graft.operators.Bpe.wordDict(corpus, "text").count()

    // census cost = the old trainer's per-iteration floor: one full
    // explode+count over the dictionary (measured on the same session)
    val censusT0 = System.nanoTime()
    graft.operators.Bpe.wordDict(corpus, "text")
      .select(explode(split(col("r"), "\n\n")).as("s")).filter(col("s") =!= "")
      .groupBy("s").count().write.format("noop").mode("overwrite").save()
    val censusMs = (System.nanoTime() - censusT0) / 1000000L

    val times = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val t0 = System.nanoTime()
    // localDictLimit = 0: this main measures the DISTRIBUTED incremental
    // path (the 100 TB configuration); the driver-local budgeted path
    // would otherwise absorb every dictionary this machine can hold
    val merges = graft.operators.Bpe.train(corpus, "text", numMerges,
      localDictLimit = 0,
      onMerge = (rank, ms) => {
        times += ((rank, ms))
        println(f"[bpe-scale] merge=$rank%4d  ${ms}%6d ms")
      })
    val totalS = (System.nanoTime() - t0) / 1e9
    // a degenerate corpus (single-char vocab -> no adjacent pairs) can
    // complete zero merges; the summary must not divide by an empty
    // window
    def avg(xs: collection.Seq[Long]): String =
      if (xs.isEmpty) "n/a" else s"${xs.sum / xs.size} ms"
    val head = times.take(8).map(_._2)
    val tail = times.takeRight(8).map(_._2)
    println(f"[bpe-scale] nDocs=$nDocs vocab=$vocab dictWords=$nWords " +
      f"merges=${merges.size} total=$totalS%.1f s censusFloor=${censusMs} ms " +
      f"first8avg=${avg(head)} last8avg=${avg(tail)}")
    spark.stop()
  }
}
