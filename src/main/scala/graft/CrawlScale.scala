package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical throughput of the r13 crawl front-end kernels — the
  * measurement behind SCALING.md "Crawl front-end kernels". The claim
  * for `html_extract` / `gopherRules` / `c4Rules` / `url_parts` is
  * "scan-speed projection": each is one codegen pass with no shuffle,
  * so corpus cost must grow ~linearly in bytes with a per-byte constant
  * close to the bare-scan floor. This main measures exactly that on a
  * geometric ladder of synthetic crawl pages and prints MB/s per stage
  * so the exponents AND the constants are measured, not argued.
  *
  * Corpus: hash-derived (no RNG, reproducible) HTML pages ~2.5 KB each
  * with realistic markup density — title, a script block with a
  * lookalike close tag, a style block, quoted attributes, eight
  * paragraphs with entities, a list. Stages, each a full pass
  * materialized through an aggregate of the kernel output (so codegen
  * cannot prune the work):
  *
  *   floor    sum(length(html))            — the bare-scan baseline
  *   extract  sum(length(html_extract))    — the HTML strip
  *   rules    gopher+c4 over the extracted — the chained cleaning pass
  *   urls     sum(length(url_parts.normalized)) over one URL per page
  *
  * Times are medians of `runs` passes after one warmup; the corpus is
  * persisted and counted before timing so generation is excluded.
  *
  * Usage: `sbt "runMain graft.CrawlScale [sizesCsv] [runs]"`
  * (default sizes 20000,60000,200000 and 3 runs).
  */
object CrawlScale {
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

    def word(k: Int) =
      hex(pmod(xxhash64(col("id") * lit(2654435761L) + lit(k)), lit(1048576)))

    def pages(n: Int) = {
      val para = (p: Int) => concat(
        lit(s"""<p class="body" data-i="$p">"""),
        concat_ws(" ", (1 to 30).map(k => word(p * 100 + k)): _*),
        lit(" &amp; the details&hellip;</p>"))
      spark.range(0L, n.toLong, 1L, 32).select(
        col("id").as("doc_id"),
        concat(
          lit("<!DOCTYPE html><html><head><title>"), word(99),
          lit("</title><script type=\"text/javascript\">var a = 1 < 2; " +
            "var s = \"</scr\" + \"ipt>\";</script>" +
            "<style>p{margin:0;color:#222}</style></head>" +
            "<body class=\"post\" data-x=\"a>b\"><h1>"), word(98),
          concat(lit("</h1>") +: (1 to 8).map(para) :+
            lit("<ul><li>one of the items</li><li>two more here</li></ul>" +
              "<!-- footer --></body></html>"): _*)).as("html"),
        concat(lit("HTTP://Host"), pmod(col("id"), lit(997)).cast("string"),
          lit(".Example.COM:80/section/"), word(7),
          lit("/page?utm_source=feed&b="), word(8), lit("&a="), word(9),
          lit("#top")).as("url"))
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    println("size      MB     floorT  extractT  rulesT  urlT   extract_MBps")
    for (n <- sizes) {
      val df = pages(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      val mb = df.select(sum(length(col("html")))).head().getLong(0) / 1e6
      val extracted = TF.htmlExtract(col("html"))
      def floor(): Unit = df.select(sum(length(col("html")))).head()
      def extract(): Unit = df.select(sum(length(extracted))).head()
      def rules(): Unit = df.select(
        sum(TF.gopherRules(extracted, 20).getField("n_words")),
        sum(TF.c4Rules(extracted).getField("n_kept_lines"))).head()
      def urls(): Unit =
        df.select(sum(length(TF.urlParts(col("url")).getField("normalized")))).head()
      floor(); extract(); rules(); urls() // warmup
      val tF = median((1 to runs).map(_ => timed(floor())))
      val tE = median((1 to runs).map(_ => timed(extract())))
      val tR = median((1 to runs).map(_ => timed(rules())))
      val tU = median((1 to runs).map(_ => timed(urls())))
      println(f"$n%-9d $mb%-6.1f $tF%-7.3f $tE%-9.3f $tR%-7.3f $tU%-6.3f ${mb / tE}%-8.1f")
      df.unpersist()
    }
    spark.stop()
  }
}
