package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (group, doc, chunk_no, tokens)
  private def chunks(rows: (String, Long, Int, Int)*) =
    rows.toDF("lang", "doc_id", "chunk_no", "n_tok")

  test("greedy next-fit: bins are consecutive budget-sized spans") {
    val df = chunks(
      ("en", 1L, 0, 40), ("en", 1L, 1, 40), ("en", 2L, 0, 40),
      ("en", 3L, 0, 40), ("de", 1L, 0, 90))
    val out = Packing.packChunks(df, Seq("lang"),
      Seq(col("doc_id"), col("chunk_no")), "n_tok", budget = 100)
      .select("lang", "doc_id", "chunk_no", "bin")
      .as[(String, Long, Int, Long)].collect().toSet
    // en cumulative-before: 0, 40, 80, 120 → bins 0,0,0,1
    assert(out == Set(
      ("en", 1L, 0, 0L), ("en", 1L, 1, 0L), ("en", 2L, 0, 0L),
      ("en", 3L, 0, 1L), ("de", 1L, 0, 0L)))
  }

  test("packing conserves chunks and tokens; bins never exceed budget + one chunk") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 500).map(i =>
      ("l" + (i % 3), i.toLong, 0, 1 + rnd.nextInt(50))).toDF("lang", "doc_id", "chunk_no", "n_tok")
    val packed = Packing.packChunks(df, Seq("lang"),
      Seq(col("doc_id"), col("chunk_no")), "n_tok", budget = 128)
    val stats = Packing.binStats(packed, Seq("lang"), "n_tok")
    val (chunkSum, tokSum) = stats.agg(sum("n_chunks"), sum("n_tokens"))
      .as[(Long, Long)].collect().head
    val total = df.agg(count(lit(1)), sum("n_tok")).as[(Long, Long)].collect().head
    assert((chunkSum, tokSum) == total) // nothing lost, nothing duplicated
    val maxBin = stats.agg(max("n_tokens")).as[Long].collect().head
    assert(maxBin <= 128 + 49, s"bin overflow: $maxBin") // budget + maxChunk - 1
    // every bin except possibly the last per group holds at least
    // budget - (maxChunk - 1) tokens (a chunk overflowing the previous
    // span eats into this bin's 128-token span)
    val lastBins = stats.groupBy("lang").agg(max("bin").as("lb"))
    val nonLast = stats.join(lastBins, Seq("lang")).filter(col("bin") =!= col("lb"))
    assert(nonLast.filter(col("n_tokens") < 128 - 49).count() == 0)
  }

  test("deterministic: same input, same bins, regardless of partitioning") {
    val df = (0 until 200).map(i => ("en", i.toLong, 0, 10 + i % 30))
      .toDF("lang", "doc_id", "chunk_no", "n_tok")
    def run(p: Int) = Packing.packChunks(df.repartition(p), Seq("lang"),
      Seq(col("doc_id"), col("chunk_no")), "n_tok", budget = 100)
      .select("doc_id", "bin").as[(Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }
}
