package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{Bpe, Importance}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The round-8 text kernels are plain codegen expressions, so they run
  * unchanged inside Structured Streaming — this pins batch/stream
  * parity for the pipeline a streaming ingest would actually run:
  * blocklist screening + BPE encode + importance bucketing per
  * micro-batch document.
  */
class StreamingKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("blocklist + BPE encode + importance bucket: stream equals batch") {
    val docs = Seq(
      (1L, "aaab spam aaab ab"),
      (2L, "ab clean ab aaab"),
      (3L, "spam spam"))
    // merges and buckets are driver-built (as a streaming job would:
    // train offline, broadcast into the 24/7 ingest query)
    val merges = Bpe.train(docs.toDF("doc_id", "text"), "text", 4)
    def pipeline(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TF.multiMatch(col("text"), Seq("spam", "junk")).as("blocked"),
      Bpe.tokens(col("text"), merges).as("toks"),
      Importance.bucket(col("text"), 64).as("b"))

    val batch = pipeline(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet

    val input = MemoryStream[(Long, String)](spark, numPartitions = 1)
    val q = pipeline(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("kernels_stream")
      .outputMode("append").start()
    input.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kernels_stream").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // and the kernels did real work: doc 3 hits the blocklist, tokens flow
    val byId = batch.groupBy(_.head).map { case (k, v) => k -> v.head }
    assert(byId(3L)(1).asInstanceOf[scala.collection.Seq[String]].contains("spam"))
    assert(byId(2L)(1).asInstanceOf[scala.collection.Seq[String]].isEmpty)
    assert(byId(1L)(2).asInstanceOf[scala.collection.Seq[String]].nonEmpty)
  }
}
