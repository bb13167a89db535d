package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "some media payload one"),
    (2L, "some media payload two"),
    (3L, "")
  ).toDF("id", "txt").withColumn("blob", encode(col("txt"), "UTF-8"))

  test("featurize: schema, byte counts, fixed dim, deterministic") {
    val out = Multimodal.featurize(media, "id", "blob", dim = 4)
    assert(out.columns.toSeq == Seq("media_id", "n_bytes", "feature"))
    val rows = out.select("media_id", "n_bytes")
      .as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 22L, 2L -> 22L, 3L -> 0L))
    val f1 = out.filter(col("media_id") === 1).select("feature").as[Seq[Float]].collect().head
    val f2 = Multimodal.featurize(media, "id", "blob", dim = 4)
      .filter(col("media_id") === 1).select("feature").as[Seq[Float]].collect().head
    assert(f1.size == 4 && f1 == f2)
    assert(f1.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("different payloads give different stub features") {
    val out = Multimodal.featurize(media, "id", "blob", dim = 8)
      .select("media_id", "feature").as[(Long, Seq[Float])].collect().toMap
    assert(out(1L) != out(2L))
  }

  test("sampleFrames keeps every stride-th fixed-size chunk") {
    val blob = Array.tabulate[Byte](300)(i => (i % 127).toByte)
    val df = Seq((7L, blob)).toDF("id", "blob")
    val frames = Multimodal.sampleFrames(df, "id", "blob", frameBytes = 64, stride = 2)
      .select("frame_no").as[Int].collect().toSeq.sorted
    // 300 bytes -> chunks 0..4, strided -> 0, 2, 4
    assert(frames == Seq(0, 2, 4))
  }

  test("sampleFrames: a null media id passes through instead of killing the task") {
    val media = Seq((Some(1L), "abcdefgh"), (None, "ijklmnop")).toDF("id", "txt")
      .withColumn("blob", encode(col("txt"), "UTF-8"))
    val out = Multimodal.sampleFrames(media, "id", "blob", frameBytes = 4, stride = 1)
    assert(out.count() == 4) // two 4-byte frames per blob
    assert(out.filter(col("media_id").isNull).count() == 2)
  }
}
