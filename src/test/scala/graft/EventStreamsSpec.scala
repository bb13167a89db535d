package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.SessionEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

object EventStreamsSpec {
  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
  final case class Click(user_id: Long, click_ts: Timestamp, click_id: Long)
  final case class View(user_id: Long, view_ts: Timestamp, view_id: Long)
  final case class Vec(vec_id: Long, vec: Seq[Double])
}

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly counts equal the batch aggregation (parity pin)") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.hourlyCounts(EventStreams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly")
      .select("hour", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet

    val batch = Queries.all.find(_.name == "q_events_hourly").get
      .run(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("sessionize: gap splits sessions, event-time timeout emits them") {
    val input = MemoryStream[SessionEvent](spark, numPartitions = 1)
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 60000,
      watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    def ts(min: Int): Timestamp = new Timestamp(3600000L + min * 60000L)
    // user 1: two bursts 5 min apart (gap 1 min → two sessions)
    input.addData(
      SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(1), 2.0),
      SessionEvent(1L, ts(6), 3.0),
      SessionEvent(2L, ts(0), 5.0))
    q.processAllAvailable()
    // advance the watermark far past everything → all sessions time out
    input.addData(SessionEvent(99L, ts(600), 0.0))
    q.processAllAvailable()
    input.addData(SessionEvent(98L, ts(1200), 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions")
      .filter(col("user_id").isin(1L, 2L))
      .select("user_id", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 5.0)))
  }

  test("attribution: stream-stream interval join matches across batches, bounds the window") {
    import EventStreamsSpec.Click
    import EventStreamsSpec.View
    val clicks = MemoryStream[Click](spark, numPartitions = 1)
    val views = MemoryStream[View](spark, numPartitions = 1)
    val joined = EventStreams.attribution(
      clicks.toDF().withWatermark("click_ts", "1 hour"),
      views.toDF().withWatermark("view_ts", "1 hour"),
      "user_id", "click_ts", "view_ts", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()

    def ts(min: Int): Timestamp = new Timestamp(3600000L + min * 60000L)
    // views arrive in an EARLIER batch than the clicks they attribute
    views.addData(View(1L, ts(0), 100L), View(1L, ts(30), 101L),
      View(2L, ts(0), 102L))
    q.processAllAvailable()
    clicks.addData(Click(1L, ts(5), 200L),  // 5 min after view 100 → match
      Click(1L, ts(45), 201L),              // 15 min after view 101 → NO match
      Click(2L, ts(9), 202L))               // 9 min after view 102 → match
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attrib").select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((200L, 100L), (202L, 102L)))
  }

  test("attribution parity: the same operator code, batch vs replayed stream") {
    val dir = "/root/testdata/sf0.001"
    val ev = EventStreams.readEvents(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "48 hours")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
      .withWatermark("view_ts", "48 hours")
    val q = EventStreams.attribution(clicks, views,
        "user_id", "click_ts", "view_ts", "24 hours")
      .select("click_id", "view_id")
      .writeStream.format("memory").queryName("attrib_parity")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("attrib_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Queries.all.find(_.name == "q_event_attribution").get
      .run(spark, dir)
      .select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("attribution rejects a malformed lookback instead of splicing it into SQL") {
    val a = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "ats")
    val c = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00")))
      .toDF("user_id", "cts")
    // "1.5 hours" sits here deliberately: Spark's own interval grammar
    // allows fractions only in seconds, so it was never valid input
    for (bad <- Seq("7 fortnights", "1; DROP TABLE x", "1 hour) OR (true", "",
        "1 hour + current_timestamp()", "1.5 hours")) {
      val e = intercept[IllegalArgumentException] {
        EventStreams.attribution(a, c, "user_id", "ats", "cts", bad)
      }
      assert(e.getMessage.contains("malformed lookback"), s"for: $bad")
    }
    // multi-term and case-insensitive forms still pass
    assert(EventStreams.attribution(a, c, "user_id", "ats", "cts",
      "1 Day 12 hours").count() == 1)
    // every form Spark's own interval parser accepts must stay valid —
    // the round-7 shape whitelist silently rejected month/year units,
    // fractional seconds, and the quoted form; the parser-backed build
    // must not
    for (ok <- Seq("3 months", "1 year", "3600.5 seconds", "90 minutes", "'1 hour'"))
      assert(EventStreams.attribution(a, c, "user_id", "ats", "cts", ok)
        .count() == 1, s"for: $ok")
    // a net-NEGATIVE lookback parses fine but would make the window
    // empty on every row forever — reject it loudly; a mixed form with
    // net-positive duration stays valid
    for (neg <- Seq("-30 minutes", "-1 year")) {
      val e = intercept[IllegalArgumentException] {
        EventStreams.attribution(a, c, "user_id", "ats", "cts", neg)
      }
      assert(e.getMessage.contains("negative lookback"), s"for: $neg")
    }
    assert(EventStreams.attribution(a, c, "user_id", "ats", "cts",
      "2 days -12 hours").count() == 1)
  }

  test("streaming ingest lands deduped docs through a checkpointed parquet sink") {
    import EventStreamsSpec.Doc
    val input = MemoryStream[Doc](spark, numPartitions = 1)
    val base = java.nio.file.Files.createTempDirectory("ingest").toString
    val deduped = EventStreams.dedupDocStream(
      input.toDF(), "text", "ts", watermark = "1 hour")
    // the production landing shape: append-mode parquet + checkpoint —
    // exactly-once across restarts comes from the checkpoint's WAL
    val q = deduped.writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    def ts(min: Int): Timestamp = new Timestamp(3600000L + min * 60000L)
    input.addData(Doc(1L, ts(0), "alpha beta"), Doc(2L, ts(1), "gamma delta"))
    q.processAllAvailable()
    input.addData(Doc(3L, ts(2), "alpha  BETA"), // dup of 1 modulo ws/case
      Doc(4L, ts(3), "epsilon zeta"))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == Set(1L, 2L, 4L))
    // the checkpoint directory is real (offsets + commits written)
    assert(new java.io.File(s"$base/ckpt/commits").listFiles().nonEmpty)
  }

  test("streaming embedding screen: micro-batched output equals the batch " +
      "operator over the union (per-row independence vs the static index)") {
    import graft.operators.{Dedup, Similarity}
    import EventStreamsSpec.Vec
    def v(base: Array[Double], eps: Double) =
      base.zipWithIndex.map { case (x, i) => x + (if (i == 0) eps else 0.0) }.toSeq
    val c1 = Array(10.0, 0.0, 0.0, 0.0)
    val c2 = Array(0.0, 10.0, 0.0, 0.0)
    val hist = (1 to 10).map(i =>
      (i.toLong, v(if (i % 2 == 0) c1 else c2, i * 0.01))).toDF("vec_id", "vec")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_stream").toString
    Similarity.buildIvfPqIndex(hist, "vec", "vec_id", dir,
      nCentroids = 2, pqM = 2, pqCodes = 4, pqIters = 2)
    val arriving = Seq(
      Vec(101L, v(c1, 0.005)), Vec(102L, v(c2, 0.005)),
      Vec(103L, Seq(0.0, 0.0, 7.0, 0.0)))
    val input = MemoryStream[Vec](spark, numPartitions = 1)
    val landed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val epochs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = EventStreams.screenEmbeddingStream(input.toDF(), dir, "vec",
        "vec_id", threshold = 0.9, nProbes = 2, rerank = 10) { (out, epoch) =>
      landed.synchronized {
        epochs += epoch
        landed ++= out.select("new_id", "hist_id", "cosine")
          .as[(Long, Long, Double)].collect()
      }
    }.start()
    input.addData(arriving(0)) // the screen fires per micro-batch...
    q.processAllAvailable()
    input.addData(arriving(1), arriving(2))
    q.processAllAvailable()
    q.stop()
    assert(epochs.size == 2) // ...one probe per trigger, not one per row
    val batch = Dedup.incrementalEmbeddingPq(arriving.toDF(), dir, "vec",
        "vec_id", threshold = 0.9, nProbes = 2, rerank = 10)
      .select("new_id", "hist_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(landed.toSet == batch && batch.nonEmpty)
  }

  test("streaming dedup drops same-content docs across batches, keeps distinct") {
    import EventStreamsSpec.Doc
    val input = MemoryStream[Doc](spark, numPartitions = 1)
    val deduped = EventStreams.dedupDocStream(input.toDF(), "text", "ts",
      watermark = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    def ts(min: Int): Timestamp = new Timestamp(3600000L + min * 60000L)
    input.addData(
      Doc(1L, ts(0), "the quick brown fox"),
      Doc(2L, ts(1), "The  quick brown FOX"), // same normalized content
      Doc(3L, ts(2), "something else entirely"))
    q.processAllAvailable()
    // a later batch re-delivers the same content within the horizon
    input.addData(Doc(4L, ts(10), "the quick brown fox"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_stream").select("doc_id")
      .as[Long].collect().toSet
    // exactly one survivor per distinct normalized content; the engine
    // keeps the first arrival (doc 1 beats 2 in-batch and 4 cross-batch)
    assert(kept == Set(1L, 3L), s"kept $kept")
  }

  test("collect_smallest works inside a streaming aggregation (state-store round trip)") {
    // the bounded aggregate must survive the streaming state store's
    // serialize/merge cycle across triggers — a running "k best scores
    // per key" is the streaming shape it exists for
    val input = MemoryStream[(String, Long)](spark, numPartitions = 1)
    val agg = input.toDF().toDF("k", "v")
      .groupBy("k")
      .agg(graft.operators.Dedup.collectSmallest(col("v"), 3).as("best"))
    val q = agg.writeStream.format("memory").queryName("stream_topk")
      .outputMode("complete").start()
    input.addData(("a", 5L), ("a", 9L), ("b", 2L))
    q.processAllAvailable()
    input.addData(("a", 1L), ("a", 7L), ("a", 3L)) // second trigger merges state
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_topk")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out == Map("a" -> Seq(1L, 3L, 5L), "b" -> Seq(2L)))
  }

  test("sessionize: in-watermark out-of-order event bridges two open sessions") {
    val input = MemoryStream[SessionEvent](spark, numPartitions = 1)
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 60000,
      watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()

    def ts(sec: Int): Timestamp = new Timestamp(7200000L + sec * 1000L)
    // batch 1: two bursts 100 s apart (gap 60 s → provisionally split)
    input.addData(SessionEvent(7L, ts(0), 1.0), SessionEvent(7L, ts(100), 2.0))
    q.processAllAvailable()
    // batch 2: the bridging event arrives out of order but in-watermark
    input.addData(SessionEvent(7L, ts(50), 4.0))
    q.processAllAvailable()
    // advance the watermark far past everything
    input.addData(SessionEvent(99L, ts(90000), 0.0))
    q.processAllAvailable()
    input.addData(SessionEvent(98L, ts(180000), 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_ooo")
      .filter(col("user_id") === 7L)
      .select("n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // one merged session [0s..100s] with all three events — not a split
    // pair with a corrupted start
    assert(out == Set((3L, 7.0)))
  }
}
