package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the round-8 harness hardening: the testdata schema tripwire
  * (SchemaGuard), the EventTime type-branching reader contract, and
  * Verify's failure channel — a broken query must SURFACE in the
  * artifact, never vanish (the round-7 failure mode).
  */
class HarnessGuardSpec extends SparkSpec {
  import spark.implicits._

  test("SchemaGuard: pristine testdata reports no drift") {
    assert(SchemaGuard.report(spark, "/root/testdata/sf0.001").isEmpty)
  }

  test("SchemaGuard: a doctored table trips the wire with a named diff") {
    val dir = Files.createTempDirectory("graft_guard").toFile
    dir.deleteOnExit()
    // events with ts renamed away and a stranger column added — the two
    // drift shapes a regeneration produces (missing + extra); plus a
    // retyped documents.n_chars (accepted-type violation)
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumnRenamed("ts", "event_time")
      .write.parquet(s"$dir/events.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_chars", col("n_chars").cast("string"))
      .write.parquet(s"$dir/documents.parquet")
    val diffs = SchemaGuard.report(spark, dir.toString)
    assert(diffs.exists(d => d.contains("events.ts") && d.contains("MISSING")))
    assert(diffs.exists(d => d.contains("events.event_time") && d.contains("EXTRA")))
    assert(diffs.exists(d => d.contains("documents.n_chars") && d.contains("string")))
    // the other 8 tables are absent → reported, not skipped
    assert(diffs.exists(_.startsWith("lineitem:")))
  }

  test("EventTime.normalizeTs: all three accepted encodings agree; others refuse") {
    import org.apache.spark.sql.types._
    val micros = 1700000000123456L // a fixed instant, µs since epoch
    val fromLong = EventTime.normalizeTs(
      Seq(micros * 1000L).toDF("ts")) // ns long
    val fromNtz = EventTime.normalizeTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us"))
        .cast(TimestampNTZType).as("ts")))
    val fromTs = EventTime.normalizeTs(
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))
    for (df <- Seq(fromLong, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros(col("ts"))).as[Long].head() == micros)
    }
    val ex = intercept[IllegalArgumentException] {
      EventTime.normalizeTs(Seq("2024-01-01").toDF("ts"))
    }
    assert(ex.getMessage.contains("StringType"))
  }

  test("Verify failure channel: a throwing query surfaces in _errors.json") {
    val out = Files.createTempDirectory("graft_verify").toFile
    out.deleteOnExit()
    val queries = Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame](
      "q_ok" -> ((s, _) => { import s.implicits._; Seq(1, 2).toDF("x") }),
      "q_boom" -> ((_, _) => throw new IllegalStateException("deliberate \"break\"\n")))
    val failures = Verify.runQueries(spark, "/root/testdata/sf0.001",
      out.toString, queries)
    // the good query dumped, the bad one recorded with class + message
    assert(new java.io.File(out, "q_ok").exists())
    assert(failures.map(_._1) == Seq("q_boom"))
    val (cls, msg) = failures.head._2
    assert(cls == "java.lang.IllegalStateException" && msg.contains("deliberate"))
    // and the artifact JSON is valid + carries the record (quote/newline
    // in the message must be escaped, not corrupt the file)
    val json = Verify.errorsJson(failures)
    assert(json.contains("\"q_boom\"") && json.contains("IllegalStateException"))
    assert(json.contains("\\\"break\\\"") && json.contains("\\n"))
    // empty failure list still yields a parseable (empty) object
    assert(Verify.errorsJson(Nil) == "{}")
  }
}
