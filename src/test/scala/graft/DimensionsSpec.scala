package graft

import graft.operators.Dimensions
import java.sql.Date
import org.apache.spark.sql.functions._

class DimensionsSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, untouched rows pass, new keys append") {
    val existing = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val updates = Seq((2L, "b2", 25.0), (9L, "new", 90.0))
      .toDF("k", "name", "bal")
    val out = Dimensions.upsert(existing, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 25.0),
      (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  private def d(s: String) = Date.valueOf(s)

  private val dim = Seq(
    // key 1: one closed version + one open version
    (1L, "old-red", Some(d("1980-01-01")), Some(d("1990-01-01"))),
    (1L, "red", Some(d("1990-01-01")), None),
    (2L, "blue", Some(d("1990-01-01")), None),
    (3L, "green", Some(d("1990-01-01")), None),
    (5L, null.asInstanceOf[String], Some(d("1990-01-01")), None) // null attr
  ).toDF("k", "color", "valid_from", "valid_to")

  test("scd2Apply: change closes+reopens, no-op leaves one version, new key opens") {
    val changes = Seq(
      (1L, "crimson", d("2020-06-01")), // changed -> close + open
      (2L, "blue", d("2020-06-01")),    // identical -> no-op
      (4L, "black", d("2020-06-01"))    // unseen key -> first version
    ).toDF("k", "color", "eff")
    val out = Dimensions.scd2Apply(dim, changes, Seq("k"), Seq("color"),
        "valid_from", "valid_to", "eff")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString))).toSet
    assert(out == Set(
      (1L, Some("old-red"), "1980-01-01", Some("1990-01-01")), // history verbatim
      (1L, Some("red"), "1990-01-01", Some("2020-06-01")),     // closed now
      (1L, Some("crimson"), "2020-06-01", None),               // reopened
      (2L, Some("blue"), "1990-01-01", None),                  // no-op
      (3L, Some("green"), "1990-01-01", None),                 // untouched
      (4L, Some("black"), "2020-06-01", None),                 // new key
      (5L, None, "1990-01-01", None)))                         // untouched null
  }

  test("scd2Apply: null-safe attribute compare in both directions") {
    val changes = Seq(
      (5L, Some("violet"), d("2020-06-01")), // null -> value: a change
      (3L, None, d("2020-06-01"))            // value -> null: a change
    ).toDF("k", "color", "eff")
      .select(col("k"), col("color"), col("eff"))
    val out = Dimensions.scd2Apply(dim, changes, Seq("k"), Seq("color"),
        "valid_from", "valid_to", "eff")
      .filter(col("k").isin(3L, 5L))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getDate(3)).map(_.toString))).toSet
    assert(out == Set(
      (5L, None, Some("2020-06-01")), (5L, Some("violet"), None),
      (3L, Some("green"), Some("2020-06-01")), (3L, None, None)))
  }

  test("scd2Apply rejects two changes for one key in a batch") {
    val changes = Seq((1L, "x", d("2020-01-01")), (1L, "y", d("2020-02-01")))
      .toDF("k", "color", "eff")
    val e = intercept[IllegalArgumentException] {
      Dimensions.scd2Apply(dim, changes, Seq("k"), Seq("color"),
        "valid_from", "valid_to", "eff")
    }
    assert(e.getMessage.contains("multiple changes"))
  }

  test("scd2Apply: open row with NULL valid_from survives (presence is a marker, not a data column)") {
    val nullFrom = Seq((8L, "grey", None: Option[Date], None: Option[Date]))
      .toDF("k", "color", "valid_from", "valid_to")
    val changes = Seq((8L, "silver", d("2020-06-01"))).toDF("k", "color", "eff")
    val out = Dimensions.scd2Apply(nullFrom, changes, Seq("k"), Seq("color"),
        "valid_from", "valid_to", "eff")
      .collect().map(r => (Option(r.getString(1)),
        Option(r.getDate(2)).map(_.toString),
        Option(r.getDate(3)).map(_.toString))).toSet
    // the NULL-from open row CLOSES (not vanishes); the change opens
    assert(out == Set(
      (Some("grey"), None, Some("2020-06-01")),
      (Some("silver"), Some("2020-06-01"), None)))
  }

  test("scd2Apply rejects a NULL effective value instead of no-op'ing it") {
    val changes = Seq((1L, "x", null.asInstanceOf[Date])).toDF("k", "color", "eff")
    val e = intercept[IllegalArgumentException] {
      Dimensions.scd2Apply(dim, changes, Seq("k"), Seq("color"),
        "valid_from", "valid_to", "eff")
    }
    assert(e.getMessage.contains("NULL effective"))
  }

  test("scd2Apply keeps the dimension's date types when eff is a timestamp") {
    import java.sql.Timestamp
    val changes = Seq((1L, "crimson", Timestamp.valueOf("2020-06-01 00:00:00")))
      .toDF("k", "color", "eff")
    val out = Dimensions.scd2Apply(dim, changes, Seq("k"), Seq("color"),
      "valid_from", "valid_to", "eff")
    // output schema matches the input dimension (DATE, not widened)
    assert(out.schema("valid_from").dataType == dim.schema("valid_from").dataType)
    assert(out.schema("valid_to").dataType == dim.schema("valid_to").dataType)
  }

  test("upsert rejects duplicate keys within the update batch") {
    val existing = Seq((1L, "a", 10.0)).toDF("k", "name", "bal")
    val updates = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k", "name", "bal")
    val e = intercept[IllegalArgumentException] {
      Dimensions.upsert(existing, updates, Seq("k"))
    }
    assert(e.getMessage.contains("multiple update rows"))
  }
}
