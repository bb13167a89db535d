package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Startup tripwire for the driver's testdata schemas.
  *
  * Round 7 lost six queries because `/root/testdata` was silently
  * regenerated with a new `events.ts` encoding and the first symptom was
  * an AnalysisException four plans deep. This guard converts the next
  * silent regeneration into a one-line diagnosis: [[Verify]] and
  * [[Bench]] call [[report]] at startup and print every deviation from
  * the expected per-table column/type inventory, loudly, to stderr.
  *
  * Deviations are reported, NOT fatal: the reader layer may well handle
  * the drift (EventTime.normalizeTs accepts three `ts` encodings —
  * columns with several accepted types are listed with alternatives
  * below), and a hard abort on a benign change would zero a whole
  * round's artifacts. The contract is "never silent", not "never run".
  */
object SchemaGuard {

  /** Expected columns per table, in order, with the set of accepted
    * Spark type names (`DataType.simpleString`). Multiple alternatives
    * where the reader layer is deliberately encoding-tolerant. */
  val expected: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp_ntz", "timestamp", "date"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp_ntz", "timestamp", "date")),
    "events" -> Seq("event_id" -> Set("bigint"),
      // the three encodings EventTime.normalizeTs accepts
      "ts" -> Set("bigint", "timestamp_ntz", "timestamp"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** Footer-only scan of each expected table under `sfDir`; returns one
    * human-readable line per deviation (missing table, missing column,
    * unexpected type, extra column). Empty = all as expected. */
  def report(spark: SparkSession, sfDir: String): Seq[String] =
    expected.flatMap { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      val actual =
        try Right(spark.read.parquet(path).schema)
        catch { case e: Exception => Left(
          s"$table: UNREADABLE at $path (${e.getClass.getSimpleName}: ${e.getMessage})")
        }
      actual match {
        case Left(msg) => Seq(msg)
        case Right(schema) =>
          val byName = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
          val missing = cols.collect { case (c, _) if !byName.contains(c) =>
            s"$table.$c: MISSING (file has: ${schema.fieldNames.mkString(", ")})" }
          val drifted = cols.collect {
            case (c, accepted) if byName.contains(c) && !accepted(byName(c)) =>
              s"$table.$c: type ${byName(c)} not in accepted {${accepted.mkString(", ")}}" }
          val known = cols.map(_._1).toSet
          val extra = schema.fieldNames.filterNot(known).map(c =>
            s"$table.$c: EXTRA column (type ${byName(c)}) — new driver field?")
          missing ++ drifted ++ extra
      }
    }

  /** Print the report loudly to stderr; returns the deviations so
    * callers (Bench's JSON line) reuse one scan and one report shape. */
  def warn(spark: SparkSession, sfDir: String): Seq[String] = {
    val diffs = report(spark, sfDir)
    if (diffs.nonEmpty) {
      System.err.println(
        s"[schema-guard] TESTDATA SCHEMA DRIFT at $sfDir — ${diffs.size} deviation(s); " +
          "readers may or may not tolerate this (see SchemaGuard.expected):")
      diffs.foreach(d => System.err.println(s"[schema-guard]   $d"))
    }
    diffs
  }
}
