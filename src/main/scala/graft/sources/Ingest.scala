package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingest tier for corpus interchange formats — the read counterpart of
  * [[Sinks.writeJsonl]]. A 100 TB crawl drop always contains malformed
  * lines; the contract here is that bad input NEVER kills the job and
  * NEVER silently disappears: corrupt lines are quarantined into a
  * side channel the caller can count, sample, and alert on.
  */
object Ingest {

  /** Read JSON-Lines shards with an EXPLICIT schema (never inferred —
    * schema inference is a full extra pass over 100 TB and makes the
    * pipeline's types depend on the data). Lines are read as text and
    * parsed with `from_json`, NOT `spark.read.json`: the raw-JSON
    * source forbids plans that reference only its internal corrupt
    * column (its documented workaround is caching the parsed frame —
    * a non-starter at corpus scale), while the text+from_json form
    * streams through one scan with no such restriction and keeps the
    * verbatim line available for the quarantine channel. Gzip shards
    * decompress transparently; blank lines are ignored.
    *
    * Returns (good, bad): `good` carries the schema columns for rows
    * that parsed; `bad` carries the verbatim malformed line per row in
    * `corruptCol`. Both derive from the same scan definition.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                corruptCol: String = "_corrupt_record")
      : (DataFrame, DataFrame) =
    parseLines(spark.read.text(path), schema, corruptCol)

  /** Streaming twin of [[readJsonl]] for continuous corpus ingest: new
    * shards landing under `path` are parsed incrementally with the same
    * good/quarantine split (each side is its own `writeStream`; the
    * text source tracks processed files, so the two sinks each see
    * every line exactly once per their own checkpoints).
    */
  def readJsonlStream(spark: SparkSession, path: String, schema: StructType,
                      corruptCol: String = "_corrupt_record")
      : (DataFrame, DataFrame) =
    parseLines(spark.readStream.text(path), schema, corruptCol)

  private def parseLines(lines: DataFrame, schema: StructType,
                         corruptCol: String): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already define $corruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(corruptCol, StringType, nullable = true))
    val parsed = lines
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("__j"))
    val corrupt = col("__j").isNull || col(s"__j.`$corruptCol`").isNotNull
    val good = parsed.filter(!corrupt)
      .select(schema.fieldNames.map(n => col(s"__j.`$n`").as(n)): _*)
    val bad = parsed.filter(corrupt).select(col("value").as(corruptCol))
    (good, bad)
  }
}
