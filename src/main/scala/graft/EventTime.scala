package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalization of the `events.ts` column to a session-UTC microsecond
  * [[TimestampType]], whatever physical type the parquet scan produced.
  *
  * The driver's generated `events.parquet` has changed encoding across
  * regenerations: originally TIMESTAMP(NANOS), which Spark only reads as
  * a nanosecond long (under `spark.sql.legacy.parquet.nanosAsLong`);
  * currently `timestamp[us]` with isAdjustedToUTC=false, which Spark
  * reads as TIMESTAMP_NTZ. Hard-coding either shape breaks on the other
  * — round 7 lost six queries to exactly that — so both batch and
  * streaming readers branch on the SCANNED type here:
  *
  *   - ns long        → integer `div 1000` then `timestamp_micros`
  *                      (integer div keeps full precision: ns since
  *                      epoch exceeds a double's 53-bit mantissa; the
  *                      truncation matches what DuckDB does on read);
  *   - TIMESTAMP_NTZ  → cast to TimestampType. The session timezone is
  *                      pinned to UTC ([[GraftSession]]/Verify/Bench),
  *                      so the cast reinterprets the same microsecond
  *                      value — byte-identical to what the ns-long path
  *                      produced from the old files;
  *   - TIMESTAMP      → already the target type, pass through.
  *
  * Anything else fails loudly with the observed type, so the NEXT
  * regeneration surfaces as a one-line diagnosis instead of six
  * downstream AnalysisExceptions.
  */
object EventTime {
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.`$colName` scanned as unsupported type $other — expected " +
          "ns LongType, TIMESTAMP_NTZ, or TIMESTAMP (testdata regenerated " +
          "with a new encoding? extend EventTime.normalizeTs)")
    }
}
