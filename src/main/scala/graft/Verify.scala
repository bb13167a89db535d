package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure contract (hardened after round 7, where six broken queries
  * silently VANISHED from the correctness artifact because the error
  * only went to stderr): a query that throws is recorded in
  * `outDir/_errors.json` as `{name: {class, message}}`. The file is
  * written even when empty, so its presence is affirmative evidence the
  * failure channel ran — absence of a query from the dump can never
  * again masquerade as "not applicable".
  */
object Verify {

  /** Run `queries` against `sfDir`, dumping each result under `outDir`;
    * returns the per-query failures. Extracted from `main` so the
    * failure channel itself is unit-testable (VerifySpec deliberately
    * breaks a query and asserts it surfaces). */
  def runQueries(spark: SparkSession, sfDir: String, outDir: String,
                 queries: Map[String, (SparkSession, String) => DataFrame])
      : Seq[(String, (String, String))] = {
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = (e.getClass.getName, Option(e.getMessage).getOrElse("").take(2000))
      }
    }
    failures.toSeq
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def errorsJson(failures: Seq[(String, (String, String))]): String =
    failures
      .map { case (k, (cls, msg)) =>
        s"${jstr(k)}: {${jstr("class")}: ${jstr(cls)}, ${jstr("message")}: ${jstr(msg)}}" }
      .mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query subset] — the subset form
    // is the local iteration loop (re-verify just the queries a change
    // touches); the driver always calls the 2-arg full-surface form
    val (sfDir, outDir) = (args(0), args(1))
    val subset: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // testdata-drift tripwire — round 7's regenerated events.parquet
    // surfaced as six AnalysisExceptions instead of one schema line
    SchemaGuard.warn(spark, sfDir)
    val selected = subset match {
      case Some(names) =>
        val missing = names -- SparkEntry.queries.keySet
        require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
        SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    val failures = runQueries(spark, sfDir, outDir, selected)
    val json = SparkEntry.oracleSql.view.filterKeys(selected.keySet).toMap
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errorsJson(failures))
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} quer${if (failures.size == 1) "y" else "ies"} FAILED: ${failures.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
