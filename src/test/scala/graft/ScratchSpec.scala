package graft

import org.apache.spark.sql.functions._

/** Two-sfDir scratch hygiene (round 10 directive).
  *
  * The per-process scratch dirs are REUSED across invocations (the
  * bench runs every query several times), and the writers overwrite
  * per-FILE — so a JVM that serves a LARGER corpus and then a smaller
  * one would leave the larger corpus's extra blobs on disk for
  * directory-listing consumers (q_binary_ingest's `*.bin` read-back)
  * unless `scratch()` wipes on acquire. This spec runs the real query
  * against sf0.01 (more documents) and then sf0.001 (fewer): if the
  * wipe regressed, the second run's read-back would count the stale
  * sf0.01 blobs too.
  */
class ScratchSpec extends SparkSpec {
  test("q_binary_ingest across two sfDirs never reads stale blobs") {
    val run = SparkEntry.queries("q_binary_ingest")
    val big = "/root/testdata/sf0.01"
    val small = "/root/testdata/sf0.001"
    val nBig = run(spark, big).count()
    val nSmall = run(spark, small).count()
    val docsSmall = spark.read.parquet(s"$small/documents.parquet").count()
    assert(nBig > nSmall, "fixture assumption: sf0.01 has more documents")
    assert(nSmall === docsSmall,
      s"read-back after switching corpora returned $nSmall rows for a " +
        s"$docsSmall-doc corpus — stale blobs from the previous sfDir leaked")
  }
}
