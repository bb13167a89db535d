package graft

import org.apache.spark.sql.functions._

/** Two-sfDir scratch hygiene (round 10 directive; fixture-proofed in
  * round 11 after the r10 version's size assumption — "sf0.01 has more
  * documents than sf0.001" — turned out to be false on regenerated
  * testdata, leaving the property unexercised).
  *
  * The per-process scratch dirs are REUSED across invocations (the
  * bench runs every query several times), and the writers overwrite
  * per-FILE — so a JVM that serves a LARGER corpus and then a smaller
  * one would leave the larger corpus's extra blobs on disk for
  * directory-listing consumers (q_binary_ingest's `*.bin` read-back)
  * unless `scratch()` wipes on acquire.
  *
  * To make the size relationship immune to driver regeneration, the
  * two corpora are SYNTHESIZED here: prefix subsets (40 and 12 docs,
  * ordered by doc_id) of the real sf0.001 documents table, written to
  * two temp sfDirs. The big set strictly contains the small one, so a
  * wipe regression makes the second read-back count 40 blobs, not 12.
  * The leak property is asserted FIRST; the by-construction size check
  * comes after and can never mask it.
  */
class ScratchSpec extends SparkSpec {
  test("q_binary_ingest across two sfDirs never reads stale blobs") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft_scratchspec_")
    def corpus(name: String, nDocs: Int): String = {
      val d = root.resolve(name).toString
      src.orderBy("doc_id").limit(nDocs)
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    try {
      val big = corpus("big", 40)
      val small = corpus("small", 12)
      val run = SparkEntry.queries("q_binary_ingest")
      val nBig = run(spark, big).count()
      val nSmall = run(spark, small).count()
      assert(nSmall === 12L,
        s"read-back after switching corpora returned $nSmall rows for a " +
          "12-doc corpus — stale blobs from the previous sfDir leaked")
      assert(nBig === 40L, s"big-corpus read-back returned $nBig, not 40")
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete()
      }
      rm(root.toFile)
    }
  }
}
