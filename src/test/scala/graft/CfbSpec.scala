package graft

import graft.functions.CfbKernels
import org.scalatest.funsuite.AnyFunSuite

/** [[CfbKernels]] — OLE2/Compound File walk + legacy .doc text.
  * Fixtures are REAL v3 containers from the in-repo writer (proper
  * header/FAT/directory/miniFAT), covering both the mini-stream and
  * FAT-stream paths; fail-closed fuzz pins truncation/corruption.
  */
class CfbSpec extends AnyFunSuite {

  private def entriesOf(b: Array[Byte]): Seq[(String, Int, Long)] = {
    val a = CfbKernels.entries(b)
    if (a == null) null
    else (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2))
    }
  }

  test("build/walk roundtrip: small streams via the miniFAT, large " +
    "via the FAT, names UTF-16LE") {
    val small = "small payload".getBytes("UTF-8")
    val big = Array.tabulate[Byte](9000)(i => (i * 31).toByte)
    val blob = CfbKernels.build(Seq(
      "TinyStream" -> small, "BigStream" -> big, "Wörk Βook" -> small))
    val es = entriesOf(blob)
    assert(es != null)
    assert(es.exists(e => e._1 == "Root Entry" && e._2 == 5))
    assert(es.exists(e => e._1 == "TinyStream" && e._2 == 2 &&
      e._3 == small.length))
    assert(es.exists(e => e._1 == "BigStream" && e._2 == 2 &&
      e._3 == big.length))
    assert(es.exists(_._1 == "Wörk Βook")) // non-ASCII UTF-16LE names
  }

  test("docText: 1252 and UTF-16 text forms decode; paragraph marks " +
    "normalize") {
    val t1 = CfbKernels.docText(
      CfbKernels.buildDoc("hello legacy word\rsecond para", unicode = false))
    assert(t1 != null && t1.toString == "hello legacy word\nsecond para")
    val t2 = CfbKernels.docText(
      CfbKernels.buildDoc("unicode naïve — 日本語 text here", unicode = true))
    assert(t2 != null && t2.toString == "unicode naïve — 日本語 text here")
    // extra streams alongside (the real .doc shape: 1Table etc.)
    val withTable = CfbKernels.buildDoc("with table stream", unicode = false,
      extra = Seq("1Table" -> Array.fill[Byte](64)(7)))
    assert(CfbKernels.docText(withTable).toString == "with table stream")
  }

  test("docText refuses what it cannot decode honestly: complex, " +
    "encrypted, no WordDocument, bad FIB") {
    assert(CfbKernels.docText(
      CfbKernels.buildDoc("x", unicode = false, complex = true)) == null)
    assert(CfbKernels.docText(
      CfbKernels.buildDoc("x", unicode = false, encrypted = true)) == null)
    assert(CfbKernels.docText(
      CfbKernels.build(Seq("NotWord" -> "abc".getBytes))) == null)
    val badFib = CfbKernels.build(Seq("WordDocument" -> Array.fill[Byte](64)(1)))
    assert(CfbKernels.docText(badFib) == null)
  }

  test("fail-closed: truncations and corruption never throw; " +
    "non-CFB refuses") {
    val blob = CfbKernels.buildDoc("fail closed doc", unicode = false)
    var cut = 1
    while (cut < blob.length) {
      CfbKernels.entries(java.util.Arrays.copyOf(blob, cut)) // no throw
      CfbKernels.docText(java.util.Arrays.copyOf(blob, cut))
      cut += 37
    }
    // header truncations specifically must refuse
    assert(CfbKernels.entries(blob.take(511)) == null)
    val rnd = new scala.util.Random(0xcfb)
    for (_ <- 0 until 400) {
      val m = blob.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      CfbKernels.entries(m); CfbKernels.docText(m)
    }
    for (_ <- 0 until 300) {
      val junk = Array.fill[Byte](rnd.nextInt(2000))(rnd.nextInt(256).toByte)
      assert(CfbKernels.entries(junk) == null || junk.length >= 512)
    }
    assert(CfbKernels.entries("PKjunk".getBytes) == null)
    assert(CfbKernels.entries(null) == null)
    assert(CfbKernels.docText(null) == null)
  }

  test("SQL surface: cfb_entries + doc_text") {
    val spark = SparkSpec.session
    import spark.implicits._
    val doc = CfbKernels.buildDoc("sql surface text", unicode = false,
      extra = Seq("1Table" -> Array.fill[Byte](32)(1)))
    Seq((1L, doc), (2L, "junk".getBytes)).toDF("id", "b")
      .createOrReplaceTempView("cfb_t")
    val rows = spark.sql(
      "SELECT id, size(cfb_entries(b)) AS n, doc_text(b) AS t " +
        "FROM cfb_t ORDER BY id").collect()
    assert(rows(0).getInt(1) == 3) // root + WordDocument + 1Table
    assert(rows(0).getString(2) == "sql surface text")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }
}
