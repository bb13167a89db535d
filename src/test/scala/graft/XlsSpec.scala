package graft

import graft.functions.XlsKernels
import graft.functions.XlsKernels._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** [[XlsKernels]] — BIFF8 `.xls` cell extraction over REAL container
  * framing: the in-repo CFB writer wraps an in-repo BIFF8 Workbook
  * stream (globals + SST with Continue splits + BoundSheet8 + sheet
  * substreams), so the parser is exercised on the full record walk,
  * not on pre-chewed payloads. Fail-closed pins: FilePass (encrypted),
  * BIFF5, truncation, junk, absent sheets.
  */
class XlsSpec extends AnyFunSuite {

  private def cellsOf(b: Array[Byte], sheet: Int = 1): Seq[(Int, Int, String)] = {
    val a = XlsKernels.cells(b, sheet)
    if (a == null) null
    else (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
    }
  }

  test("every cell record type decodes: LabelSst, Number, RK (int, " +
    "x100, float, negative), MulRk, Label, BoolErr, Formula cached " +
    "num/str/bool/err/blank") {
    val wb = build(Seq(Seq(
      XSst(0, 0, "shared α ✓"),
      XSst(0, 1, "plain shared"),
      XNum(1, 1, 2.5),
      XNum(1, 2, -3.75),
      XRkInt(2, 0, 1234),
      XRkInt(2, 1, -42),
      XRkInt(2, 2, 123456, x100 = true),
      XMulRk(3, 3, Seq(7, 8, 9)),
      XLabelC(4, 4, "inline label"),
      XLabelC(4, 5, "unicode łabel"),
      XBool(5, 5, v = true),
      XBool(5, 6, v = false),
      XErr(6, 6, 0x07),
      XErr(6, 7, 0x2A),
      XFormulaNum(7, 7, 42.0),
      XFormulaStr(8, 8, "fx result"))))
    assert(cellsOf(wb) == Seq(
      (0, 0, "shared α ✓"), (0, 1, "plain shared"),
      (1, 1, "2.5"), (1, 2, "-3.75"),
      (2, 0, "1234"), (2, 1, "-42"), (2, 2, "1234.56"),
      (3, 3, "7"), (3, 4, "8"), (3, 5, "9"),
      (4, 4, "inline label"), (4, 5, "unicode łabel"),
      (5, 5, "TRUE"), (5, 6, "FALSE"),
      (6, 6, "#DIV/0!"), (6, 7, "#N/A"),
      (7, 7, "42"), (8, 8, "fx result")))
  }

  test("RK float form: top-30-bits-of-double encoding") {
    // 2.5 = 0x4004000000000000; RK float = high 32 bits, low 2 flags 0
    val raw = 0x40040000L & 0xFFFFFFFCL
    // hand-patch an XRkInt record's RK field via a 1-cell build
    val wb = build(Seq(Seq(XRkInt(0, 0, 0))))
    val zero = Array[Byte](2, 0, 0, 0) // fInt, value 0
    val at = indexOfSlice(wb, Array[Byte](0x7e, 0x02, 10, 0, 0, 0, 0, 0, 0, 0) ++ zero)
    assert(at >= 0, "RK record not found in fixture")
    var k = 0
    while (k < 4) { wb(at + 10 + k) = ((raw >> (8 * k)) & 0xff).toByte; k += 1 }
    assert(cellsOf(wb) == Seq((0, 0, "2.5")))
    // ...and the x100 variant of the float form
    var j = 0
    val raw100 = raw | 1L
    while (j < 4) { wb(at + 10 + j) = ((raw100 >> (8 * j)) & 0xff).toByte; j += 1 }
    assert(cellsOf(wb) == Seq((0, 0, "0.025")))
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var k = 0
      while (k < needle.length && hay(i + k) == needle(k)) k += 1
      if (k == needle.length) return i
      i += 1
    }
    -1
  }

  test("SST Continue splits on character boundaries re-declare the " +
    "compression flag; string headers at segment boundaries carry none") {
    val longA = "0123456789" * 40 // 400 chars, compressed form
    val longU = "αβγδε✓" * 50 // 300 chars, UTF-16 form
    for (split <- Seq(7, 16, 100)) {
      val wb = build(Seq(Seq(
        XSst(0, 0, longA), XSst(1, 0, longU), XSst(2, 0, "tail"))),
        sstSplit = split)
      assert(cellsOf(wb) == Seq((0, 0, longA), (1, 0, longU), (2, 0, "tail")),
        s"split=$split")
    }
  }

  test("second worksheet by index; absent sheet refused") {
    val wb = build(Seq(
      Seq(XLabelC(0, 0, "first")),
      Seq(XLabelC(0, 0, "on sheet two"), XNum(0, 1, 9.0))))
    assert(cellsOf(wb) == Seq((0, 0, "first")))
    assert(cellsOf(wb, 2) == Seq((0, 0, "on sheet two"), (0, 1, "9")))
    assert(cellsOf(wb, 3) == null)
    assert(cellsOf(wb, 0) == null)
  }

  test("empty sheet is an empty array, not NULL") {
    val wb = build(Seq(Seq.empty))
    assert(cellsOf(wb) == Seq.empty)
  }

  test("fail-closed: FilePass (encrypted), BIFF5, junk, truncation, " +
    "damaged SST index") {
    assert(cellsOf(build(Seq(Seq(XNum(0, 0, 1)))), 1) != null)
    assert(cellsOf(build(Seq(Seq(XNum(0, 0, 1))), filePass = true)) == null)
    assert(cellsOf(build(Seq(Seq(XNum(0, 0, 1))), biff5 = true)) == null)
    assert(cellsOf("not a cfb container at all".getBytes("UTF-8")) == null)
    assert(XlsKernels.cells(null) == null)
    val good = build(Seq(Seq(XSst(0, 0, "abc"), XNum(1, 1, 5))))
    var cut = 1
    while (cut < good.length) {
      XlsKernels.cells(java.util.Arrays.copyOf(good, cut)) // must not throw
      cut += 67
    }
    // LabelSst pointing past the SST table: structural damage
    val oneSst = build(Seq(Seq(XSst(0, 0, "only"))))
    // LabelSst record: type 0x00FD len 10, isst at payload offset 6
    val at = indexOfSlice(oneSst, Array[Byte](0xfd.toByte, 0x00, 10, 0))
    assert(at >= 0)
    oneSst(at + 10) = 9 // isst = 9, table has 1 entry
    assert(cellsOf(oneSst) == null)
  }

  test("cp1252 compressed strings: the 0x80-0x9F printables decode") {
    // '€' (0x80) is NOT compressible (U+20AC) so comes back UTF-16;
    // force the compressed path with a hand-built byte: 'œ' = 0x9C
    val wb = build(Seq(Seq(XLabelC(0, 0, "x_y"))))
    val at = indexOfSlice(wb, "x_y".map(_.toByte).toArray)
    assert(at >= 0)
    wb(at + 1) = 0x9C.toByte
    assert(cellsOf(wb) == Seq((0, 0, "xœy")))
  }

  test("xls_cells: SQL registration + in-plan explode, NULL lanes " +
    "survive explode_outer") {
    val spark = SparkSpec.session
    import spark.implicits._
    val good = build(Seq(Seq(XSst(0, 0, "s1"), XNum(3, 2, 7.5))))
    val enc = build(Seq(Seq(XNum(0, 0, 1))), filePass = true)
    val df = Seq((1, good), (2, enc)).toDF("id", "b")
    df.createOrReplaceTempView("xls_t")
    val rows = spark.sql(
      "SELECT id, c.row, c.col, c.value FROM xls_t " +
        "LATERAL VIEW OUTER explode(xls_cells(b)) t AS c ORDER BY id, c.row")
      .collect()
    assert(rows.length == 3)
    assert(rows(0).getInt(1) == 0 && rows(0).getString(3) == "s1")
    assert(rows(1).getInt(1) == 3 && rows(1).getInt(2) == 2 &&
      rows(1).getString(3) == "7.5")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(3))
    val viaCol = df.filter($"id" === 1)
      .select(graft.operators.Multimodal.xlsCells($"b").as("c"))
      .selectExpr("size(c)").as[Int].collect()
    assert(viaCol.sameElements(Array(2)))
  }
}
