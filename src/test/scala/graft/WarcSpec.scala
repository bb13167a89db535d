package graft

import graft.functions.WarcKernels
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[WarcKernels]] — WARC (ISO 28500) record parsing + HTTP payload
  * splitting. Fixtures are built byte-by-byte (and gzip-compressed with
  * the JDK's own encoder for the .warc.gz path); every fail-closed
  * framing violation gets a hostile fixture.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def crlf = "\r\n"
  private def rec(typ: String, uri: Option[String], ctype: Option[String],
                  payload: Array[Byte], version: String = "WARC/1.0"): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(version).append(crlf)
    sb.append("WARC-Type: ").append(typ).append(crlf)
    uri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append(crlf))
    ctype.foreach(c => sb.append("Content-Type: ").append(c).append(crlf))
    sb.append("Content-Length: ").append(payload.length).append(crlf)
    sb.append(crlf)
    sb.toString.getBytes("UTF-8") ++ payload ++ (crlf + crlf).getBytes("UTF-8")
  }
  private def http(status: Int, ctype: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status OK" + crlf + s"Content-Type: $ctype" + crlf + crlf)
      .getBytes("UTF-8") ++ body

  private def parse(b: Array[Byte]): Seq[Row] = {
    val arr = WarcKernels.records(b)
    if (arr == null) null
    else (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      Row(
        if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
        if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
        if (r.isNullAt(2)) null else r.getUTF8String(2).toString,
        r.getBinary(3).toSeq)
    }
  }

  private val body = "<html><body>hi</body></html>".getBytes("UTF-8")
  private val archive =
    rec("warcinfo", None, Some("application/warc-fields"),
      "software: graft\r\n".getBytes("UTF-8")) ++
    rec("response", Some("https://h.example.com/p/1"),
      Some("application/http;msgtype=response"), http(200, "text/html", body),
      version = "WARC/1.1")

  test("records: a two-record archive parses with exact payload bytes") {
    val rs = parse(archive)
    assert(rs.length == 2)
    assert(rs(0).getString(0) == "warcinfo" && rs(0).getString(1) == null)
    assert(rs(0).getAs[Seq[Byte]](3) == "software: graft\r\n".getBytes("UTF-8").toSeq)
    assert(rs(1).getString(0) == "response")
    assert(rs(1).getString(1) == "https://h.example.com/p/1")
    assert(rs(1).getString(2) == "application/http;msgtype=response")
    assert(rs(1).getAs[Seq[Byte]](3) == http(200, "text/html", body).toSeq)
  }

  test("records: per-record gzip members and whole-archive gzip both inflate") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close()
      bos.toByteArray
    }
    val members = gz(rec("warcinfo", None, None, "x: y\r\n".getBytes("UTF-8"))) ++
      gz(rec("response", Some("https://a/b"), None, http(200, "text/html", body)))
    assert(parse(members).length == 2)
    assert(parse(gz(archive)).length == 2)
    // corrupt gzip: fail-closed
    val corrupt = gz(archive)
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x55).toByte
    assert(parse(corrupt) == null)
  }

  test("records: zip-bomb inflation is refused, not attempted") {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    val zeros = new Array[Byte](1 << 20)
    for (_ <- 0 until 100) g.write(zeros) // 100 MiB of zeros, ~100 KiB gz
    g.close()
    assert(parse(bos.toByteArray) == null)
  }

  test("records fail-closed: every framing violation NULLs the whole blob") {
    assert(parse("WARC/2.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes) == null)
    assert(parse("WARC/1.0\nContent-Length: 0\n\n\n\n".getBytes) == null) // LF-only
    assert(parse("WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n".getBytes) == null) // no length
    assert(parse("WARC/1.0\r\nContent-Length: 1x\r\n\r\nA\r\n\r\n".getBytes) == null)
    assert(parse(archive.dropRight(3)) == null)           // truncated terminator
    assert(parse(archive ++ "junk".getBytes) == null)     // trailing garbage
    val bigLen = "WARC/1.0\r\nContent-Length: 999999\r\n\r\nshort\r\n\r\n"
    assert(parse(bigLen.getBytes) == null)                // truncated payload
    assert(parse(Array.emptyByteArray).length == 0)       // empty blob: zero records
  }

  test("httpParts: status/content-type/body; only the FIRST blank line splits") {
    val tricky = "line1\r\n\r\nline2".getBytes("UTF-8")
    val r = WarcKernels.httpParts(http(404, "text/plain", tricky))
    assert(r.getInt(0) == 404)
    assert(r.getUTF8String(1).toString == "text/plain")
    assert(r.getBinary(2).toSeq == tricky.toSeq)
    // not HTTP / malformed
    assert(WarcKernels.httpParts("software: graft\r\n".getBytes) == null)
    assert(WarcKernels.httpParts("HTTP/1.1 20x OK\r\n\r\n".getBytes) == null)
    assert(WarcKernels.httpParts("HTTP/1.1 200 OK\r\nbad header\r\n\r\n".getBytes) == null)
  }

  test("DataFrame + SQL path: explode records, split HTTP, extract text") {
    val df = Seq((1L, archive)).toDF("id", "blob")
      .select(col("id"), explode(graft.operators.Multimodal.warcRecords(col("blob"))).as("r"))
      .where(col("r.warc_type") === "response")
      .select(col("id"), col("r.target_uri").as("uri"),
        graft.operators.Multimodal.httpParts(col("r.payload")).as("h"))
      .select(col("id"), col("uri"), col("h.status"),
        graft.functions.TextFunctions.htmlExtract(
          graft.functions.TextFunctions.decodeText(col("h.body"))
            .getField("text")).as("text"))
    val row = df.head()
    assert(row.getString(1) == "https://h.example.com/p/1")
    assert(row.getInt(2) == 200)
    assert(row.getString(3) == "hi")
    val n = spark.sql(
      "SELECT size(warc_records(encode('', 'UTF-8'))) AS n").as[Int].head()
    assert(n == 0)
  }

  test("fuzz: random bytes and truncations never throw") {
    val rnd = new scala.util.Random(0x3a6c13L)
    for (_ <- 0 until 300) {
      val b = Array.fill(rnd.nextInt(150))(rnd.nextInt(256).toByte)
      WarcKernels.records(b)
      WarcKernels.httpParts(b)
    }
    for (cut <- 0 to archive.length)
      WarcKernels.records(archive.take(cut)) // no throw; null or fewer records
  }
}
