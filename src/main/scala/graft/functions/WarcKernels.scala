package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) record parsing — the container CommonCrawl and
  * every serious web archive actually ship. The ingest shape: read
  * `.warc`/`.warc.gz` files as whole binary blobs (`binaryFile`
  * source), explode [[records]] into one row per record, split HTTP
  * response payloads with [[httpParts]], and the rest of the crawl
  * front-end (decode_text → html_extract/html_links → quality →
  * robots → dedup) takes over. Pure JVM, one pass, fail-closed.
  *
  * [[records]] contract:
  *  - a gzip blob (1F 8B magic) is inflated first — WARC members are
  *    conventionally per-record gzip members, and the JDK inflater is
  *    driven member-by-member across the concatenation; inflation is
  *    zip-bomb-guarded (≤ max(64 MiB, 200× compressed) or NULL);
  *  - records are `WARC/1.x CRLF header-lines CRLF CRLF payload
  *    [Content-Length] CRLF CRLF`; header names case-insensitive;
  *    a missing/invalid Content-Length, a truncated payload, a
  *    malformed version line, or trailing non-record garbage makes
  *    the WHOLE blob NULL (a partially-readable archive must be
  *    visible, not silently half-ingested — the media-triage
  *    contract);
  *  - each record yields (warc_type, target_uri, content_type,
  *    payload); absent headers are NULL fields, the record stays.
  *
  * [[httpParts]] splits an application/http payload at the first
  * CRLFCRLF: (status, content_type, body) — status from the
  * `HTTP/x.y NNN` line, NULL for a payload that isn't HTTP.
  */
object WarcKernels {

  private val MaxInflate = 64 << 20

  /** Concatenated-member gzip inflate with a zip-bomb guard; null on
    * any corruption or on blowing the cap. */
  private[graft] def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val cap = math.max(MaxInflate.toLong, 200L * b.length)
      .min(Int.MaxValue.toLong).toInt
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(b.length * 4, 1 << 20))
      val in = new java.io.ByteArrayInputStream(b)
      // GZIPInputStream handles member concatenation internally
      val gz = new java.util.zip.GZIPInputStream(in, 1 << 16)
      val buf = new Array[Byte](1 << 16)
      var n = gz.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > cap) return null // zip bomb: refuse
        n = gz.read(buf)
      }
      out.toByteArray
    } catch { case _: Exception => null }
  }

  private def isCrlf(b: Array[Byte], i: Int): Boolean =
    i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n'

  /** Header block at `i` (lines until a blank CRLF): returns the
    * lowercased name → verbatim value map and the index PAST the blank
    * line, or null on malformed framing. */
  private def headers(b: Array[Byte], from: Int)
      : (scala.collection.mutable.HashMap[String, String], Int) = {
    val m = scala.collection.mutable.HashMap.empty[String, String]
    var i = from
    while (true) {
      if (isCrlf(b, i)) return (m, i + 2) // blank line: end of block
      var j = i
      while (j < b.length && b(j) != '\r' && b(j) != '\n') j += 1
      if (!isCrlf(b, j)) return null // LF-only or EOF inside headers
      val line = new String(b, i, j - i, java.nio.charset.StandardCharsets.ISO_8859_1)
      val colon = line.indexOf(':')
      if (colon <= 0) return null
      m.put(line.substring(0, colon).trim.toLowerCase,
        line.substring(colon + 1).trim)
      i = j + 2
    }
    null // unreachable
  }

  private def utf8OrNull(s: Option[String]): Any =
    s.map(UTF8String.fromString).orNull

  def records(b0: Array[Byte]): ArrayData = {
    if (b0 == null) return null
    val b =
      if (b0.length >= 2 && (b0(0) & 0xff) == 0x1f && (b0(1) & 0xff) == 0x8b)
        gunzipAll(b0)
      else b0
    if (b == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < b.length) {
      // version line: WARC/1.x CRLF
      var j = i
      while (j < b.length && b(j) != '\r' && b(j) != '\n') j += 1
      if (!isCrlf(b, j)) return null
      val ver = new String(b, i, j - i, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (!ver.startsWith("WARC/1.")) return null
      val h = headers(b, j + 2)
      if (h == null) return null
      val (hm, bodyStart) = h
      val lenStr = hm.getOrElse("content-length", null)
      if (lenStr == null || !lenStr.forall(c => c >= '0' && c <= '9') ||
        lenStr.isEmpty || lenStr.length > 10) return null
      val len = lenStr.toLong
      if (bodyStart + len > b.length) return null // truncated payload
      val payload = java.util.Arrays.copyOfRange(b, bodyStart, (bodyStart + len).toInt)
      out += new GenericInternalRow(Array[Any](
        utf8OrNull(hm.get("warc-type")),
        utf8OrNull(hm.get("warc-target-uri")),
        utf8OrNull(hm.get("content-type")),
        payload))
      var k = (bodyStart + len).toInt
      // the two record-terminating CRLFs
      if (!isCrlf(b, k)) return null
      k += 2
      if (!isCrlf(b, k)) return null
      k += 2
      i = k
    }
    new GenericArrayData(out.toArray)
  }

  def httpParts(p: Array[Byte]): InternalRow = {
    if (p == null) return null
    // status line: HTTP/d.d SP 3-digits
    var j = 0
    while (j < p.length && p(j) != '\r' && p(j) != '\n') j += 1
    if (!isCrlf(p, j)) return null
    val line = new String(p, 0, j, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!line.startsWith("HTTP/")) return null
    val sp = line.indexOf(' ')
    if (sp < 0 || sp + 4 > line.length) return null
    val code = line.substring(sp + 1, sp + 4)
    if (!code.forall(c => c >= '0' && c <= '9')) return null
    val h = headers(p, j + 2)
    if (h == null) return null
    val (hm, bodyStart) = h
    val body = java.util.Arrays.copyOfRange(p, bodyStart, p.length)
    new GenericInternalRow(Array[Any](
      code.toInt,
      utf8OrNull(hm.get("content-type")),
      body))
  }
}
