package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Bytes → text for crawl ingest: the decode step between a binary
  * blob column and every text operator. Real crawl payloads are
  * declared-one-thing-encoded-another, so the kernel SNIFFS instead of
  * trusting metadata — the CommonCrawl/WET approach:
  *
  *  1. a UTF-16 BOM (FF FE / FE FF) decodes as UTF-16 LE/BE (an odd
  *     trailing byte is dropped — a truncated crawl blob, counted in
  *     `n_fallback_bytes`);
  *  2. a UTF-8 BOM (EF BB BF) is stripped; the rest must VALIDATE;
  *  3. bytes that validate as STRICT UTF-8 (no overlongs, no
  *     surrogates, no > U+10FFFF — the table from RFC 3629) pass
  *     through untouched (zero copy, zero allocation);
  *  4. round 16 — when the document CARRIES a charset hint (an HTML
  *     `<meta charset=…>` / `<meta http-equiv content=…charset=…>` in
  *     the first 1024 bytes, or an XML declaration `encoding=`) naming
  *     a legacy multi-byte CJK family (Shift_JIS / GBK / GB18030 /
  *     Big5 / EUC-KR / EUC-JP), the bytes are decoded with the JVM
  *     charset under STRICT validation (malformed/unmappable →
  *     REPORT): a clean decode is accepted and reported under the
  *     canonical family name with `n_fallback_bytes = 0`; a FALSE
  *     hint (bytes the declared charset rejects) falls through — the
  *     hint is metadata and metadata lies. Decode charsets follow the
  *     WHATWG mappings (shift_jis → windows-31j, euc-kr →
  *     windows-949, gb2312 → GBK);
  *  5. anything else decodes as windows-1252 (the de-facto fallback
  *     for mislabeled latin-1/cp1252 web text), `n_fallback_bytes` =
  *     the count of transcoded (≥ 0x80) bytes.
  *
  * Always produces text (fail-OPEN: ingest must not drop a page over
  * encoding), and reports (encoding, n_fallback_bytes) so a quality
  * gate can act on the diagnosis. Deterministic byte-for-byte; never
  * throws.
  */
object EncodingKernels {

  /** Strict RFC 3629 validation. */
  private[graft] def isValidUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        // E0: c1 in A0..BF (no overlong); ED: c1 in 80..9F (no surrogates)
        val lo = if (c == 0xe0) 0xa0 else 0x80
        val hi = if (c == 0xed) 0x9f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte, max U+10FFFF
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
      }
    true
  }

  private def result(text: UTF8String, enc: String, nBad: Long): InternalRow =
    new GenericInternalRow(Array[Any](text, UTF8String.fromString(enc), nBad))

  // ---- legacy-charset hint handling (round 16) --------------------
  private val HintScanLimit = 1024
  private val XmlDeclRe = java.util.regex.Pattern.compile(
    "^<\\?xml[^>]{0,200}?encoding\\s*=\\s*[\"']([a-z0-9._-]+)")
  private val CharsetRe = java.util.regex.Pattern.compile(
    "charset\\s*=\\s*[\"']?\\s*([a-z0-9._-]+)")

  /** Declared charset token from the first 1 KiB (lowercased), or
    * null: the XML declaration, else `charset=` inside a still-open
    * `<meta` tag (the WHATWG prescan shape). */
  private[graft] def sniffHint(b: Array[Byte]): String = {
    val n = math.min(b.length, HintScanLimit)
    if (n == 0) return null
    val head = new String(b, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
    val xm = XmlDeclRe.matcher(head)
    if (xm.find()) return xm.group(1)
    val mm = CharsetRe.matcher(head)
    while (mm.find()) {
      val tag = head.lastIndexOf("<meta", mm.start)
      if (tag >= 0) {
        val close = head.indexOf('>', tag)
        if (close < 0 || close >= mm.start) return mm.group(1)
      }
    }
    null
  }

  /** (canonical family name, decode charset) per the WHATWG encoding
    * mappings; null for hints outside the legacy multi-byte families
    * (single-byte mislabels keep the windows-1252 fallback — a wrong
    * single-byte decode is undetectable, so the default stays). */
  private[graft] def resolveHint(h: String):
      (String, java.nio.charset.Charset) = {
    def cs(name: String) = java.nio.charset.Charset.forName(name)
    h match {
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "shiftjis" |
           "ms_kanji" | "windows-31j" | "cp932" =>
        ("shift_jis", cs("windows-31j"))
      case "gbk" | "gb2312" | "gb_2312-80" | "x-gbk" | "csgb2312" |
           "chinese" =>
        ("gbk", cs("GBK"))
      case "gb18030" => ("gb18030", cs("GB18030"))
      case "big5" | "csbig5" => ("big5", cs("Big5"))
      case "big5-hkscs" => ("big5", cs("Big5-HKSCS"))
      case "euc-kr" | "ks_c_5601-1987" | "korean" | "windows-949" |
           "cseuckr" =>
        ("euc-kr", cs("x-windows-949"))
      case "euc-jp" | "cseucpkdfmtjapanese" => ("euc-jp", cs("EUC-JP"))
      case _ => null
    }
  }

  /** Strict decode: any malformed or unmappable sequence → null. */
  private def strictDecode(b: Array[Byte],
                           cs: java.nio.charset.Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: Exception => null }
  }

  def decodeText(b: Array[Byte]): InternalRow = {
    val n = b.length
    // UTF-16 BOMs
    if (n >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe) {
      val even = (n - 2) & ~1
      val s = new String(b, 2, even, java.nio.charset.StandardCharsets.UTF_16LE)
      return result(UTF8String.fromString(s), "utf-16le", (n - 2 - even).toLong)
    }
    if (n >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff) {
      val even = (n - 2) & ~1
      val s = new String(b, 2, even, java.nio.charset.StandardCharsets.UTF_16BE)
      return result(UTF8String.fromString(s), "utf-16be", (n - 2 - even).toLong)
    }
    // UTF-8 BOM
    val start =
      if (n >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf) 3
      else 0
    if (isValidUtf8(b, start)) {
      val text =
        if (start == 0) UTF8String.fromBytes(b) // zero copy
        else UTF8String.fromBytes(b, start, n - start)
      return result(text, "utf-8", 0L)
    }
    // charset hint (r16): a declared legacy CJK family, decoded under
    // strict validation; a false hint falls through to the 1252 floor
    val hint = sniffHint(b)
    if (hint != null) {
      val r = resolveHint(hint)
      if (r != null) {
        val s = strictDecode(b, r._2)
        if (s != null)
          return result(UTF8String.fromString(s), r._1, 0L)
      }
    }
    // windows-1252 fallback (JDK cp1252 table)
    var high = 0L
    var i = 0
    while (i < n) { if ((b(i) & 0xff) >= 0x80) high += 1; i += 1 }
    val s = new String(b, java.nio.charset.Charset.forName("windows-1252"))
    result(UTF8String.fromString(s), "windows-1252", high)
  }
}
