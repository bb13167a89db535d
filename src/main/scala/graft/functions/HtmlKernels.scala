package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** HTML → plain-text extraction — the WET-style boilerplate strip every
  * web-crawl pretraining pipeline runs before any quality/dedup pass
  * (the reference corpus is born clean; a 100 TB crawl corpus is not).
  *
  * One O(bytes) pass over the raw UTF-8 (markup is ASCII; multi-byte
  * text bytes pass through untouched) plus one O(bytes) whitespace
  * collapse — no DOM, no allocation proportional to tag depth, so the
  * kernel runs inside whole-stage codegen at scan speed. The semantics
  * are deliberately exact enough to replay in ANSI SQL for the oracle:
  *
  *  - `<script …>…</script>` and `<style …>…</style>` contents are
  *    dropped (tag names case-insensitive; the raw text ends at the
  *    first case-insensitive `</script` / `</style`, like HTML5 rawtext
  *    parsing; unterminated → dropped to EOF);
  *  - `<!-- … -->` comments dropped (unterminated → EOF);
  *  - `<![CDATA[ … ]]>` content is KEPT verbatim (XHTML islands carry
  *    real text there); other `<!…>` declarations and `<?…>` processing
  *    instructions dropped to the next `>`;
  *  - other tags are dropped; `>` inside single- or double-quoted
  *    attribute values does not end the tag (unterminated quote → the
  *    rest of the document is attribute, i.e. dropped — fail-closed the
  *    way a streaming extractor must be);
  *  - block-level tags ([[HtmlKernels.BlockTags]]) emit a `\n`
  *    separator on BOTH open and close; table cells (`td`/`th`) emit a
  *    space; inline tags (`<b>`, `<a …>`, …) emit nothing;
  *  - a `<` not followed by a letter, `/`, `!` or `?` is literal text
  *    (`1 < 2` survives);
  *  - character references: `&#NNN;` / `&#xHH;` decode to the code
  *    point when valid (≤ U+10FFFF, not a surrogate, not NUL); the
  *    named set [[HtmlKernels.Entities]] decodes (`&nbsp;` → plain
  *    space, `&shy;` → removed); anything else — unknown name, missing
  *    `;`, bare `&` — is left verbatim;
  *  - whitespace collapse: runs of space/tab/CR/LF/NBSP (literal
  *    U+00A0 too) become ONE `\n` if the run contained a newline
  *    (block separation survives), else one space; leading/trailing
  *    runs are dropped. Other control/format chars (`\x0B`, `\f`) are
  *    NOT whitespace here — the oracle's RE2 replay spells the class
  *    `[ \t\r\n ]` explicitly, mirroring the TextKernels.isWs
  *    caveat in reverse.
  *
  * Never throws on any byte sequence (crawl blobs are adversarial);
  * output length ≤ input length + entity expansions (each ≤ 4 bytes
  * for a ≤ 8-byte reference, so output < 2× input always).
  */
object HtmlKernels {

  /** Tags that separate text blocks with a newline (open and close). */
  val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "tr", "table", "thead", "tbody",
    "tfoot", "caption", "blockquote", "pre", "hr", "section", "article",
    "aside", "header", "footer", "nav", "main", "figure", "figcaption",
    "address", "title", "form", "fieldset", "legend", "option")

  /** Tags that separate with a single space (table cells). */
  val SpaceTags: Set[String] = Set("td", "th")

  /** Named character references decoded (case-sensitive, `;` required).
    * Small and closed on purpose: unknown names stay verbatim, so the
    * contract is checkable. `nbsp` maps to a PLAIN space (it then
    * collapses like any space); `shy` (soft hyphen) is removed.
    */
  val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "shy" -> "",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "middot" -> "·", "laquo" -> "«",
    "raquo" -> "»")

  private val MaxEntityName = Entities.keys.map(_.length).max

  private def isAsciiLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Case-insensitive ASCII `needle` in `hay` from `from`; -1 if absent. */
  private def indexOfIgnoreCase(hay: Array[Byte], from: Int,
                                needle: Array[Byte]): Int = {
    val n = hay.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      var j = 0
      while (j < needle.length && lower(hay(i + j)) == lower(needle(j))) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def startsWith(hay: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > hay.length) return false
    var j = 0
    while (j < s.length) {
      if (hay(at + j) != s.charAt(j).toByte) return false
      j += 1
    }
    true
  }

  /** Emit `cp` as UTF-8 into `out`. Caller guarantees validity. */
  private def emitCodePoint(out: java.io.ByteArrayOutputStream, cp: Int): Unit = {
    if (cp < 0x80) out.write(cp)
    else if (cp < 0x800) {
      out.write(0xc0 | (cp >> 6)); out.write(0x80 | (cp & 0x3f))
    } else if (cp < 0x10000) {
      out.write(0xe0 | (cp >> 12)); out.write(0x80 | ((cp >> 6) & 0x3f))
      out.write(0x80 | (cp & 0x3f))
    } else {
      out.write(0xf0 | (cp >> 18)); out.write(0x80 | ((cp >> 12) & 0x3f))
      out.write(0x80 | ((cp >> 6) & 0x3f)); out.write(0x80 | (cp & 0x3f))
    }
  }

  /** The extraction pass — returns raw (uncollapsed) text bytes. */
  private def strip(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    val out = new java.io.ByteArrayOutputStream(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val b = in(i)
      if (b == '<') {
        if (i + 1 >= n) { out.write('<'); i += 1 }
        else {
          val c = in(i + 1)
          if (isAsciiLetter(c)) {
            // open tag: parse name, then attributes (quote-aware)
            var j = i + 1
            val nb = new StringBuilder(8)
            while (j < n && (isAsciiLetter(in(j)) ||
              (in(j) >= '0' && in(j) <= '9') || in(j) == '-')) {
              nb.append(lower(in(j)).toChar); j += 1
            }
            val name = nb.toString
            var k = j
            var done = false
            while (k < n && !done) {
              val a = in(k)
              if (a == '"' || a == '\'') {
                k += 1
                while (k < n && in(k) != a) k += 1
                if (k < n) k += 1 // closing quote; EOF → rest is attribute
              } else if (a == '>') { done = true }
              else k += 1
            }
            i = if (done) k + 1 else n
            if (BlockTags.contains(name)) out.write('\n')
            else if (SpaceTags.contains(name)) out.write(' ')
            if (done && (name == "script" || name == "style")) {
              // rawtext: ends at the first case-insensitive "</name"
              val close = ("</" + name).getBytes("US-ASCII")
              val p = indexOfIgnoreCase(in, i, close)
              if (p < 0) i = n
              else {
                var q = p + close.length
                while (q < n && in(q) != '>') q += 1
                i = if (q < n) q + 1 else n
              }
            }
          } else if (c == '/') {
            var j = i + 2
            val nb = new StringBuilder(8)
            while (j < n && (isAsciiLetter(in(j)) ||
              (in(j) >= '0' && in(j) <= '9') || in(j) == '-')) {
              nb.append(lower(in(j)).toChar); j += 1
            }
            val name = nb.toString
            while (j < n && in(j) != '>') j += 1
            i = if (j < n) j + 1 else n
            if (BlockTags.contains(name)) out.write('\n')
            else if (SpaceTags.contains(name)) out.write(' ')
          } else if (c == '!') {
            if (startsWith(in, i, "<!--")) {
              val p = indexOfIgnoreCase(in, i + 4, "-->".getBytes("US-ASCII"))
              i = if (p < 0) n else p + 3
            } else if (startsWith(in, i, "<![CDATA[")) {
              val start = i + 9
              val p = indexOfIgnoreCase(in, start, "]]>".getBytes("US-ASCII"))
              val end = if (p < 0) n else p
              out.write(in, start, end - start)
              i = if (p < 0) n else p + 3
            } else {
              var j = i + 2
              while (j < n && in(j) != '>') j += 1
              i = if (j < n) j + 1 else n
            }
          } else if (c == '?') {
            var j = i + 2
            while (j < n && in(j) != '>') j += 1
            i = if (j < n) j + 1 else n
          } else { out.write('<'); i += 1 }
        }
      } else if (b == '&') {
        var consumed = false
        if (i + 1 < n && in(i + 1) == '#') {
          // numeric reference
          var j = i + 2
          var hex = false
          if (j < n && (in(j) == 'x' || in(j) == 'X')) { hex = true; j += 1 }
          var cp = 0L
          var digits = 0
          var ok = true
          while (ok && j < n && digits <= 7 && in(j) != ';') {
            val d = in(j)
            val v =
              if (d >= '0' && d <= '9') d - '0'
              else if (hex && d >= 'a' && d <= 'f') d - 'a' + 10
              else if (hex && d >= 'A' && d <= 'F') d - 'A' + 10
              else -1
            if (v < 0) ok = false
            else { cp = cp * (if (hex) 16 else 10) + v; digits += 1; j += 1 }
          }
          if (ok && digits > 0 && digits <= 7 && j < n && in(j) == ';' &&
            cp > 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) {
            emitCodePoint(out, cp.toInt)
            i = j + 1
            consumed = true
          }
        } else if (i + 1 < n && isAsciiLetter(in(i + 1))) {
          var j = i + 1
          val nb = new StringBuilder(MaxEntityName)
          while (j < n && isAsciiLetter(in(j)) && nb.length <= MaxEntityName) {
            nb.append(in(j).toChar); j += 1
          }
          if (j < n && in(j) == ';') {
            Entities.get(nb.toString) match {
              case Some(rep) =>
                val rb = rep.getBytes("UTF-8")
                out.write(rb, 0, rb.length)
                i = j + 1
                consumed = true
              case None => // unknown name: verbatim
            }
          }
        }
        if (!consumed) { out.write('&'); i += 1 }
      } else {
        out.write(b)
        i += 1
      }
    }
    out.toByteArray
  }

  /** Whitespace collapse: run → `\n` if it contained `\n`, else ` `;
    * leading/trailing runs dropped. NBSP = the byte pair C2 A0 (a
    * complete UTF-8 scalar — a C2 lead byte begins nothing else).
    */
  private def collapse(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    val out = new java.io.ByteArrayOutputStream(math.min(n, 1 << 16))
    var i = 0
    var pendingNl = false
    var pendingSp = false
    while (i < n) {
      val b = in(i)
      val isNbsp = b == 0xc2.toByte && i + 1 < n && in(i + 1) == 0xa0.toByte
      if (b == ' ' || b == '\t' || b == '\r') { pendingSp = true; i += 1 }
      else if (b == '\n') { pendingNl = true; i += 1 }
      else if (isNbsp) { pendingSp = true; i += 2 }
      else {
        if (out.size() > 0) {
          if (pendingNl) out.write('\n')
          else if (pendingSp) out.write(' ')
        }
        pendingNl = false; pendingSp = false
        out.write(b)
        i += 1
      }
    }
    out.toByteArray
  }

  /** The public kernel: HTML in, collapsed plain text out. */
  def htmlExtract(s: UTF8String): UTF8String =
    UTF8String.fromBytes(collapse(strip(s.getBytes)))

  /** Entity-decode one attribute value (same table/numeric rules as the
    * text path — URLs in markup carry `&amp;` constantly). */
  private def decodeEntities(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    var has = false
    var i = from
    while (!has && i < to) { if (b(i) == '&') has = true; i += 1 }
    if (!has) return java.util.Arrays.copyOfRange(b, from, to)
    val out = new java.io.ByteArrayOutputStream(to - from)
    i = from
    while (i < to) {
      if (b(i) == '&') {
        var consumed = false
        if (i + 1 < to && b(i + 1) == '#') {
          var j = i + 2
          var hex = false
          if (j < to && (b(j) == 'x' || b(j) == 'X')) { hex = true; j += 1 }
          var cp = 0L
          var digits = 0
          var ok = true
          while (ok && j < to && digits <= 7 && b(j) != ';') {
            val d = b(j)
            val v =
              if (d >= '0' && d <= '9') d - '0'
              else if (hex && d >= 'a' && d <= 'f') d - 'a' + 10
              else if (hex && d >= 'A' && d <= 'F') d - 'A' + 10
              else -1
            if (v < 0) ok = false
            else { cp = cp * (if (hex) 16 else 10) + v; digits += 1; j += 1 }
          }
          if (ok && digits > 0 && digits <= 7 && j < to && b(j) == ';' &&
            cp > 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) {
            emitCodePoint(out, cp.toInt); i = j + 1; consumed = true
          }
        } else if (i + 1 < to && isAsciiLetter(b(i + 1))) {
          var j = i + 1
          val nb = new StringBuilder(MaxEntityName)
          while (j < to && isAsciiLetter(b(j)) && nb.length <= MaxEntityName) {
            nb.append(b(j).toChar); j += 1
          }
          if (j < to && b(j) == ';') {
            Entities.get(nb.toString) match {
              case Some(rep) =>
                val rb = rep.getBytes("UTF-8")
                out.write(rb, 0, rb.length)
                i = j + 1; consumed = true
              case None =>
            }
          }
        }
        if (!consumed) { out.write('&'); i += 1 }
      } else { out.write(b(i)); i += 1 }
    }
    out.toByteArray
  }

  /** Hyperlink extraction — the frontier-discovery companion of
    * [[htmlExtract]]: the `href` values of `<a>` / `<area>` tags, in
    * document order, duplicates kept (the frontier dedups AFTER
    * canonicalization). Same scanning discipline as the text strip —
    * script/style rawtext, comments, CDATA, and declarations are
    * skipped (a link inside a comment or a JS string is not a link),
    * quoted attribute values may contain `>`, and values are
    * entity-decoded (`&amp;` in query strings). Unquoted values end at
    * whitespace or `>`; attribute names are case-insensitive; an `<a>`
    * without `href` contributes nothing. Empty href values are kept
    * verbatim (self-links are the caller's resolve step — this kernel
    * does NOT resolve relative URLs; compose with a base + url_parts).
    */
  def htmlLinks(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val in = s.getBytes
    val n = in.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (in(i) == '<') {
        if (i + 1 >= n) i += 1
        else {
          val c = in(i + 1)
          if (isAsciiLetter(c)) {
            var j = i + 1
            val nb = new StringBuilder(8)
            while (j < n && (isAsciiLetter(in(j)) ||
              (in(j) >= '0' && in(j) <= '9') || in(j) == '-')) {
              nb.append(lower(in(j)).toChar); j += 1
            }
            val name = nb.toString
            val wantHref = name == "a" || name == "area"
            // attribute scan (quote-aware); collect href when wanted
            var k = j
            var done = false
            var href: Array[Byte] = null
            while (k < n && !done) {
              val a = in(k)
              if (a == '>') done = true
              else if (a == '"' || a == '\'') {
                k += 1
                while (k < n && in(k) != a) k += 1
                if (k < n) k += 1
              } else if (wantHref && isAsciiLetter(a)) {
                // attribute name
                val as = k
                while (k < n && (isAsciiLetter(in(k)) || in(k) == '-' ||
                  (in(k) >= '0' && in(k) <= '9'))) k += 1
                val attr = new String(in, as, k - as,
                  java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
                // skip ws, optional '=' value
                while (k < n && (in(k) == ' ' || in(k) == '\t' ||
                  in(k) == '\r' || in(k) == '\n')) k += 1
                if (k < n && in(k) == '=') {
                  k += 1
                  while (k < n && (in(k) == ' ' || in(k) == '\t' ||
                    in(k) == '\r' || in(k) == '\n')) k += 1
                  if (k < n && (in(k) == '"' || in(k) == '\'')) {
                    val q = in(k)
                    val vs = k + 1
                    k += 1
                    while (k < n && in(k) != q) k += 1
                    if (attr == "href" && href == null)
                      href = decodeEntities(in, vs, k)
                    if (k < n) k += 1
                  } else {
                    val vs = k
                    while (k < n && in(k) != '>' && in(k) != ' ' &&
                      in(k) != '\t' && in(k) != '\r' && in(k) != '\n') k += 1
                    if (attr == "href" && href == null)
                      href = decodeEntities(in, vs, k)
                  }
                }
              } else k += 1
            }
            i = if (done) k + 1 else n
            // fail-closed: a tag left unterminated at EOF (or swallowed
            // by an unclosed quote) contributes nothing
            if (done && wantHref && href != null)
              out += UTF8String.fromBytes(href)
            if (done && (name == "script" || name == "style")) {
              val close = ("</" + name).getBytes("US-ASCII")
              val p = indexOfIgnoreCase(in, i, close)
              if (p < 0) i = n
              else {
                var q = p + close.length
                while (q < n && in(q) != '>') q += 1
                i = if (q < n) q + 1 else n
              }
            }
          } else if (c == '!') {
            if (startsWith(in, i, "<!--")) {
              val p = indexOfIgnoreCase(in, i + 4, "-->".getBytes("US-ASCII"))
              i = if (p < 0) n else p + 3
            } else if (startsWith(in, i, "<![CDATA[")) {
              val p = indexOfIgnoreCase(in, i + 9, "]]>".getBytes("US-ASCII"))
              i = if (p < 0) n else p + 3
            } else {
              var j = i + 2
              while (j < n && in(j) != '>') j += 1
              i = if (j < n) j + 1 else n
            }
          } else if (c == '/' || c == '?') {
            var j = i + 2
            while (j < n && in(j) != '>') j += 1
            i = if (j < n) j + 1 else n
          } else i += 1
        }
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  // -----------------------------------------------------------------
  // page metadata (round 17): the head-scraping pass a corpus
  // pipeline runs on every page — title, description, OpenGraph
  // fields, canonical URL, declared language. BEST-EFFORT by design
  // (HTML is soup; a page without the fields yields NULL fields, and
  // only a NULL input yields a NULL struct) — unlike the container
  // kernels there is no framing to vouch for.
  // -----------------------------------------------------------------
  import org.apache.spark.sql.types._
  val metaSchema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("og_title", StringType, nullable = true),
    StructField("og_description", StringType, nullable = true),
    StructField("og_image", StringType, nullable = true),
    StructField("canonical", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  /** Quote-aware attribute scan of one tag starting after its name:
    * (lowercased name → entity-decoded value, index past '>', closed). */
  private def tagAttrs(in: Array[Byte], from: Int)
      : (Map[String, String], Int, Boolean) = {
    val n = in.length
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var k = from
    var done = false
    while (k < n && !done) {
      val a = in(k)
      if (a == '>') done = true
      else if (a == '"' || a == '\'') {
        k += 1
        while (k < n && in(k) != a) k += 1
        if (k < n) k += 1
      } else if (isAsciiLetter(a)) {
        val as = k
        while (k < n && (isAsciiLetter(in(k)) || in(k) == '-' ||
          in(k) == ':' || (in(k) >= '0' && in(k) <= '9'))) k += 1
        val attr = new String(in, as, k - as,
          java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
        while (k < n && (in(k) == ' ' || in(k) == '\t' ||
          in(k) == '\r' || in(k) == '\n')) k += 1
        if (k < n && in(k) == '=') {
          k += 1
          while (k < n && (in(k) == ' ' || in(k) == '\t' ||
            in(k) == '\r' || in(k) == '\n')) k += 1
          if (k < n && (in(k) == '"' || in(k) == '\'')) {
            val q = in(k)
            val vs = k + 1
            k += 1
            while (k < n && in(k) != q) k += 1
            if (!attrs.contains(attr))
              attrs(attr) = new String(decodeEntities(in, vs, k),
                java.nio.charset.StandardCharsets.UTF_8)
            if (k < n) k += 1
          } else {
            val vs = k
            while (k < n && in(k) != '>' && in(k) != ' ' &&
              in(k) != '\t' && in(k) != '\r' && in(k) != '\n') k += 1
            if (!attrs.contains(attr))
              attrs(attr) = new String(decodeEntities(in, vs, k),
                java.nio.charset.StandardCharsets.UTF_8)
          }
        } else if (!attrs.contains(attr)) attrs(attr) = ""
      } else k += 1
    }
    (attrs.toMap, if (done) k + 1 else n, done)
  }

  /** struct(title, description, og_title, og_description, og_image,
    * canonical, lang); first occurrence wins per field. */
  def htmlMeta(s: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    if (s == null) return null
    val in = s.getBytes
    val n = in.length
    var title: String = null
    var description: String = null
    var ogTitle: String = null
    var ogDesc: String = null
    var ogImage: String = null
    var canonical: String = null
    var lang: String = null
    var i = 0
    while (i < n) {
      if (in(i) == '<' && i + 1 < n) {
        val c = in(i + 1)
        if (isAsciiLetter(c)) {
          var j = i + 1
          val nb = new StringBuilder(8)
          while (j < n && (isAsciiLetter(in(j)) ||
            (in(j) >= '0' && in(j) <= '9') || in(j) == '-')) {
            nb.append(lower(in(j)).toChar); j += 1
          }
          val name = nb.toString
          val (attrs, after, closed) = tagAttrs(in, j)
          i = after
          if (closed) name match {
            case "html" =>
              if (lang == null) lang = attrs.get("lang").filter(_.nonEmpty).orNull
            case "title" =>
              if (title == null) {
                val close = indexOfIgnoreCase(in, i, "</title".getBytes("US-ASCII"))
                if (close >= 0) {
                  val t = new String(decodeEntities(in, i, close),
                    java.nio.charset.StandardCharsets.UTF_8)
                      .replaceAll("[\\s\\u00A0]+", " ").trim
                  if (t.nonEmpty) title = t
                  var q = close + 7
                  while (q < n && in(q) != '>') q += 1
                  i = if (q < n) q + 1 else n
                }
              }
            case "meta" =>
              val content = attrs.get("content").filter(_.nonEmpty)
              attrs.get("property").orElse(attrs.get("name"))
                .map(_.toLowerCase) match {
                case Some("og:title") =>
                  if (ogTitle == null) ogTitle = content.orNull
                case Some("og:description") =>
                  if (ogDesc == null) ogDesc = content.orNull
                case Some("og:image") =>
                  if (ogImage == null) ogImage = content.orNull
                case Some("description") =>
                  if (description == null) description = content.orNull
                case _ => ()
              }
            case "link" =>
              if (canonical == null &&
                  attrs.get("rel").exists(_.equalsIgnoreCase("canonical")))
                canonical = attrs.get("href").filter(_.nonEmpty).orNull
            case "script" | "style" =>
              val close = ("</" + name).getBytes("US-ASCII")
              val p = indexOfIgnoreCase(in, i, close)
              if (p < 0) i = n
              else {
                var q = p + close.length
                while (q < n && in(q) != '>') q += 1
                i = if (q < n) q + 1 else n
              }
            case _ => ()
          }
        } else if (c == '!') {
          if (startsWith(in, i, "<!--")) {
            val p = indexOfIgnoreCase(in, i + 4, "-->".getBytes("US-ASCII"))
            i = if (p < 0) n else p + 3
          } else {
            var j = i + 2
            while (j < n && in(j) != '>') j += 1
            i = if (j < n) j + 1 else n
          }
        } else if (c == '/' || c == '?') {
          var j = i + 2
          while (j < n && in(j) != '>') j += 1
          i = if (j < n) j + 1 else n
        } else i += 1
      } else i += 1
    }
    def u(x: String) =
      if (x == null) null else UTF8String.fromString(x)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](u(title), u(description), u(ogTitle), u(ogDesc),
        u(ogImage), u(canonical), u(lang)))
  }
}
