package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap / sitemap-index parsing (sitemaps.org protocol, round 14) —
  * the step that closes the crawl discovery loop: `robots_sitemaps`
  * yields sitemap URLs, [[entries]] parses the fetched documents into
  * frontier entries that feed `url_resolve` / `url_parts`.
  *
  * Contract (fail-closed like the WARC/robots kernels):
  *  - the root element must be `urlset` (entries of kind `url`) or
  *    `sitemapindex` (entries of kind `sitemap`); namespace prefixes
  *    are ignored (local-name match, case-insensitive);
  *  - each `<url>`/`<sitemap>` entry must carry exactly ONE `<loc>`
  *    (entity-decoded, CDATA-capable, trimmed, non-empty) and at most
  *    one `<lastmod>` (kept verbatim-trimmed — validation is the
  *    consumer's job); unknown child elements (`changefreq`,
  *    `xhtml:link`, `video:video` blocks…) are skipped with proper
  *    nesting;
  *  - malformed framing ANYWHERE — truncated document, unterminated
  *    comment/CDATA/tag, missing loc, duplicate loc, stray text,
  *    trailing garbage after the root close — makes the WHOLE
  *    document NULL: a partially-readable sitemap must be visible,
  *    never silently half-ingested;
  *  - more than [[MaxEntries]] entries (the protocol's own 50 000
  *    cap) is refused — the zip-bomb-adjacent guard.
  *
  * Output: array of (kind, loc, lastmod) structs in document order.
  */
object SitemapKernels {

  val MaxEntries = 50000

  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true)))

  private[functions] def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == ':' || c == '-' || c == '_' || c == '.'

  private[functions] def nameEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && isNameChar(s.charAt(i))) i += 1
    i
  }

  private[functions] def localName(n: String): String = {
    val c = n.lastIndexOf(':')
    (if (c < 0) n else n.substring(c + 1)).toLowerCase
  }

  /** Whitespace + comments; -1 on an unterminated comment. */
  private[functions] def skipMisc(s: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      if (Character.isWhitespace(s.charAt(i))) i += 1
      else if (s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4)
        if (e < 0) return -1
        i = e + 3
      } else return i
    }
    i
  }

  /** Scan past a tag's attributes to `>`; quoted values may contain
    * `>`/`/`. Returns (index past '>', selfClosing) or null. */
  private[functions] def tagEnd(s: String, from: Int): (Int, Boolean) = {
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        val e = s.indexOf(c, i + 1)
        if (e < 0) return null
        i = e + 1
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '>')
        return (i + 2, true)
      else if (c == '>') return (i + 1, false)
      else i += 1
    }
    null
  }

  /** XML entity decode — the shared [[XmlEntities]] (five predefined
    * entities + numeric refs; unrecognized pass through verbatim). */
  private def decodeEntities(t: String): String = XmlEntities.decode(t)

  /** Text content (CDATA-capable) up to `</name>`; no nested elements
    * allowed inside. Returns (decoded trimmed text, index past the
    * close tag) or null. */
  private[functions] def textUntilClose(s: String, from: Int, name: String): (String, Int) = {
    val sb = new StringBuilder
    var i = from
    while (i < s.length) {
      if (s.startsWith("<![CDATA[", i)) {
        val e = s.indexOf("]]>", i + 9)
        if (e < 0) return null
        sb.append(s.substring(i + 9, e))
        i = e + 3
      } else if (s.startsWith("</", i)) {
        val ne = nameEnd(s, i + 2)
        if (localName(s.substring(i + 2, ne)) != name) return null
        val te = tagEnd(s, ne)
        if (te == null || te._2) return null
        return (decodeEntities(sb.toString).trim, te._1)
      } else if (s.charAt(i) == '<') return null // nested element: refuse
      else { sb.append(s.charAt(i)); i += 1 }
    }
    null
  }

  /** Skip a whole element body (open tag already consumed) including
    * arbitrarily nested children, comments, CDATA. Returns the index
    * past the balancing close tag, or -1. */
  private[functions] def skipElement(s: String, from: Int): Int = {
    var depth = 1
    var i = from
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return -1
      if (s.startsWith("<!--", lt)) {
        val e = s.indexOf("-->", lt + 4); if (e < 0) return -1
        i = e + 3
      } else if (s.startsWith("<![CDATA[", lt)) {
        val e = s.indexOf("]]>", lt + 9); if (e < 0) return -1
        i = e + 3
      } else if (s.startsWith("</", lt)) {
        val te = tagEnd(s, nameEnd(s, lt + 2))
        if (te == null) return -1
        depth -= 1
        i = te._1
        if (depth == 0) return i
      } else {
        val te = tagEnd(s, nameEnd(s, lt + 1))
        if (te == null) return -1
        if (!te._2) depth += 1
        i = te._1
      }
    }
    -1
  }

  def entries(u: UTF8String): ArrayData = {
    if (u == null) return null
    val s = u.toString
    var i = if (s.nonEmpty && s.charAt(0) == '\uFEFF') 1 else 0 // BOM
    i = skipMisc(s, i); if (i < 0) return null
    if (s.startsWith("<?xml", i)) {
      val e = s.indexOf("?>", i + 5)
      if (e < 0) return null
      i = skipMisc(s, e + 2); if (i < 0) return null
    }
    if (i >= s.length || s.charAt(i) != '<') return null
    val rootNe = nameEnd(s, i + 1)
    val root = localName(s.substring(i + 1, rootNe))
    val (childName, kind) = root match {
      case "urlset" => ("url", UTF8String.fromString("url"))
      case "sitemapindex" => ("sitemap", UTF8String.fromString("sitemap"))
      case _ => return null
    }
    val rootTe = tagEnd(s, rootNe)
    if (rootTe == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = rootTe._1
    var rootClosed = rootTe._2 // self-closing root: empty set
    while (!rootClosed) {
      i = skipMisc(s, i); if (i < 0) return null
      if (i >= s.length) return null // EOF inside root: truncated
      if (s.charAt(i) != '<') return null // stray text inside root
      if (s.startsWith("</", i)) {
        val ne = nameEnd(s, i + 2)
        if (localName(s.substring(i + 2, ne)) != root) return null
        val te = tagEnd(s, ne)
        if (te == null || te._2) return null
        i = te._1
        rootClosed = true
      } else {
        val ne = nameEnd(s, i + 1)
        if (localName(s.substring(i + 1, ne)) != childName) return null
        val te = tagEnd(s, ne)
        if (te == null) return null
        i = te._1
        if (!te._2) { // an entry body
          var loc: String = null
          var lastmod: String = null
          var entryClosed = false
          while (!entryClosed) {
            i = skipMisc(s, i); if (i < 0) return null
            if (i >= s.length) return null
            if (s.charAt(i) != '<') return null
            if (s.startsWith("</", i)) {
              val ene = nameEnd(s, i + 2)
              if (localName(s.substring(i + 2, ene)) != childName) return null
              val ete = tagEnd(s, ene)
              if (ete == null || ete._2) return null
              i = ete._1
              entryClosed = true
            } else {
              val ene = nameEnd(s, i + 1)
              val elName = localName(s.substring(i + 1, ene))
              val ete = tagEnd(s, ene)
              if (ete == null) return null
              i = ete._1
              if (!ete._2) {
                if (elName == "loc") {
                  if (loc != null) return null // duplicate loc
                  val t = textUntilClose(s, i, "loc")
                  if (t == null || t._1.isEmpty) return null
                  loc = t._1; i = t._2
                } else if (elName == "lastmod") {
                  if (lastmod != null) return null
                  val t = textUntilClose(s, i, "lastmod")
                  if (t == null) return null
                  lastmod = t._1; i = t._2
                } else {
                  i = skipElement(s, i)
                  if (i < 0) return null
                }
              } // self-closing unknown element: skipped
            }
          }
          if (loc == null) return null // loc is required per entry
          if (out.length >= MaxEntries) return null // protocol cap
          out += new GenericInternalRow(Array[Any](
            kind, UTF8String.fromString(loc),
            if (lastmod == null || lastmod.isEmpty) null
            else UTF8String.fromString(lastmod)))
        } else return null // self-closing <url/> has no loc: malformed
      }
    }
    i = skipMisc(s, i)
    if (i < 0 || i != s.length) return null // trailing garbage
    new GenericArrayData(out.toArray)
  }
}
