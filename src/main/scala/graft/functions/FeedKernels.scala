package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** RSS / Atom feed parsing (round 17) — the other XML discovery
  * surface next to sitemaps: feeds carry fresh-content URLs plus the
  * article text snippets a crawl frontier prioritizes on. Shares the
  * sitemap kernel's scanning machinery ([[SitemapKernels]] helpers:
  * namespace-blind local names, comment/CDATA-aware walks, fail-closed
  * framing).
  *
  * Contract:
  *  - RSS 2.0: `<rss><channel>` … `<item>` children — `title`,
  *    `link` (text content), `pubDate`, `description`;
  *  - Atom: `<feed>` … `<entry>` children — `title`,
  *    `<link href=…/>` (rel="alternate" preferred, then the first
  *    rel-less link), `updated` (falling back to `published`),
  *    `summary`;
  *  - non-item channel/feed elements are skipped with proper nesting;
  *    duplicate fields inside an entry keep the FIRST value (real
  *    feeds are messier than sitemaps — strict duplicate refusal
  *    would refuse the web);
  *  - an entry with neither title nor link, malformed framing
  *    anywhere, an unterminated element, trailing garbage, or more
  *    than [[MaxEntries]] entries → whole-document NULL.
  *
  * Output: array of (kind, title, link, date, summary) structs in
  * document order; `kind` = `rss` | `atom`.
  */
object FeedKernels {

  val MaxEntries = 10000

  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("link", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("summary", StringType, nullable = true)))

  import SitemapKernels.{localName, nameEnd, skipElement, skipMisc, tagEnd, textUntilClose}

  /** One attribute's entity-decoded value from a tag's attribute
    * region, or null. */
  private def attr(s: String, from: Int, to: Int, name: String): String = {
    var i = from
    while (i < to) {
      // find name boundary
      while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
      val ns = i
      while (i < to && SitemapKernels.isNameChar(s.charAt(i))) i += 1
      if (i == ns) return null
      val an = s.substring(ns, i).toLowerCase
      while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < to && s.charAt(i) == '=') {
        i += 1
        while (i < to && Character.isWhitespace(s.charAt(i))) i += 1
        if (i >= to) return null
        val q = s.charAt(i)
        if (q != '"' && q != '\'') return null
        val e = s.indexOf(q, i + 1)
        if (e < 0 || e > to) return null
        if (an == name) return XmlEntities.decode(s.substring(i + 1, e))
        i = e + 1
      } // bare attribute without value: continue
    }
    null
  }

  def feedEntries(u: UTF8String): ArrayData = {
    if (u == null) return null
    val s = u.toString
    var i = if (s.nonEmpty && s.charAt(0) == '\uFEFF') 1 else 0
    i = skipMisc(s, i); if (i < 0) return null
    if (s.startsWith("<?xml", i)) {
      val e = s.indexOf("?>", i + 5)
      if (e < 0) return null
      i = skipMisc(s, e + 2); if (i < 0) return null
    }
    if (i >= s.length || s.charAt(i) != '<') return null
    val rootNe = nameEnd(s, i + 1)
    val root = localName(s.substring(i + 1, rootNe))
    val rootTe = tagEnd(s, rootNe)
    if (rootTe == null || rootTe._2) return null
    i = rootTe._1
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    root match {
      case "rss" =>
        // exactly one <channel>; other rss-level elements skipped
        var channelDone = false
        var closed = false
        while (!closed) {
          i = skipMisc(s, i); if (i < 0) return null
          if (i >= s.length) return null
          if (s.charAt(i) != '<') return null
          if (s.startsWith("</", i)) {
            val ne = nameEnd(s, i + 2)
            if (localName(s.substring(i + 2, ne)) != "rss") return null
            val te = tagEnd(s, ne); if (te == null) return null
            i = te._1; closed = true
          } else {
            val ne = nameEnd(s, i + 1)
            val el = localName(s.substring(i + 1, ne))
            val te = tagEnd(s, ne); if (te == null) return null
            i = te._1
            if (el == "channel" && !te._2) {
              if (channelDone) return null
              channelDone = true
              i = walkContainer(s, i, "channel", "item", "rss", out)
              if (i < 0) return null
            } else if (!te._2) {
              i = skipElement(s, i); if (i < 0) return null
            }
          }
        }
        if (!channelDone) return null
      case "feed" =>
        i = walkContainer(s, i, "feed", "entry", "atom", out)
        if (i < 0) return null
      case _ => return null
    }
    i = skipMisc(s, i)
    if (i < 0 || i != s.length) return null
    new GenericArrayData(out.toArray)
  }

  /** Walk a container's children, parsing `entryName` children as
    * entries; returns index past the container close or -1. */
  private def walkContainer(s: String, from: Int, container: String,
                            entryName: String, kind: String,
                            out: scala.collection.mutable.ArrayBuffer[Any]): Int = {
    var i = from
    while (true) {
      i = skipMisc(s, i); if (i < 0) return -1
      if (i >= s.length) return -1
      if (s.charAt(i) != '<') return -1
      if (s.startsWith("</", i)) {
        val ne = nameEnd(s, i + 2)
        if (localName(s.substring(i + 2, ne)) != container) return -1
        val te = tagEnd(s, ne)
        if (te == null || te._2) return -1
        return te._1
      }
      val ne = nameEnd(s, i + 1)
      val el = localName(s.substring(i + 1, ne))
      val te = tagEnd(s, ne); if (te == null) return -1
      i = te._1
      if (el == entryName && !te._2) {
        i = parseEntry(s, i, entryName, kind, out)
        if (i < 0) return -1
      } else if (!te._2) {
        i = skipElement(s, i); if (i < 0) return -1
      }
    }
    -1 // unreachable
  }

  private def parseEntry(s: String, from: Int, entryName: String,
                         kind: String,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Int = {
    var i = from
    var title: String = null
    var link: String = null
    var linkIsAlternate = false
    var date: String = null
    var datePublished: String = null
    var summary: String = null
    var closed = false
    while (!closed) {
      i = skipMisc(s, i); if (i < 0) return -1
      if (i >= s.length) return -1
      if (s.charAt(i) != '<') return -1
      if (s.startsWith("</", i)) {
        val ne = nameEnd(s, i + 2)
        if (localName(s.substring(i + 2, ne)) != entryName) return -1
        val te = tagEnd(s, ne)
        if (te == null || te._2) return -1
        i = te._1
        closed = true
      } else {
        val ne = nameEnd(s, i + 1)
        val el = localName(s.substring(i + 1, ne))
        val te = tagEnd(s, ne); if (te == null) return -1
        val attrFrom = ne
        val attrTo = te._1 - (if (te._2) 2 else 1)
        i = te._1
        def text(name: String): String = {
          val t = textUntilClose(s, i, name)
          if (t == null) null else { i = t._2; t._1 }
        }
        el match {
          case "title" if !te._2 =>
            val t = text("title"); if (t == null) return -1
            if (title == null) title = t
          case "link" if kind == "rss" && !te._2 =>
            val t = text("link"); if (t == null) return -1
            if (link == null) link = t
          case "link" if kind == "atom" =>
            val href = attr(s, attrFrom, attrTo, "href")
            val rel = attr(s, attrFrom, attrTo, "rel")
            val isAlt = rel == null || rel == "alternate"
            if (href != null && isAlt && (link == null || !linkIsAlternate)) {
              link = href
              linkIsAlternate = true
            } else if (href != null && link == null) link = href
            if (!te._2) { i = skipElement(s, i); if (i < 0) return -1 }
          case "pubdate" if kind == "rss" && !te._2 =>
            val t = text("pubdate"); if (t == null) return -1
            if (date == null) date = t
          case "updated" if kind == "atom" && !te._2 =>
            val t = text("updated"); if (t == null) return -1
            if (date == null) date = t
          case "published" if kind == "atom" && !te._2 =>
            val t = text("published"); if (t == null) return -1
            if (datePublished == null) datePublished = t
          case "description" if kind == "rss" && !te._2 =>
            val t = text("description"); if (t == null) return -1
            if (summary == null) summary = t
          case "summary" if kind == "atom" && !te._2 =>
            val t = text("summary"); if (t == null) return -1
            if (summary == null) summary = t
          case _ =>
            if (!te._2) { i = skipElement(s, i); if (i < 0) return -1 }
        }
      }
    }
    if (date == null) date = datePublished
    if (title == null && link == null) return -1
    if (out.length >= MaxEntries) return -1
    def u(x: String): UTF8String =
      if (x == null || x.isEmpty) null else UTF8String.fromString(x)
    out += new GenericInternalRow(Array[Any](
      UTF8String.fromString(kind), u(title), u(link), u(date), u(summary)))
    i
  }
}
