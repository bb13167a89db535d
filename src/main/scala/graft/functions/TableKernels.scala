package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** HTML table extraction (round 14) — the structured-data companion
  * of the WET-style text strip: `<table>` content as flat
  * (table, row, col, text) cells, the shape table-QA / tabular-corpus
  * pipelines consume.
  *
  * Semantics (a tag state machine, not a DOM):
  *  - tables are numbered by `<table>` OPEN order (document order);
  *    nested tables get their own numbers and their text lands in
  *    THEIR cells, never the enclosing cell's;
  *  - `<tr>` starts a row, `<td>`/`<th>` start a cell; the optional
  *    closing tags HTML allows to be omitted are handled by
  *    auto-closing (a new cell closes the previous one, a new row
  *    closes the open cell and row);
  *  - cell text is entity-decoded, whitespace-collapsed, trimmed;
  *    `<script>`/`<style>` content and comments never leak in;
  *    markup inside a cell (links, spans, line breaks) contributes
  *    its text;
  *  - fail-closed: a document that ends with an unclosed table (a
  *    truncated crawl) is NULL — a half-row must be visible, never
  *    silently half-ingested. A document with NO tables is an empty
  *    array (a fact, not a failure).
  */
object TableKernels {

  import org.apache.spark.sql.types._
  val cellSchema: StructType = StructType(Seq(
    StructField("table", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def decodeEntities(t: String): String =
    XmlEntities.decode(t, html = true)

  private def collapse(t: String): String = {
    val sb = new StringBuilder(t.length)
    var i = 0
    var pendingSpace = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = sb.nonEmpty
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private final class Table(val index: Int) {
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var row = -1
    var col = -1
    var cell: StringBuilder = null
    def closeCell(): Unit = if (cell != null) {
      cells += ((row, col, collapse(decodeEntities(cell.toString))))
      cell = null
    }
    def startRow(): Unit = { closeCell(); row += 1; col = -1 }
    def startCell(): Unit = {
      closeCell()
      if (row < 0) row = 0 // lenient: a td before any tr opens row 0
      col += 1
      cell = new StringBuilder
    }
  }

  /** Case-insensitive indexOf via regionMatches — no per-call copy of the
    * haystack. ASCII-folding is exactly what HTML tag names need. */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val last = s.length - needle.length
    var j = math.max(from, 0)
    while (j <= last) {
      if (s.regionMatches(true, j, needle, 0, needle.length)) return j
      j += 1
    }
    -1
  }

  def tables(u: UTF8String): ArrayData = {
    if (u == null) return null
    val s = u.toString
    val stack = scala.collection.mutable.ArrayBuffer.empty[Table]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var nextIndex = 0
    var i = 0
    val n = s.length
    def tagNameEnd(from: Int): Int = {
      var j = from
      while (j < n && (s.charAt(j).isLetterOrDigit)) j += 1
      j
    }
    def tagEnd(from: Int): Int = { // index past '>', quotes honored; -1 EOF
      var j = from
      while (j < n) {
        val c = s.charAt(j)
        if (c == '"' || c == '\'') {
          val e = s.indexOf(c, j + 1)
          if (e < 0) return -1
          j = e + 1
        } else if (c == '>') return j + 1
        else j += 1
      }
      -1
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/')) {
          val closing = s.charAt(i + 1) == '/'
          val nameStart = if (closing) i + 2 else i + 1
          val ne = tagNameEnd(nameStart)
          val name = s.substring(nameStart, ne).toLowerCase
          val te = tagEnd(ne)
          if (te < 0) i = n
          else {
            i = te
            name match {
              case "script" | "style" if !closing =>
                // regionMatches, not s.toLowerCase.indexOf: lowercasing the
                // whole document per script tag is O(n²) time + allocation
                // on script-heavy crawled pages (ADVICE r14).
                val close = s"</$name"
                val e = indexOfIgnoreCase(s, close, i)
                i = if (e < 0) n else {
                  val t2 = tagEnd(e + close.length)
                  if (t2 < 0) n else t2
                }
              case "table" if !closing =>
                stack += new Table(nextIndex); nextIndex += 1
              case "table" if closing =>
                if (stack.isEmpty) return null // stray close: malformed
                val t = stack.remove(stack.length - 1)
                t.closeCell()
                t.cells.foreach { case (r, cl, txt) =>
                  out += new GenericInternalRow(Array[Any](
                    t.index, r, cl, UTF8String.fromString(txt)))
                }
              case "tr" if !closing && stack.nonEmpty =>
                stack.last.startRow()
              case "td" | "th" if !closing && stack.nonEmpty =>
                stack.last.startCell()
              case "td" | "th" | "tr" if closing && stack.nonEmpty =>
                stack.last.closeCell()
              case _ => () // any other markup: transparent to cell text
            }
          }
        } else { // bare '<' as text
          if (stack.nonEmpty && stack.last.cell != null) stack.last.cell.append(c)
          i += 1
        }
      } else {
        if (stack.nonEmpty && stack.last.cell != null) stack.last.cell.append(c)
        i += 1
      }
    }
    if (stack.nonEmpty) return null // truncated: unclosed table
    // document order of cells: sort by (table, row, col) — nested
    // tables close before their parents, so emission order is inner
    // first; the sort restores the numbering order
    val sorted = out.sortBy { r =>
      val g = r.asInstanceOf[GenericInternalRow]
      (g.getInt(0), g.getInt(1), g.getInt(2))
    }
    new GenericArrayData(sorted.toArray)
  }
}
