package graft.functions

/** The ONE entity decoder behind the XML/HTML kernels (round 15 — the
  * third private copy was the review trigger): the five predefined XML
  * entities plus numeric character references; `html = true` adds
  * `&nbsp;` (→ space) for the HTML table extractor. Unrecognized or
  * over-long entities pass through verbatim — crawled documents carry
  * raw ampersands despite every spec, and eating them would be silent
  * corruption. Used by [[TableKernels]], [[SitemapKernels]],
  * [[XlsxKernels]].
  */
object XmlEntities {

  def decode(t: String, html: Boolean = false): String = {
    if (t.indexOf('&') < 0) return t
    val sb = new StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '&') {
        val semi = t.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val rep: String = t.substring(i + 1, semi) match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" if html => " "
            case e if e.length > 2 && (e.startsWith("#x") || e.startsWith("#X")) =>
              try new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
              catch { case _: Exception => null }
            case e if e.length > 1 && e.charAt(0) == '#' =>
              try new String(Character.toChars(Integer.parseInt(e.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep == null) { sb.append(c); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
