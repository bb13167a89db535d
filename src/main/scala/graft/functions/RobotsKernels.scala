package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Robots Exclusion Protocol (RFC 9309) — the politeness gate a crawl
  * pipeline applies between URL discovery and fetch, and retroactively
  * when a corpus must honor robots updates. Two kernels:
  *
  *  - [[parse]]: robots.txt → (agent, allow, pattern) rule rows. One
  *    pass over the lines: consecutive `User-agent:` lines open a
  *    group whose agents share the group's rules; `Allow:` /
  *    `Disallow:` lines attach to the open group (rules before any
  *    group are ignored, per RFC); `#` comments stripped; directive
  *    names and agent tokens case-insensitive (lowercased in the
  *    output); an EMPTY Disallow value is the traditional "allow all"
  *    and emits no rule; unknown directives (Sitemap, Crawl-delay) are
  *    skipped. Patterns are emitted verbatim (with `*`/`$`).
  *
  *  - [[matches]]: RFC 9309 path matching — `pattern` is a prefix
  *    match where `*` spans any octet sequence and a trailing `$`
  *    anchors the end. Iterative star-backtracking, O(path·stars)
  *    worst case on adversarial patterns, linear on real ones; never
  *    throws.
  *
  * Rule PRECEDENCE (most-specific wins: longest pattern, allow on
  * ties) is deliberately NOT in the kernel — it is one `max_by`
  * partial aggregation in [[graft.operators.Robots.filter]], where
  * Spark can do it scale-out.
  */
object RobotsKernels {

  /** One rule: lowercased agent token, allow?, verbatim pattern. */
  private def rule(agent: String, allow: Boolean, pattern: String): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(agent), allow, UTF8String.fromString(pattern)))

  def parse(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var agents = List.empty[String] // open group's agents
    var groupOpen = false           // last line was a user-agent line?
    val lines = s.toString.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val noComment = {
        val h = lines(i).indexOf('#')
        if (h < 0) lines(i) else lines(i).substring(0, h)
      }
      val colon = noComment.indexOf(':')
      if (colon > 0) {
        val name = noComment.substring(0, colon).trim.toLowerCase
        val value = noComment.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (value.nonEmpty) {
              // consecutive user-agent lines accumulate ONE group;
              // a user-agent after rules starts a NEW group
              agents = if (groupOpen) value.toLowerCase :: agents
                       else List(value.toLowerCase)
              groupOpen = true
            }
          case "allow" | "disallow" =>
            groupOpen = false
            val allow = name == "allow"
            // empty Disallow = allow everything (no rule); empty Allow
            // is equally vacuous
            if (value.nonEmpty && agents.nonEmpty)
              agents.reverse.foreach(a => out += rule(a, allow, value))
          case _ => // sitemap, crawl-delay, unknown: not rules
            groupOpen = false
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** `Crawl-delay:` directives with RFC 9309 group attribution
    * (round 14): one (agent, delay-seconds) row per agent token of the
    * group the directive sits in — the same accumulate-then-close
    * grouping as [[parse]]. Non-numeric, negative, or absurd (> 1 day)
    * values are skipped: a malformed politeness hint must not become a
    * fetch-forever schedule. Crawl-delay is not in RFC 9309 but is the
    * de-facto politeness contract large crawls honor. */
  def crawlDelays(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var agents = List.empty[String]
    var groupOpen = false
    val lines = s.toString.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val noComment = {
        val h = lines(i).indexOf('#')
        if (h < 0) lines(i) else lines(i).substring(0, h)
      }
      val colon = noComment.indexOf(':')
      if (colon > 0) {
        val name = noComment.substring(0, colon).trim.toLowerCase
        val value = noComment.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (value.nonEmpty) {
              agents = if (groupOpen) value.toLowerCase :: agents
                       else List(value.toLowerCase)
              groupOpen = true
            }
          case "crawl-delay" =>
            groupOpen = false
            val d = value.toDoubleOption.getOrElse(-1.0)
            if (d >= 0.0 && d <= 86400.0 && agents.nonEmpty)
              agents.reverse.foreach(a => out += new GenericInternalRow(
                Array[Any](UTF8String.fromString(a), d)))
          case _ =>
            groupOpen = false
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** `Sitemap:` URLs of a robots.txt, in file order — group-independent
    * per RFC 9309 §2.3 (a sitemap line belongs to no group), comments
    * stripped, values verbatim. The crawl-discovery companion of
    * [[parse]]. */
  def sitemaps(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    s.toString.split("\n", -1).foreach { line0 =>
      val line = {
        val h = line0.indexOf('#')
        if (h < 0) line0 else line0.substring(0, h)
      }
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += UTF8String.fromString(v)
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** RFC 9309 match: does `pattern` (with `*` wildcards and an
    * optional trailing `$` anchor) match a prefix of `path`? */
  def matches(pathU: UTF8String, patternU: UTF8String): Boolean = {
    val path = pathU.toString
    var pat = patternU.toString
    var anchored = false
    if (pat.endsWith("$")) { anchored = true; pat = pat.substring(0, pat.length - 1) }
    // iterative glob: p over pattern, t over path, star backtracking
    var p = 0
    var t = 0
    var starP = -1
    var starT = -1
    while (t < path.length) {
      if (p < pat.length && (pat.charAt(p) == path.charAt(t))) { p += 1; t += 1 }
      else if (p < pat.length && pat.charAt(p) == '*') { starP = p; p += 1; starT = t }
      else if (starP >= 0) { p = starP + 1; starT += 1; t = starT }
      else return if (anchored) false else p == pat.length
      if (p == pat.length && !anchored) return true
    }
    // path exhausted: remaining pattern must be stars
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }
}
