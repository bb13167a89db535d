package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, JaroWinklerSimilarity}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity.
  *
  * The reference's fuzzy-match operator (Pentaho `FuzzyMatch`, see
  * /root/reference/motogp.ktr:3022-3152) scores candidate pairs with
  * Jaro-Winkler and keeps the single closest match. This is the textbook
  * algorithm: Jaro similarity (match window `max(|a|,|b|)/2 - 1`,
  * transpositions halved) plus the Winkler common-prefix bonus
  * (p = 0.1, prefix capped at 4, applied only when jaro > 0.7 — the same
  * convention DuckDB's `jaro_winkler_similarity` uses, which is what the
  * correctness oracle runs).
  */
object JaroWinkler {

  /** Codegen entry point — called from generated Java, must stay static. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.toString, b.toString)

  def sim(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val start = math.max(0, i - window)
      val end = math.min(i + window + 1, len2)
      var j = start
      var found = false
      while (j < end && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order
    var k = 0
    var trans = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / len1 + md / len2 + (md - trans / 2.0) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(len1, len2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + 0.1 * prefix * (1.0 - jaro)
  }

  /** Column API: `jaro_winkler(a, b): Double` in [0, 1]. */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftBridge.column(
      JaroWinklerSimilarity(GraftBridge.expression(a), GraftBridge.expression(b)))
}
