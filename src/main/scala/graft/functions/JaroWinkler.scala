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

  // ---- thresholded-join pruning kernels (round 12) -------------------
  //
  // For pairs with JW >= tau the Jaro core obeys two provable bounds
  // (sim() above: window matching, m <= min lengths, Winkler bonus
  // <= 0.4·(1−J), so JW <= 0.4 + 0.6·J):
  //   J >= jmin := (tau − 0.4)/0.6
  //   (length ratio)  min(L1,L2)/max(L1,L2) >= r := 3·jmin − 2
  //   (char overlap)  |bag(s1) ∩ bag(s2)| >= m >= (3·jmin − 1)·L1L2/(L1+L2)
  // Both only bite for tau > 0.8 (r > 0) — the enforced contract of
  // FuzzyMatch.thresholdJoin.

  /** Length band with INTEGER boundaries c₀=1, c_{k+1} = ⌊c_k/r⌋ + 2:
    * any pair with ratio >= r lands in adjacent-or-equal bands
    * (c_{k+1} > c_k/r strictly, so r·c_{k+1} > c_k survives any float
    * rounding of the division — a float `floor(log len / log(1/r))`
    * band can split an exact-ratio pair by 2 at a boundary). len 0
    * gets band −1: an empty string pairs only with another empty
    * (JW = 1) and must meet nothing else.
    *
    * Per-row cost (ADVICE r12): the boundary walk is memoized per `r`
    * — `r` is a plan-time constant, so the first row pays the walk and
    * every later row binary-searches the cached boundary array,
    * O(log #bands). The boundary COUNT is itself bounded: each step
    * adds >= 2 AND multiplies by >= 1/r, so there are at most
    * ~2r/(1−r) linear-regime boundaries before geometric growth takes
    * over — even tau = 0.9999 over megabyte strings yields tens of
    * thousands of boundaries, never O(len/2) per row. */
  def lengthBand(len: Int, r: Double): Int = {
    if (len <= 0) return -1
    val bounds = boundsCovering(len, r)
    val idx = java.util.Arrays.binarySearch(bounds, len.toLong)
    if (idx >= 0) idx else -idx - 2 // greatest k with c_k <= len
  }

  /** Reference walk (the original per-row loop) — kept as the oracle the
    * memoized path is spec-pinned against. */
  private[graft] def lengthBandWalk(len: Int, r: Double): Int = {
    if (len <= 0) return -1
    var c = 1L
    var k = 0
    var next = math.floor(c / r).toLong + 2
    while (len >= next) { c = next; k += 1; next = math.floor(c / r).toLong + 2 }
    k
  }

  private val bandBounds =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Double, Array[Long]]()

  /** The boundary array c₀..c_K for `r`, extended (and re-cached) until
    * its last element EXCEEDS `len` — so the binary search above always
    * has the full prefix it needs. A racing put of a shorter array is
    * benign: every cached array is a correct boundary prefix, and each
    * call re-checks coverage for its own `len`. */
  private def boundsCovering(len: Int, r: Double): Array[Long] = {
    val key = java.lang.Double.valueOf(r)
    var b = bandBounds.get(key)
    if (b == null || b(b.length - 1) <= len) {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      if (b == null) buf += 1L else buf ++= b
      var c = buf.last
      while (c <= len) { c = math.floor(c / r).toLong + 2; buf += c }
      b = buf.toArray
      bandBounds.put(key, b)
    }
    b
  }

  /** Prefix-filter signature: the lowered string's chars with
    * occurrence tags ((char << 16) | occ — multiset-as-set, the PPJoin
    * device), truncated to the first L − o + 1 entries where
    * o = ⌈frac·L⌉ is this row's worst-case required overlap
    * (frac = (3·jmin−1)·r/(1+r): the pair bound minimized over legal
    * partner lengths [r·L, L/r], so o never exceeds any real pair's
    * bound and the prefix lemma applies — two strings with overlap
    * >= o MUST share a signature entry). The lemma holds for ANY total
    * order applied consistently to both sides; which order decides how
    * well the prefix PRUNES. Round 12 used raw char order — and the
    * smallest code points (space, digits) are among the most COMMON in
    * real text, so every value's prefix carried the corpus's most
    * frequent entries and collapsed into a handful of giant buckets
    * (FuzzySkewScale measured candidates ≈ brute force on hash-word
    * values: the space char sat in every prefix). Round 13 orders
    * entries by a SCRAMBLED char key (char · 40503 mod 2¹⁶ — odd
    * multiplier, a bijection, decided at the code level so both join
    * sides always agree) then occurrence: prefix membership is now
    * uncorrelated with char frequency — the data-blind approximation
    * of PPJoin's rare-first ordering, costing nothing at plan time (a
    * corpus-frequency order would need a statistics pass). The STORED
    * entry encoding is unchanged; only which entries survive
    * truncation moved. The 1e-9 slack keeps a float product from
    * rounding o past the true ceiling (a smaller o just lengthens the
    * prefix: sound). Empty string → sentinel [−1] (meets only the
    * other empties' sentinel). */
  def signature(s: UTF8String, frac: Double): Array[Long] = {
    val str = s.toString
    val n = str.length
    if (n == 0) return Array(-1L)
    val chars = str.toCharArray
    // sort by the scrambled key; runs of one char stay adjacent (the
    // scramble is injective on chars), so occurrence tags assign within
    // runs exactly as before
    val keys = new Array[Int](n)
    var i = 0
    while (i < n) { keys(i) = scramble(chars(i)); i += 1 }
    java.util.Arrays.sort(keys)
    var o = math.ceil(frac * n - 1e-9).toInt
    if (o < 1) o = 1
    val sigLen = n - o + 1
    if (sigLen <= 0) return Array.empty[Long]
    val out = new Array[Long](sigLen)
    i = 0
    var occ = 0
    while (i < sigLen) {
      if (i > 0 && keys(i) == keys(i - 1)) occ += 1 else occ = 0
      out(i) = (unscramble(keys(i)).toLong << 16) | occ.toLong
      i += 1
    }
    out
  }

  /** Odd-multiplier bijection on the 16-bit char space — the signature
    * truncation order. 40503 · 30599 ≡ 1 (mod 2¹⁶). */
  @inline private def scramble(c: Char): Int = (c * 40503) & 0xffff
  @inline private def unscramble(k: Int): Char = ((k * 30599) & 0xffff).toChar

  /** Codegen entry points (UTF-16 length, matching sim()'s units). */
  def lengthBandOf(s: UTF8String, r: Double): Int =
    lengthBand(s.toString.length, r)
  def signatureData(s: UTF8String, frac: Double)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(signature(s, frac))

  def fuzzy_length_band(s: Column, r: Double): Column =
    GraftBridge.column(
      org.apache.spark.sql.FuzzyLengthBand(GraftBridge.expression(s), r))

  def fuzzy_signature(s: Column, frac: Double): Column =
    GraftBridge.column(
      org.apache.spark.sql.FuzzySignature(GraftBridge.expression(s), frac))
}
