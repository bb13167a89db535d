package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) kernel — the shift-resilient sibling
  * of the fixed-window chunkers. Fixed-size or token-window chunks
  * ([[TextKernels.chunkTokens]]) break under insertion: one added
  * sentence shifts every later window, so a 99%-identical pair of
  * documents shares ZERO fixed chunks. CDC places boundaries where the
  * CONTENT says so — a rolling hash of the trailing few code points —
  * so an edit perturbs only the chunks it touches and the remainder
  * re-aligns, which is what makes chunk-fingerprint dedup work on
  * edited/recrawled corpora (the LBFS "anchor" idea; FastCDC is the
  * modern gear-hash formulation of the same contract).
  *
  * This variant is deliberately RESET-FREE: the boundary test looks at
  * low `maskBits` bits of a gear hash rolled with `h = (h << 1) + G`,
  * so bit k of `h` only ever mixes the trailing `maskBits - k` gear
  * values — a candidate position depends on exactly the `maskBits`
  * code points before it and nothing else. Boundaries are therefore a
  * property of the TEXT, not of the walk (no per-chunk hash reset), and
  * with `minLen >= maskBits` the greedy min/max walk below consumes a
  * globally fixed candidate set. That is the property the shift-
  * resilience tests pin AND what makes the whole operator replayable as
  * plain SQL window arithmetic (see `OracleSqlGen.cdcCandidates`).
  *
  * Scale shape: boundary detection is one O(code points) narrow pass
  * per document inside whole-stage codegen; everything downstream
  * (substring, md5 fingerprint, explode) is built-in expressions. The
  * only corpus-wide traffic a chunk-dedup pass needs is the exploded
  * (fingerprint, doc_id, length) triple — never the content.
  */
object CdcKernels {

  /** splitmix64 finalizer (Steele/Lea/Flood, public domain via JDK
    * `SplittableRandom`) — derives the gear table from its index so the
    * table is an algorithm constant both engines can reproduce, not a
    * baked-in blob of magic numbers.
    */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 256-entry gear table indexed by `codePoint & 0xFF`. Masking to the
    * low byte keeps the classic byte-indexed gear-table shape (FastCDC
    * ships a fixed 256-entry table too) while accepting any code point.
    */
  val Gear: Array[Long] = Array.tabulate(256)(b => splitmix64(b.toLong))

  /** Chunk END offsets (1-based, exclusive, in CODE POINTS — the unit
    * Spark `substring` and DuckDB `substr` agree on) of the greedy
    * min/max walk over the candidate set:
    *
    *  - candidate at position i (i >= maskBits) iff the low `maskBits`
    *    bits of the rolled gear hash are zero there (expected gap
    *    2^maskBits code points);
    *  - from `start`, the chunk ends at the first candidate in
    *    [start+minLen, start+maxLen], else is force-cut at
    *    start+maxLen (clamped to the text end).
    *
    * Every chunk but the last has length in [minLen, maxLen]; the last
    * may be shorter. Empty text yields an empty array; concatenating
    * the chunks reproduces the text exactly (the partition law the spec
    * pins). Callers must keep `minLen >= maskBits` — the expression
    * constructor enforces it — so no candidate can look back across its
    * own chunk start and the reset-free equivalence above holds.
    */
  def boundaries(s: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): ArrayData = {
    val str = s.toString
    val mask = (1L << maskBits) - 1

    // one rolling pass: collect candidate end offsets
    var cands = new Array[Int](16)
    var nc = 0
    var h = 0L
    var cp = 0 // 1-based code-point offset after increment
    var i = 0  // char (UTF-16) index
    while (i < str.length) {
      val c = str.codePointAt(i)
      h = (h << 1) + Gear(c & 0xFF)
      cp += 1
      if (cp >= maskBits && (h & mask) == 0L) {
        if (nc == cands.length) cands = java.util.Arrays.copyOf(cands, nc * 2)
        cands(nc) = cp
        nc += 1
      }
      i += Character.charCount(c)
    }
    val n = cp

    // greedy walk: candidates are consumed left to right exactly once
    val ends = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var ci = 0
    while (start < n) {
      val limit = math.min(start + maxLen, n)
      val lo = start + minLen
      while (ci < nc && cands(ci) < lo) ci += 1
      val end = if (ci < nc && cands(ci) <= limit) cands(ci) else limit
      ends += end
      start = end
    }
    new GenericArrayData(ends.toArray)
  }
}
