package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring matcher — the blocklist/termlist
  * primitive of a training-data pipeline: screening every document
  * against hundreds-to-thousands of fixed terms (contamination strings,
  * unsafe-content lists, PII trigger words) in ONE pass over the text.
  * The alternatives do not survive corpus scale: N `contains` calls
  * re-scan the document N times, and a regex alternation of thousands
  * of terms compiles into a pathological NFA.
  *
  * Standard construction (Aho & Corasick 1975): a trie over the
  * patterns' UTF-8 bytes, breadth-first failure links, outputs folded
  * through the dictionary-suffix chain, and the failure function
  * resolved into a dense byte-level DFA — matching is then exactly one
  * table lookup per input byte, independent of pattern count, with no
  * backtracking. Byte-level matching over UTF-8 is exact for substring
  * search: a pattern's byte sequence occurs iff its character sequence
  * does (UTF-8 is self-synchronizing for whole-sequence containment).
  *
  * The automaton is built ONCE at plan time on the driver and shipped
  * to executors inside the (broadcast) task binary — per-row work never
  * touches construction. Memory is nodes × 256 ints (dense DFA):
  * ~1 MB per 1k characters of pattern text. For blocklists far beyond
  * ~100k characters, swap the dense rows for sparse maps before
  * shipping; the match loop is the same.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
  require(patterns.forall(p => p != null && p.nonEmpty),
    "AhoCorasick patterns must be non-null and non-empty")
  require(patterns.distinct.length == patterns.length,
    "AhoCorasick patterns must be distinct (duplicates would double-report)")

  // dfa(s)(byte) -> next state; outputs(s) -> pattern ids whose match
  // ends at s, INCLUDING dictionary suffixes ("at" must be reported
  // inside "batch" even while the automaton is mid-way through "batch")
  private val (dfa, outputs) = {
    val pats = patterns.map(_.getBytes(StandardCharsets.UTF_8))
    val next = Array.fill(pats.map(_.length).sum + 1, 256)(-1)
    val ends = Array.fill(next.length)(List.empty[Int])
    var nNodes = 1
    for ((p, pid) <- pats.zipWithIndex) {
      var s = 0
      for (b <- p) {
        val c = b & 0xff
        if (next(s)(c) == -1) { next(s)(c) = nNodes; nNodes += 1 }
        s = next(s)(c)
      }
      ends(s) ::= pid
    }
    val fail = new Array[Int](nNodes)
    val queue = new java.util.ArrayDeque[Integer]()
    var c = 0
    while (c < 256) {
      val s = next(0)(c)
      if (s == -1) next(0)(c) = 0 else { fail(s) = 0; queue.add(s) }
      c += 1
    }
    while (!queue.isEmpty) {
      val s: Int = queue.poll()
      ends(s) = ends(s) ++ ends(fail(s))
      var c = 0
      while (c < 256) {
        val t = next(s)(c)
        if (t == -1) next(s)(c) = next(fail(s))(c)
        else { fail(t) = next(fail(s))(c); queue.add(t) }
        c += 1
      }
    }
    (Array.tabulate(nNodes)(next(_)), Array.tabulate(nNodes)(ends(_).toArray.sorted))
  }

  /** Distinct matched patterns, in pattern-declaration order, as the
    * array the [[org.apache.spark.sql.MultiMatch]] expression returns.
    * One DFA step per byte; early exit once every pattern has matched.
    */
  def matchedTerms(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val seen = new java.util.BitSet(patterns.length)
    var found = 0
    var s = 0
    var i = 0
    while (i < bytes.length && found < patterns.length) {
      s = dfa(s)(bytes(i) & 0xff)
      val os = outputs(s)
      var j = 0
      while (j < os.length) {
        if (!seen.get(os(j))) { seen.set(os(j)); found += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Any](found)
    var pid = seen.nextSetBit(0)
    var k = 0
    while (pid >= 0) {
      // ids ascend in declaration order, so the bitset walk IS the order
      res(k) = UTF8String.fromString(patterns(pid))
      k += 1
      pid = seen.nextSetBit(pid + 1)
    }
    new GenericArrayData(res)
  }
}
