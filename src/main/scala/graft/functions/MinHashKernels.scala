package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind [[org.apache.spark.sql.ShingleHashes64]] and
  * [[org.apache.spark.sql.MinHashes]] — called from generated Java, so
  * they must stay public static with primitive-friendly signatures.
  */
object MinHashKernels {

  private final val Seed = 42L

  /** Distinct, sorted 64-bit hashes of the n-char shingles of `s`.
    * Single pass over the UTF-8 bytes: char start offsets are computed
    * once, each window hashed directly from the byte buffer.
    * Strings of <= n chars hash whole (so short docs still participate).
    */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val numBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val numChars = s.numChars()
    if (numChars <= n)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUnsafeBytes(base, off, numBytes, Seed)))

    // byte offset of each char start (+ end sentinel), one linear walk
    val offs = new Array[Int](numChars + 1)
    var c = 0
    var p = 0
    while (p < numBytes) {
      offs(c) = p
      p += UTF8String.numBytesForFirstByte(org.apache.spark.unsafe.Platform.getByte(base, off + p))
      c += 1
    }
    offs(numChars) = numBytes

    val m = numChars - n + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = XXH64.hashUnsafeBytes(
        base, off + offs(i), offs(i + n) - offs(i), Seed)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) hashes else java.util.Arrays.copyOf(hashes, w))
  }

  /** Exact Jaccard of two sorted-distinct long arrays (the
    * [[shingleHashes]] representation): one linear merge, no per-row
    * hash-set construction (which is what `array_intersect` +
    * `array_union` cost per candidate pair).
    */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); val m = b.numElements()
    var c = 0
    while (c < n) {
      if (a.isNullAt(c)) throw new IllegalArgumentException(
        s"sorted_jaccard: null element at index $c — shingle-hash arrays must be dense")
      c += 1
    }
    c = 0
    while (c < m) {
      if (b.isNullAt(c)) throw new IllegalArgumentException(
        s"sorted_jaccard: null element at index $c — shingle-hash arrays must be dense")
      c += 1
    }
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val va = a.getLong(i); val vb = b.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** K MinHash family members: member k = min_h xxh64(h, seed=k). */
  def minHashes(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var kk = 0
      while (kk < k) {
        val m = XXH64.hashLong(h, kk)
        if (m < mins(kk)) mins(kk) = m
        kk += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
