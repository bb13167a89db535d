package graft.functions

/** Bit kernels for data-layout keys (Z-order / Morton curves). */
object LayoutKernels {

  /** Spread the low 32 bits of `v` into the even bit positions of a
    * long (the standard Morton dilation ladder).
    */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 2-D Morton (Z-order) key of two 32-bit ints, order-preserving as a
    * SIGNED long: each input's sign bit is flipped before dilation
    * (mapping signed order onto unsigned order) and the interleaved
    * key's top bit is flipped back, so `ORDER BY` on the key walks the
    * curve exactly. Monotone in each coordinate with the other fixed.
    */
  def morton2(a: Int, b: Int): Long = {
    val ua = (a ^ Int.MinValue).toLong & 0xFFFFFFFFL
    val ub = (b ^ Int.MinValue).toLong & 0xFFFFFFFFL
    (spread(ua) | (spread(ub) << 1)) ^ Long.MinValue
  }

  /** Compact the even bit positions of `x` back into 32 contiguous
    * bits — [[spread]]'s inverse ladder.
    */
  private def compact(x0: Long): Long = {
    var x = x0 & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Inverse of [[morton2]]: the (a, b) coordinates a key encodes —
    * what a skipping analyzer uses to turn a file's [minKey, maxKey]
    * back into the rectangle it covers.
    */
  def unmorton2(z: Long): (Int, Int) = {
    val u = z ^ Long.MinValue
    val a = compact(u).toInt ^ Int.MinValue
    val b = compact(u >>> 1).toInt ^ Int.MinValue
    (a, b)
  }

  /** N-dimensional Morton key over BUCKET coordinates: each of the k
    * values occupies 64/k interleaved bits (bit j of dim i lands at
    * position j·k + i). Inputs are expected in [0, 2^(64/k)) — column
    * values are rank/bucket/epoch-day-reduced by the caller first, the
    * way production Z-ordering does — and out-of-range values SATURATE
    * to the edge buckets (order-preserving, never wrapping). The result
    * is non-negative, so signed `ORDER BY` walks the curve. k = 2 with
    * full-width inputs wants [[morton2]] instead.
    */
  def mortonN(vals: org.apache.spark.sql.catalyst.util.ArrayData,
              k: Int): Long = {
    val bits = 64 / k
    val max = (1L << bits) - 1
    var out = 0L
    var i = 0
    while (i < k) {
      // NULL coordinates sort first (bucket 0) — the nulls-first layout
      val raw = if (vals.isNullAt(i)) 0L else vals.getInt(i).toLong
      val v = if (raw < 0) 0L else if (raw > max) max else raw
      var j = 0
      while (j < bits) {
        out |= ((v >>> j) & 1L) << (j * k + i)
        j += 1
      }
      i += 1
    }
    out
  }
}
