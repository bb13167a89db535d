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
}
