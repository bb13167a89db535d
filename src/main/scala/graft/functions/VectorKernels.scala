package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Static vector-math kernels behind the Catalyst expressions in
  * `org.apache.spark.sql.GraftExpressions`. All operate on
  * `array<double>` (callers cast `array<float>` up — exact). Loops sum
  * sequentially left-to-right, matching both the previous
  * `aggregate`/`zip_with` column formulation and DuckDB's list kernels,
  * so oracle comparisons at round(·, 6) are stable.
  */
object VectorKernels {

  /** Null elements are data corruption in an embedding column — fail
    * loudly (a clear message beating a silent 0.0 contribution). */
  private def checkNoNulls(a: ArrayData, op: String): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$op: null element at index $i of a vector — embeddings must be dense")
      i += 1
    }
  }

  /** Mismatched lengths are data corruption (mixed-dimension embeddings),
    * not a truncation request — silently summing over min(len) would
    * yield plausible wrong similarities. Fail loudly. */
  private def checkSameDim(a: ArrayData, b: ArrayData, op: String): Unit =
    if (a.numElements() != b.numElements()) throw new IllegalArgumentException(
      s"$op: vector dimensions differ (${a.numElements()} vs ${b.numElements()}) — " +
        "embeddings compared pairwise must share one dimension")

  def dot(a: ArrayData, b: ArrayData): Double = {
    checkNoNulls(a, "vector_dot"); checkNoNulls(b, "vector_dot")
    checkSameDim(a, b, "vector_dot")
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** cosine = dot/(||a||·||b||); defined as 0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    checkNoNulls(a, "vector_cosine"); checkNoNulls(b, "vector_cosine")
    checkSameDim(a, b, "vector_cosine")
    val n = a.numElements()
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  /** Unit-length copy; the zero vector passes through unchanged. */
  def l2Normalize(a: ArrayData): ArrayData = {
    checkNoNulls(a, "vector_l2_normalize")
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getDouble(i); out(i) = v; s += v * v; i += 1 }
    val norm = math.sqrt(s)
    if (norm != 0.0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Ids (1-based positions in `centroids`) of the `n` centroids with
    * the highest dot product against `vec`, in descending-dot order,
    * ties to the smaller centroid id. One tight primitive pass — the
    * higher-order-function formulation (`transform` + `array_sort` over
    * an array-of-structs literal) runs interpreted per element, which
    * dominates the IVF hot path (every corpus row evaluates this).
    * Selection is O(n·C) — C (centroid count) is small by design.
    */
  def topCentroids(vec: ArrayData, centroids: Array[Array[Double]], n: Int): ArrayData = {
    checkNoNulls(vec, "top_centroids")
    val c = centroids.length
    val dots = new Array[Double](c)
    var i = 0
    while (i < c) {
      val cv = centroids(i)
      if (vec.numElements() != cv.length) throw new IllegalArgumentException(
        s"top_centroids: vector dimensions differ (${vec.numElements()} vs ${cv.length})")
      var s = 0.0
      var j = 0
      while (j < cv.length) { s += vec.getDouble(j) * cv(j); j += 1 }
      dots(i) = s
      i += 1
    }
    val k = math.min(n, c)
    val out = new Array[Long](k)
    val used = new Array[Boolean](c)
    var r = 0
    while (r < k) {
      var best = -1
      var m = 0
      while (m < c) {
        if (!used(m) && (best < 0 || dots(m) > dots(best))) best = m
        m += 1
      }
      used(best) = true
      out(r) = best + 1L
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Random-hyperplane LSH bucket: sign bits of `nBits` projections.
    * Hyperplane component h(b, i) is derived from chained xxh64 exactly
    * like the previous column formulation
    * (`xxhash64(lit(seed), lit(b), i)` = hashLong(i, hashLong(b,
    * hashLong(seed, 42)))) mapped to [-1, 1].
    */
  def lshBucket(vec: ArrayData, nBits: Int, seed: Long): Long = {
    checkNoNulls(vec, "vector_lsh_bucket")
    val n = vec.numElements()
    val hSeed = XXH64.hashLong(seed, 42L)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      val hb = XXH64.hashLong(b.toLong, hSeed)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashLong(i.toLong, hb)
        proj += vec.getDouble(i) * (h.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** Σ vals(idx(i)) over a long index array — the classifier's
    * fixed-point dot product with binary presence features: the
    * occupied-bucket set selects pre-quantized weight slots, and long
    * addition is exact under any order. An out-of-range index is a
    * broken bucket contract (buckets come from pmod), not data — fail
    * loudly. Lives here (not an interpreted `aggregate` lambda) so
    * the per-row hot loop stays inside whole-stage codegen: measured
    * at sf0.1, the HOF version made each training iteration ~6× the
    * bare job floor. */
  /** Exact dot product of two quantized (long) vectors — at micro
    * quantization each term is ≤ ~1.5·10¹², a 64-dim sum ≤ ~10¹⁴:
    * exact in long with 4 decimal orders to spare. Cosine thresholds
    * built on this stay integer-exact (compare dot²·den² ≥ num²·‖a‖²‖b‖²
    * in decimals) — no float accumulation anywhere. */
  def dotLongs(a: ArrayData, b: ArrayData): Long = {
    checkNoNulls(a, "dot_longs"); checkNoNulls(b, "dot_longs")
    checkSameDim(a, b, "dot_longs")
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Minimum squared distance to any centroid in the list — the
    * farthest-first-init companion of [[argminSqDist]], same exact-long
    * arithmetic and bounds. */
  def minSqDist(vec: ArrayData, cents: ArrayData): Long = {
    checkNoNulls(vec, "min_sq_dist")
    val k = cents.numElements()
    if (k == 0) throw new IllegalArgumentException(
      "min_sq_dist: empty centroid list")
    val d = vec.numElements()
    var bestDist = Long.MaxValue
    var c = 0
    while (c < k) {
      if (cents.isNullAt(c)) throw new IllegalArgumentException(
        s"min_sq_dist: null centroid $c")
      val cent = cents.getArray(c)
      if (cent.numElements() != d) throw new IllegalArgumentException(
        s"min_sq_dist: centroid $c has dim ${cent.numElements()}, vector has $d")
      var dist = 0L
      var i = 0
      while (i < d) {
        val diff = vec.getLong(i) - cent.getLong(i)
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) bestDist = dist
      c += 1
    }
    bestDist
  }

  /** Argmin-by-squared-distance over a list of quantized centroids:
    * returns the index (centroid id) minimizing Σ_d (v_d − c_d)², ties
    * to the LOWEST id — a total order, so assignment is deterministic.
    * All arithmetic is long-exact: micro-quantized components are
    * ≤ ~2·10⁶, so a 64-dim squared distance tops out near 2.6·10¹⁴.
    * Codegen-friendly static kernel for the same reason as
    * [[sumIndexed]]: this runs once per row per k-means iteration. */
  def argminSqDist(vec: ArrayData, cents: ArrayData): Long = {
    checkNoNulls(vec, "argmin_sq_dist")
    val k = cents.numElements()
    if (k == 0) throw new IllegalArgumentException(
      "argmin_sq_dist: empty centroid list")
    val d = vec.numElements()
    var best = 0L
    var bestDist = Long.MaxValue
    var c = 0
    while (c < k) {
      if (cents.isNullAt(c)) throw new IllegalArgumentException(
        s"argmin_sq_dist: null centroid $c")
      val cent = cents.getArray(c)
      if (cent.numElements() != d) throw new IllegalArgumentException(
        s"argmin_sq_dist: centroid $c has dim ${cent.numElements()}, vector has $d")
      var dist = 0L
      var i = 0
      while (i < d) {
        val diff = vec.getLong(i) - cent.getLong(i)
        dist += diff * diff
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c.toLong }
      c += 1
    }
    best
  }

  def sumIndexed(idx: ArrayData, vals: ArrayData): Long = {
    checkNoNulls(idx, "sum_indexed"); checkNoNulls(vals, "sum_indexed")
    val n = idx.numElements()
    val m = vals.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val j = idx.getLong(i)
      if (j < 0 || j >= m) throw new IllegalArgumentException(
        s"sum_indexed: index $j outside the $m-slot value array")
      acc += vals.getLong(j.toInt)
      i += 1
    }
    acc
  }

  // ---- IVF-PQ kernels (round 12) --------------------------------------

  private def checkCid(cid: Long, n: Int, op: String): Int = {
    if (cid < 1 || cid > n) throw new IllegalArgumentException(
      s"$op: centroid id $cid outside 1..$n — ids come from top_centroids")
    (cid - 1).toInt
  }

  /** vec − centroids(cid−1): the IVF residual a product quantizer
    * codes. Fails loudly on a dim mismatch or out-of-range id. */
  def centroidResidual(vec: ArrayData, cid: Long,
                       centroids: Array[Array[Double]]): ArrayData = {
    checkNoNulls(vec, "centroid_residual")
    val c = centroids(checkCid(cid, centroids.length, "centroid_residual"))
    val n = vec.numElements()
    if (n != c.length) throw new IllegalArgumentException(
      s"centroid_residual: vector dimensions differ ($n vs ${c.length})")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = vec.getDouble(i) - c(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** dot(vec, centroids(cid−1)) — the q·c_list term of the IVF-PQ
    * asymmetric score. */
  def centroidDot(vec: ArrayData, cid: Long,
                  centroids: Array[Array[Double]]): Double = {
    checkNoNulls(vec, "centroid_dot")
    val c = centroids(checkCid(cid, centroids.length, "centroid_dot"))
    val n = vec.numElements()
    if (n != c.length) throw new IllegalArgumentException(
      s"centroid_dot: vector dimensions differ ($n vs ${c.length})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += vec.getDouble(i) * c(i); i += 1 }
    acc
  }

  /** PQ encode: the 1-based code of the nearest codeword per subspace
    * (M codes out, one per `codebooks(m)`). "Nearest" is min L2,
    * computed as argmax of dot(x_m, w) − ½·dot(w, w) — the ||x||² term
    * is constant per subvector, so the argmax is identical, and the
    * oracle replays this exact expression — ties to the smaller code.
    * Codebook subspaces must tile the vector exactly. */
  def pqEncode(vec: ArrayData,
               codebooks: Array[Array[Array[Double]]]): ArrayData = {
    checkNoNulls(vec, "pq_encode")
    val m = codebooks.length
    var dims = 0
    var mi = 0
    while (mi < m) { dims += codebooks(mi)(0).length; mi += 1 }
    if (vec.numElements() != dims) throw new IllegalArgumentException(
      s"pq_encode: vector dim ${vec.numElements()} != codebook tiling $dims")
    val out = new Array[Long](m)
    var off = 0
    mi = 0
    while (mi < m) {
      val book = codebooks(mi)
      val sub = book(0).length
      var best = -1
      var bestS = 0.0
      var c = 0
      while (c < book.length) {
        val w = book(c)
        var dotXW = 0.0
        var dotWW = 0.0
        var j = 0
        while (j < sub) {
          val wj = w(j)
          dotXW += vec.getDouble(off + j) * wj
          dotWW += wj * wj
          j += 1
        }
        val s = dotXW - 0.5 * dotWW
        if (best < 0 || s > bestS) { best = c; bestS = s }
        c += 1
      }
      out(mi) = best + 1L
      off += sub
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC lookup table for one query: tab(m·nCodes + c−1) =
    * dot(q_sub(m), codebooks(m)(c−1)), flattened over uniform-width
    * codebooks. Computed ONCE per query row; every candidate then
    * scores in O(M) via [[pqAdc]] instead of O(dim). */
  def pqQueryTable(vec: ArrayData,
                   codebooks: Array[Array[Array[Double]]]): ArrayData = {
    checkNoNulls(vec, "pq_query_table")
    val m = codebooks.length
    val nCodes = codebooks(0).length
    var dims = 0
    var mi = 0
    while (mi < m) {
      if (codebooks(mi).length != nCodes) throw new IllegalArgumentException(
        "pq_query_table: ragged codebooks — every subspace must carry the same code count")
      dims += codebooks(mi)(0).length
      mi += 1
    }
    if (vec.numElements() != dims) throw new IllegalArgumentException(
      s"pq_query_table: vector dim ${vec.numElements()} != codebook tiling $dims")
    val out = new Array[Double](m * nCodes)
    var off = 0
    mi = 0
    while (mi < m) {
      val book = codebooks(mi)
      val sub = book(0).length
      var c = 0
      while (c < nCodes) {
        val w = book(c)
        var acc = 0.0
        var j = 0
        while (j < sub) { acc += vec.getDouble(off + j) * w(j); j += 1 }
        out(mi * nCodes + c) = acc
        c += 1
      }
      off += sub
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Σ_m tab(m·nCodes + codes(m)−1): the O(M) asymmetric-distance
    * lookup — approx q·residual from a candidate's PQ codes and the
    * query's [[pqQueryTable]]. Out-of-range codes are a broken index
    * contract, not data: fail loudly. */
  def pqAdc(tab: ArrayData, codes: ArrayData, nCodes: Int): Double = {
    checkNoNulls(tab, "pq_adc"); checkNoNulls(codes, "pq_adc")
    val m = codes.numElements()
    if (m * nCodes != tab.numElements()) throw new IllegalArgumentException(
      s"pq_adc: table of ${tab.numElements()} slots does not tile $m subspaces × $nCodes codes")
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val c = codes.getLong(mi)
      if (c < 1 || c > nCodes) throw new IllegalArgumentException(
        s"pq_adc: code $c outside 1..$nCodes at subspace $mi")
      acc += tab.getDouble(mi * nCodes + (c - 1).toInt)
      mi += 1
    }
    acc
  }

  /** SQ8 encode: per-dimension affine quantization to one unsigned
    * byte — code_i = clamp(floor((x_i − min_i)·255/span_i + 0.5)),
    * span ≤ 0 (constant dimension) → 0. The arithmetic is written in
    * exactly the order the DuckDB oracle replays it, so codes are
    * bit-identical across engines. 4× the PQ tier's fidelity knob: 64
    * bytes per 64-d vector instead of 4 PQ codes or 256 raw-float
    * bytes. */
  def sq8Encode(vec: ArrayData, mins: Array[Double],
                spans: Array[Double]): Array[Byte] = {
    checkNoNulls(vec, "sq8_encode")
    val d = mins.length
    if (vec.numElements() != d) throw new IllegalArgumentException(
      s"sq8_encode: vector dim ${vec.numElements()} != trained dim $d")
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val x = vec.getDouble(i)
      val c =
        if (spans(i) <= 0.0) 0.0
        else math.floor((x - mins(i)) * 255.0 / spans(i) + 0.5)
      out(i) = (if (c < 0.0) 0 else if (c > 255.0) 255 else c.toInt).toByte
      i += 1
    }
    out
  }

  /** SQ8 decode: x̂_i = min_i + (code_i · span_i) / 255 — the exact
    * inverse-affine the oracle replays. */
  def sq8Decode(codes: Array[Byte], mins: Array[Double],
                spans: Array[Double]): ArrayData = {
    val d = mins.length
    if (codes.length != d) throw new IllegalArgumentException(
      s"sq8_decode: code length ${codes.length} != trained dim $d")
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      out(i) = mins(i) + ((codes(i) & 0xff).toDouble * spans(i)) / 255.0
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
