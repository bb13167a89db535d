package graft

import graft.functions.{RasterKernels, WebpKernels}
import org.scalatest.funsuite.AnyFunSuite

/** [[WebpKernels]] — VP8L lossless decode. No reference WebP codec
  * exists in this container (and none is fetchable), so unlike
  * ZstdSpec/BrotliSpec the pins are (a) HAND-BUILT micro-streams with
  * hand-computed expected pixels for each bitstream feature — LZ77
  * with the short-distance map, color cache, and all four transforms
  * — and (b) encoder round-trips through [[WebpKernels.encodeLossless]]
  * (normal prefix codes incl. the code-length code). The class doc of
  * WebpKernels records this validation gap honestly.
  */
class WebpSpec extends AnyFunSuite {

  // ---- tiny LSB-first writer mirroring the spec conventions -------
  private final class W {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nb = 0
    def put(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << nb
      nb += n
      while (nb >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nb -= 8 }
    }
    /** prefix-code bits are read MSB-of-code-first. */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((c >>> i) & 1, 1); i -= 1 }
    }
    def riff(): Array[Byte] = {
      if (nb > 0) { out.write((acc & 0xff).toInt); acc = 0; nb = 0 }
      val p = out.toByteArray
      val o = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
        o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff) }
      o.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + p.length + (p.length & 1))
      o.write("WEBP".getBytes("US-ASCII")); o.write("VP8L".getBytes("US-ASCII"))
      le32(p.length); o.write(p); if ((p.length & 1) == 1) o.write(0)
      o.toByteArray
    }
    def header(w: Int, h: Int): Unit = {
      put(0x2f, 8); put(w - 1, 14); put(h - 1, 14); put(0, 1); put(0, 3)
    }
    /** simple prefix code with the given symbols (1 or 2, 8-bit). */
    def simpleCode(syms: Int*): Unit = {
      put(1, 1); put(syms.size - 1, 1); put(1, 1); put(syms.head, 8)
      if (syms.size == 2) put(syms(1), 8)
    }
  }

  private def pixelsOf(b: Array[Byte], w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    val sink = new RasterKernels.PixelSink {
      def begin(ww: Int, hh: Int): Boolean = { assert(ww == w && hh == h); true }
      def add(x: Int, y: Int, r: Int, g: Int, bl: Int): Unit =
        px(y * w + x) = (r << 16) | (g << 8) | bl
    }
    assert(WebpKernels.decode(b, sink).isDefined, "decode refused")
    px
  }

  private def rgb(r: Int, g: Int, b: Int) = (r << 16) | (g << 8) | b

  test("hand-built: literals + LZ77 copy with short-distance plane " +
    "code 1 (the row above)") {
    // 4x2; green/blue/alpha constant (one-symbol codes read 0 bits);
    // red alternates via a 2-symbol code; row 2 = LZ77 len 4, plane 1
    val w = new W
    w.header(4, 2)
    w.put(0, 1) // no transforms
    w.put(0, 1) // no cache
    w.put(0, 1) // no meta
    // green needs symbol 259 (length-code 3 -> len 4): beyond the
    // 8-bit simple-code range, so a normal code with lengths {1,1}
    writeNormalCode(w, 256 + 24, Map(7 -> 1, 259 -> 1))
    w.simpleCode(10, 20)       // red: 10 / 20
    w.simpleCode(5)            // blue: 5
    w.simpleCode(0xff)         // alpha: ff
    w.simpleCode(0)            // distance: prefix 0 (value 1 -> plane 1)
    // canonical 1-bit codes: smaller symbol = 0
    // literals: (g=7,r=10) (7,10) (7,20) (7,20)
    w.code(0, 1); w.code(0, 1)
    w.code(0, 1); w.code(0, 1)
    w.code(0, 1); w.code(1, 1)
    w.code(0, 1); w.code(1, 1)
    // LZ77: green symbol 259 (code 1), no length extra (3<4),
    // distance symbol (0 bits), no distance extra (0<4)
    w.code(1, 1)
    val px = pixelsOf(w.riff(), 4, 2)
    val row = Array(rgb(10, 7, 5), rgb(10, 7, 5), rgb(20, 7, 5), rgb(20, 7, 5))
    assert(px.take(4).sameElements(row), px.map(_.toHexString).mkString(","))
    assert(px.drop(4).sameElements(row), "copied row differs")
  }

  test("hand-built: color cache round-trip (hash slot per the " +
    "0x1e35a7bd multiplier)") {
    // 3x1: literal P, literal Q, then a cache reference to P's slot.
    // cacheBits=4 so the two pixels land in distinct slots.
    val cacheBits = 4
    val p = 0xff0a0705 // a=ff r=0a g=07 b=05
    val q = 0xff141e28
    def slot(v: Int) = (0x1e35a7bd * v) >>> (32 - cacheBits)
    assert(slot(p) != slot(q), "fixture needs distinct slots")
    val w = new W
    w.header(3, 1)
    w.put(0, 1)              // no transforms
    w.put(1, 1); w.put(cacheBits, 4) // color cache
    w.put(0, 1)              // no meta
    // green alphabet 256+24+16: literals 7 and 30, cache sym 280+slot(p)
    val cacheSym = 256 + 24 + slot(p)
    // three symbols -> need a normal code; use lengths {1,2,2}
    // canonical: 7 -> len1 code 0; 30 -> len2 code 10; cacheSym -> len2 code 11
    val syms = Seq(7 -> 1, 30 -> 2, cacheSym -> 2)
    writeNormalCode(w, 256 + 24 + (1 << cacheBits), syms.toMap)
    w.simpleCode(0x0a, 0x14) // red 10/20
    w.simpleCode(0x05, 0x28) // blue 5/40
    w.simpleCode(0xff)       // alpha
    w.simpleCode(0)          // distance (unused)
    // literal P: green 7 (code 0), red 10 (code 0), blue 5 (code 0)
    w.code(0, 1); w.code(0, 1); w.code(0, 1)
    // literal Q: green 30 (code 10), red 20 (1), blue 40 (1)
    w.code(2, 2); w.code(1, 1); w.code(1, 1)
    // cache ref to P
    w.code(3, 2)
    val px = pixelsOf(w.riff(), 3, 1)
    assert(px(0) == (p & 0xffffff) && px(1) == (q & 0xffffff))
    assert(px(2) == (p & 0xffffff), "cache reference did not return P")
  }

  /** Emit a normal prefix code whose USED symbols have the given
    * lengths (all other lengths 0), lengths coded literally. */
  private def writeNormalCode(w: W, alphabet: Int,
                              symLens: Map[Int, Int]): Unit = {
    w.put(0, 1) // normal
    // code-length-code: used length values + 0 runs via symbol 18/17
    // keep it simple: give cl symbols {0,17,18} ∪ used-lens 3-bit
    // lengths forming a canonical code we can hand-drive.
    // cl lengths: 0->2, 17->2, 18->2, len1->3, len2->3 (Kraft: 3*1/4+2*1/8=1)
    val clLens = Map(0 -> 2, 17 -> 2, 18 -> 2, 1 -> 3, 2 -> 3)
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
      12, 13, 14, 15)
    val needed = 19
    w.put(needed - 4, 4)
    order.foreach(s => w.put(clLens.getOrElse(s, 0), 3))
    w.put(0, 1) // no max-symbol cap
    // canonical cl codes: len2: {0,17,18} -> 00,01,10; len3: {1,2} -> 110,111
    val clCode = Map(0 -> (0, 2), 17 -> (1, 2), 18 -> (2, 2),
      1 -> (6, 3), 2 -> (7, 3))
    def emitCl(sym: Int): Unit = { val (c, l) = clCode(sym); w.code(c, l) }
    // walk the alphabet emitting lens; compress zero runs with 17/18
    var i = 0
    val sorted = symLens.keys.toSeq.sorted
    def zeros(n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        if (n >= 11) { val take = math.min(n, 138); emitCl(18); w.put(take - 11, 7); n -= take }
        else if (n >= 3) { val take = math.min(n, 10); emitCl(17); w.put(take - 3, 3); n -= take }
        else { emitCl(0); n -= 1 }
      }
    }
    sorted.foreach { s =>
      zeros(s - i)
      emitCl(symLens(s))
      i = s + 1
    }
    // trailing zeros are implicit (decoder fills to alphabet end only
    // via max_symbol; without the cap we must emit them)
    zeros(alphabet - i)
  }

  test("hand-built: SUBTRACT_GREEN inverse adds green to red and blue") {
    val w = new W
    w.header(2, 1)
    w.put(1, 1); w.put(2, 2) // transform: subtract-green
    w.put(0, 1)              // no more transforms
    w.put(0, 1)              // no cache
    w.put(0, 1)              // no meta
    w.simpleCode(100)        // green 100
    w.simpleCode(10, 250)    // red residuals
    w.simpleCode(5)          // blue residual
    w.simpleCode(0xff)
    w.simpleCode(0)
    w.code(0, 1) // pixel 1: red 10
    w.code(1, 1) // pixel 2: red 250
    val px = pixelsOf(w.riff(), 2, 1)
    // r' = (res + g) & 0xff, b' = (res + g) & 0xff
    assert(px(0) == rgb((10 + 100) & 0xff, 100, (5 + 100) & 0xff))
    assert(px(1) == rgb((250 + 100) & 0xff, 100, (5 + 100) & 0xff))
  }

  test("hand-built: PREDICTOR transform (mode 2 = top) reconstructs " +
    "down columns; first row/column rules hold") {
    // 2x2, block bits 2 (one block), mode 2 (T). Residual pixels all
    // (a=0,r=1,g=1,b=1). Reconstruction:
    //  (0,0): pred black ff000000 -> ff010101
    //  (1,0): first row -> pred L  -> ff020202
    //  (0,1): first col -> pred T  -> ff020202
    //  (1,1): mode 2 (T=ff020202)  -> ff030303
    val w = new W
    w.header(2, 2)
    w.put(1, 1); w.put(0, 2)  // transform: predictor
    w.put(2 - 2, 3)           // size_bits=2 -> put(0,3)
    // sub-image 1x1: mode pixel green=2
    w.put(0, 1)               // sub: no cache
    w.simpleCode(2)           // sub green = 2
    w.simpleCode(0)           // sub red
    w.simpleCode(0)           // sub blue
    w.simpleCode(0)           // sub alpha
    w.simpleCode(0)           // sub distance
    w.put(0, 1)               // main: no more transforms
    w.put(0, 1)               // main: no cache
    w.put(0, 1)               // main: no meta
    w.simpleCode(1)           // green residual 1
    w.simpleCode(1)           // red residual 1
    w.simpleCode(1)           // blue residual 1
    w.simpleCode(1)           // alpha residual 1
    w.simpleCode(0)
    // all codes are single-symbol: zero data bits for 4 pixels
    val px = pixelsOf(w.riff(), 2, 2)
    assert(px(0) == rgb(1, 1, 1), px(0).toHexString)
    assert(px(1) == rgb(2, 2, 2), px(1).toHexString)
    assert(px(2) == rgb(2, 2, 2), px(2).toHexString)
    assert(px(3) == rgb(3, 3, 3), px(3).toHexString)
  }

  test("hand-built: COLOR_INDEXING with 2-entry delta-coded palette " +
    "and 1-bit packing") {
    // width 8, palette {red, blue}: packed width 1, each packed
    // pixel's green holds 8 one-bit indices LSB-first: 0b01010101
    val w = new W
    w.header(8, 1)
    w.put(1, 1); w.put(3, 2)  // transform: color indexing
    w.put(2 - 1, 8)           // palette size 2
    // palette image 2x1, DELTA coded: p0 = ffff0000 (red),
    // p1 = p0 + delta; we want blue ff0000ff -> delta per channel:
    // a 0, r -ff (=01? (0x00 - 0xff)&0xff = 0x01), g 0, b ff
    w.put(0, 1)               // palette sub: no cache
    w.simpleCode(0)           // greens 0
    w.simpleCode(0xff, 0x01)  // red: ff then 01
    w.simpleCode(0x00, 0xff)  // blue: 00 then ff
    w.simpleCode(0xff, 0x00)  // alpha: ff then 00
    w.simpleCode(0)
    // bit order per pixel: green(0 bits) red blue alpha; canonical
    // 1-bit codes give the SMALLER symbol value code 0:
    //  red {0x01,0xff}: 01->0 ff->1; blue {0x00,0xff}: 00->0 ff->1;
    //  alpha {0x00,0xff}: 00->0 ff->1
    w.code(1, 1); w.code(0, 1); w.code(1, 1) // px0: r=ff b=00 a=ff
    w.code(0, 1); w.code(1, 1); w.code(0, 1) // px1: r=01 b=ff a=00
    w.put(0, 1)               // main: no more transforms
    w.put(0, 1)               // no cache
    w.put(0, 1)               // no meta
    w.simpleCode(0xAA)        // packed indices 10101010 (LSB-first:
                              // leftmost pixel in the LEAST bits -> red first)
    w.simpleCode(0)           // red of packed px
    w.simpleCode(0)           // blue
    w.simpleCode(0xff)        // alpha
    w.simpleCode(0)
    val px = pixelsOf(w.riff(), 8, 1)
    val red = rgb(0xff, 0, 0); val blue = rgb(0, 0, 0xff)
    assert(px.sameElements(Array(red, blue, red, blue, red, blue, red, blue)),
      px.map(_.toHexString).mkString(","))
  }

  test("hand-built: COLOR transform inverse applies the signed 3.5 " +
    "fixed-point cross-color deltas") {
    // 1x1, color transform, one block. cte: green_to_red=0x40 (blue
    // channel), green_to_blue=0x20 (green), red_to_blue=0x10 (red).
    // residual: g=64, r=10, b=10.
    //  r' = 10 + (0x40*64)>>5 = 10 + (64*64)>>5 = 10+128 = 138
    //  b' = 10 + (0x20*64)>>5 + (0x10*138as signed byte)>>5
    //     0x10=16; 138 as signed byte = -118; (16*-118)>>5 = -1888>>5 = -59
    //     (0x20=32; (32*64)>>5 = 64) -> 10+64-59 = 15
    val w = new W
    w.header(1, 1)
    w.put(1, 1); w.put(1, 2)  // transform: color
    w.put(0, 3)               // size_bits=2
    w.put(0, 1)               // sub: no cache
    w.simpleCode(0x20)        // sub green = green_to_blue
    w.simpleCode(0x10)        // sub red = red_to_blue
    w.simpleCode(0x40)        // sub blue = green_to_red
    w.simpleCode(0)           // sub alpha
    w.simpleCode(0)
    w.put(0, 1)               // main: no more transforms
    w.put(0, 1); w.put(0, 1)  // no cache, no meta
    w.simpleCode(64)          // green
    w.simpleCode(10)          // red residual
    w.simpleCode(10)          // blue residual
    w.simpleCode(0xff)
    w.simpleCode(0)
    val px = pixelsOf(w.riff(), 1, 1)
    assert(px(0) == rgb(138, 64, 15), px(0).toHexString)
  }

  test("encoder round-trips: gradients, random RGB, flat, 1x1, " +
    "non-square — normal prefix codes with literal cl coding") {
    val rnd = new scala.util.Random(0x8b)
    val shapes = Seq(
      (1, 1), (9, 8), (16, 16), (31, 7), (64, 48))
    for ((w, h) <- shapes) {
      val grad = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        0xff000000 | ((x * 255 / math.max(1, w - 1)) << 16) |
          (((x + y) * 13 % 256) << 8) | (y * 255 / math.max(1, h - 1))
      }
      val rndImg = Array.fill(w * h)(0xff000000 | rnd.nextInt(1 << 24))
      val flat = Array.fill(w * h)(0xff336699)
      for (img <- Seq(grad, rndImg, flat)) {
        val enc = WebpKernels.encodeLossless(w, h, img)
        val px = pixelsOf(enc, w, h)
        assert(px.zip(img).forall { case (a, b) => a == (b & 0xffffff) },
          s"${w}x$h roundtrip mismatch")
        val r = WebpKernels.decode(enc).get
        assert(r.width == w && r.height == h)
      }
    }
  }

  test("dhash64 + image features route webp through the pixel sink") {
    val w = 32; val h = 24
    val img = Array.tabulate(w * h) { i =>
      val x = i % w
      0xff000000 | ((x * 8) << 16) | ((x * 8) << 8) | (x * 8)
    }
    val enc = WebpKernels.encodeLossless(w, h, img)
    val dh = graft.functions.PHashKernels.dhash64(enc)
    assert(dh != null)
    // a horizontal gradient brightens left->right: every dhash bit set
    assert(dh.longValue == -1L, dh.longValue.toHexString)
    val r = WebpKernels.decode(enc).get
    assert(math.abs(r.meanR - (0 until w).map(_ * 8).sum / w.toDouble) < 1e-9)
  }

  test("fail-closed: lossy VP8 refuses, truncation/garbage never throw") {
    val img = Array.fill(64)(0xff102030)
    val enc = WebpKernels.encodeLossless(8, 8, img)
    // strict prefixes of the MEANINGFUL content must refuse; an
    // odd-length VP8L chunk carries a RIFF pad byte whose loss is
    // semantically invisible, so iterate to the payload end only
    val vp8lSize = (enc(16) & 0xff) | ((enc(17) & 0xff) << 8) |
      ((enc(18) & 0xff) << 16) | ((enc(19) & 0xff) << 24)
    var cut = 1
    while (cut < 20 + vp8lSize) {
      assert(WebpKernels.decode(java.util.Arrays.copyOf(enc, cut)).isEmpty,
        s"prefix $cut accepted")
      cut += 1
    }
    val rnd = new scala.util.Random(0x11)
    for (_ <- 0 until 400) {
      val m = enc.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WebpKernels.decode(m) // may be None or garbage, must not throw
    }
    for (_ <- 0 until 400) {
      WebpKernels.decode(Array.fill[Byte](rnd.nextInt(100))(rnd.nextInt(256).toByte))
    }
    // lossy VP8 container: triage-only, decode refuses
    val lossy = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](20, 0, 0, 0) ++ "WEBPVP8 ".getBytes("US-ASCII") ++
      Array[Byte](8, 0, 0, 0) ++ new Array[Byte](8)
    assert(WebpKernels.decode(lossy).isEmpty)
    assert(WebpKernels.decode(null).isEmpty)
    assert(WebpKernels.decode(Array.emptyByteArray).isEmpty)
  }
}
