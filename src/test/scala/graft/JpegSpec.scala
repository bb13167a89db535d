package graft

import graft.functions.{JpegKernels, RasterKernels}
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the baseline JPEG decoder. A test-only ENCODER (general bit
  * packing, byte stuffing, standard Annex K Huffman tables, DC
  * prediction, restart markers) produces streams from chosen QUANTIZED
  * COEFFICIENTS, and an independent reference reconstruction (direct
  * O(64^2) IDCT double loop — deliberately not the kernel's separable
  * form) computes the expected means. So the decoder is checked against
  * the T.81 math, not against itself.
  */
object JpegEnc {
  // Annex K tables (public ITU-T T.81 specification constants)
  val DcBits: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcVals: Array[Int] = (0 to 11).toArray
  val AcBits: Array[Int] = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** symbol -> (code, length) from a canonical bits/vals table. */
  def codes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        out += vals(k) -> ((code, l))
        code += 1
        k += 1
      }
      code <<= 1
    }
    out.result()
  }

  final class BitWriter {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          buf += acc.toByte
          if (acc == 0xff) buf += 0x00.toByte // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** Encode one quantized block (natural order); returns new DC pred. */
  def encodeBlock(w: BitWriter, coef: Array[Int], pred: Int,
                  dc: Map[Int, (Int, Int)], ac: Map[Int, (Int, Int)]): Int = {
    val diff = coef(0) - pred
    val t = category(diff)
    val (c, l) = dc(t)
    w.put(c, l)
    if (t > 0) w.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (zc, zl) = ac(0xf0); w.put(zc, zl); run -= 16 }
        val s = category(v)
        val (rc, rl) = ac((run << 4) | s)
        w.put(rc, rl)
        w.put(if (v < 0) v + (1 << s) - 1 else v, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = ac(0x00); w.put(ec, el) }
    pred + diff
  }

  def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++
      payload

  def dqt(tq: Int, table: Array[Int]): Array[Byte] =
    seg(0xdb, Array(tq.toByte) ++ table.map(_.toByte))

  def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
    seg(0xc4, Array(((tc << 4) | th).toByte) ++ bits.map(_.toByte) ++
      vals.map(_.toByte))

  /** Full baseline JPEG from per-component quantized coefficient
    * suppliers `blocks(ci)(bx, by)` (natural order; block coords in the
    * component's own grid). */
  def encode(width: Int, height: Int, sampling: Seq[(Int, Int)],
             qt: Array[Int], blocks: Int => (Int, Int) => Array[Int],
             restartInterval: Int = 0): Array[Byte] = {
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val nf = sampling.length
    val sof = Array(8.toByte, (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte, nf.toByte) ++
      sampling.zipWithIndex.flatMap { case ((h, v), i) =>
        Array((i + 1).toByte, ((h << 4) | v).toByte, 0.toByte) }
    val sos = Array(nf.toByte) ++
      (1 to nf).flatMap(i => Array(i.toByte, 0.toByte)) ++
      Array(0.toByte, 63.toByte, 0.toByte)
    val dcC = codes(DcBits, DcVals)
    val acC = codes(AcBits, AcVals)
    val w = new BitWriter
    val preds = new Array[Int](nf)
    val body = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var rst = 0
    for (mcu <- 0 until mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        w.flushWithOnes()
        body ++= w.buf
        w.buf.clear()
        body += 0xff.toByte
        body += (0xd0 + rst % 8).toByte
        rst += 1
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      for (ci <- 0 until nf; by <- 0 until sampling(ci)._2;
           bx <- 0 until sampling(ci)._1)
        preds(ci) = encodeBlock(w,
          blocks(ci)(mx * sampling(ci)._1 + bx, my * sampling(ci)._2 + by),
          preds(ci), dcC, acC)
    }
    w.flushWithOnes()
    body ++= w.buf
    val dri = if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8).toByte,
        (restartInterval & 0xff).toByte))
    else Array.empty[Byte]
    Array(0xff.toByte, 0xd8.toByte) ++
      dqt(0, qt) ++
      dht(0, 0, DcBits, DcVals) ++ dht(1, 0, AcBits, AcVals) ++
      dri ++
      seg(0xc0, sof) ++ seg(0xda, sos) ++
      body.toArray ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  // ---- independent reference reconstruction (direct IDCT sum) ----

  /** The DQT payload is ZIGZAG-ordered (T.81 B.2.4.1) — the natural-
    * order multiplier for position n is payload(invZigzag(n)), i.e.
    * qtNat(Zigzag(k)) = payload(k). The reference applies the spec
    * rule so the decoder is checked against T.81, not against a
    * convention the encoder and decoder could share by accident. */
  def unzigzag(payload: Array[Int]): Array[Int] = {
    val nat = new Array[Int](64)
    for (k <- 0 until 64) nat(Zigzag(k)) = payload(k)
    nat
  }

  def refBlockPixels(coefQuantized: Array[Int], qtPayload: Array[Int]): Array[Int] = {
    val qt = unzigzag(qtPayload)
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) math.sqrt(0.5) else 1.0
        val cv = if (v == 0) math.sqrt(0.5) else 1.0
        s += cu * cv / 4.0 * coefQuantized(v * 8 + u) * qt(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val r = math.round(s + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, r))
    }
    out
  }

  /** Expected means: reconstruct full planes per component, then apply
    * the kernel's documented nearest upsampling + JFIF conversion. */
  def refMeans(width: Int, height: Int, sampling: Seq[(Int, Int)],
               qt: Array[Int],
               blocks: Int => (Int, Int) => Array[Int]): (Double, Double, Double) = {
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planes = sampling.map { case (h, v) =>
      Array.ofDim[Int](mcusY * v * 8, mcusX * h * 8)
    }
    for (ci <- sampling.indices; by <- 0 until mcusY * sampling(ci)._2;
         bx <- 0 until mcusX * sampling(ci)._1) {
      val px = refBlockPixels(blocks(ci)(bx, by), qt)
      for (y <- 0 until 8; x <- 0 until 8)
        planes(ci)(by * 8 + y)(bx * 8 + x) = px(y * 8 + x)
    }
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    for (y <- 0 until height; x <- 0 until width) {
      val yy = planes(0)(y * sampling(0)._2 / vMax)(x * sampling(0)._1 / hMax)
      if (sampling.length == 1) { sr += yy; sg += yy; sb += yy }
      else {
        val cb = planes(1)(y * sampling(1)._2 / vMax)(x * sampling(1)._1 / hMax) - 128
        val cr = planes(2)(y * sampling(2)._2 / vMax)(x * sampling(2)._1 / hMax) - 128
        def cl(v: Long) = math.max(0L, math.min(255L, v)).toDouble
        sr += cl(math.round(yy + 1.402 * cr))
        sg += cl(math.round(yy - 0.344136 * cb - 0.714136 * cr))
        sb += cl(math.round(yy + 1.772 * cb))
      }
    }
    val n = width.toDouble * height.toDouble
    (sr / n, sg / n, sb / n)
  }
}

class JpegSpec extends AnyFunSuite {
  import JpegEnc._

  private val flatQt = Array.fill(64)(8)

  private def dcOnly(dc: Int): Array[Int] = {
    val a = new Array[Int](64); a(0) = dc; a
  }

  test("flat gray single MCU: DC-only block decodes to exactly 128 + dc") {
    // qt(0)=8 and IDCT of a pure-DC block is D/8, so pixel = 128 + dc
    for (dc <- Seq(-63, -5, 0, 7, 32, 63)) {
      val bytes = encode(8, 8, Seq((1, 1)), flatQt, _ => (_, _) => dcOnly(dc))
      val r = JpegKernels.decode(bytes).get
      assert(r.width == 8 && r.height == 8)
      val want = math.max(0, math.min(255, 128 + dc)).toDouble
      assert(r.meanR == want && r.meanG == want && r.meanB == want)
    }
  }

  test("multi-MCU gray with DC prediction and non-multiple-of-8 crop") {
    // 20x11 -> 3x2 MCU grid; per-block DC varies, so both the DC
    // predictor chain and the real-area crop must be right
    def blk(bx: Int, by: Int) = dcOnly(3 * bx - 5 * by + 11)
    val bytes = encode(20, 11, Seq((1, 1)), flatQt, _ => blk)
    val r = JpegKernels.decode(bytes).get
    assert(r.width == 20 && r.height == 11)
    val (er, eg, eb) = refMeans(20, 11, Seq((1, 1)), flatQt, _ => blk)
    assert(r.meanR == er && r.meanG == eg && r.meanB == eb)
  }

  test("AC coefficients, ZRL runs, and a non-flat quant table") {
    val qt = Array.tabulate(64)(i => 1 + (i * 7) % 16)
    def blk(bx: Int, by: Int): Array[Int] = {
      val a = new Array[Int](64)
      a(0) = 40 + bx - by
      a(1) = -7; a(8) = 5; a(17) = 3
      a(63) = 2 // forces a >16-zero run -> ZRL path
      a
    }
    val bytes = encode(16, 16, Seq((1, 1)), qt, _ => blk)
    val r = JpegKernels.decode(bytes).get
    val (er, eg, eb) = refMeans(16, 16, Seq((1, 1)), qt, _ => blk)
    assert(r.meanR == er && r.meanG == eg && r.meanB == eb)
  }

  test("3-component 4:4:4 color: JFIF conversion against the reference") {
    def blocks(ci: Int) = (_: Int, _: Int) =>
      dcOnly(Seq(20, -9, 14)(ci)) // Y=148, Cb=119, Cr=142 flat
    val bytes = encode(8, 8, Seq((1, 1), (1, 1), (1, 1)), flatQt, blocks)
    val r = JpegKernels.decode(bytes).get
    val (er, eg, eb) = refMeans(8, 8, Seq((1, 1), (1, 1), (1, 1)), flatQt, blocks)
    assert(r.meanR == er && r.meanG == eg && r.meanB == eb)
    assert(r.meanR != r.meanG) // chroma actually moved the channels
  }

  test("4:2:0 subsampling: four luma blocks per MCU, nearest upsample") {
    val sampling = Seq((2, 2), (1, 1), (1, 1))
    def blocks(ci: Int) = (bx: Int, by: Int) =>
      if (ci == 0) dcOnly(10 + 6 * bx + 2 * by) else dcOnly(if (ci == 1) -4 else 9)
    val bytes = encode(24, 16, sampling, flatQt, blocks)
    val r = JpegKernels.decode(bytes).get
    assert(r.width == 24 && r.height == 16)
    val (er, eg, eb) = refMeans(24, 16, sampling, flatQt, blocks)
    assert(r.meanR == er && r.meanG == eg && r.meanB == eb)
  }

  test("restart markers reset DC prediction") {
    def blk(bx: Int, by: Int) = dcOnly(15 + 4 * bx + by)
    val bytes = encode(32, 8, Seq((1, 1)), flatQt, _ => blk, restartInterval = 2)
    val r = JpegKernels.decode(bytes).get
    val (er, _, _) = refMeans(32, 8, Seq((1, 1)), flatQt, _ => blk)
    assert(r.meanR == er)
  }

  test("0xFF fill bytes before restart markers decode (T.81 B.1.1.2)") {
    // the standard permits any run of 0xFF fill bytes ahead of a
    // marker; resync() used to demand the RST start exactly at pos,
    // so a legal padded restart stream decoded to NULL
    def blk(bx: Int, by: Int) = dcOnly(15 + 4 * bx + by)
    val bytes = encode(32, 8, Seq((1, 1)), flatQt, _ => blk, restartInterval = 2)
    val plain = JpegKernels.decode(bytes).get
    val padded = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < bytes.length) {
      if (i + 1 < bytes.length && (bytes(i) & 0xff) == 0xff &&
          (bytes(i + 1) & 0xff) >= 0xd0 && (bytes(i + 1) & 0xff) <= 0xd7) {
        padded += 0xff.toByte; padded += 0xff.toByte // two fill bytes
      }
      padded += bytes(i); i += 1
    }
    assert(padded.length > bytes.length, "fixture carries no RST markers")
    assert(JpegKernels.decode(padded.toArray).contains(plain))
  }

  test("DQT is zigzag-ordered (T.81 B.2.4.1): non-flat table, clamped block") {
    // payload (zigzag order): element 2 -> natural position 8 (coef 1,0).
    // Round 11: the kernel stored the payload verbatim and indexed it
    // naturally — invisible under flat tables, a shuffled multiplier for
    // any real encoder's table. The clamp makes the mean sensitive: the
    // spec dequant (100) clips at 255, the misread (16) never clamps.
    val payload = Array.fill(64)(16); payload(2) = 100
    val coef = new Array[Int](64)
    coef(0) = 61 // base ~250 after level shift: AC swings must clamp
    coef(8) = 1  // dequant 100 per spec, 16 under a natural-order misread
    val bytes = encode(8, 8, Seq((1, 1)), payload, _ => (_, _) => coef)
    val want = refBlockPixels(coef, payload).sum / 64.0
    assert(JpegKernels.decode(bytes).get.meanR == want)
  }

  test("ImageIO-encoded gray JPEG (real non-flat tables): kernel tracks the JDK reader") {
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, if (x % 2 == 0) 0 else 255)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val bytes = bos.toByteArray
    val ours = JpegKernels.decode(bytes).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var s = 0.0
    for (y <- 0 until h; x <- 0 until w) s += ref.getRaster.getSample(x, y, 0)
    // the JDK reader's integer IDCT differs from our double-precision
    // one by design; a shuffled quant table moves the mean by far more
    // than this tolerance on 1-px stripes
    assert(math.abs(ours.meanR - s / (w * h)) < 2.0)
  }

  test("refusals: truncation, progressive SOF, garbage, forged dims") {
    val good = encode(8, 8, Seq((1, 1)), flatQt, _ => (_, _) => dcOnly(5))
    assert(JpegKernels.decode(good).isDefined)
    // every truncation point INSIDE headers or entropy data must return
    // None, never throw; cutting only the trailing EOI leaves a complete
    // scan, which (like any real decoder) still decodes
    for (cut <- 2 until good.length - 2)
      assert(JpegKernels.decode(good.take(cut)).isEmpty, s"cut=$cut")
    assert(JpegKernels.decode(good.dropRight(2)).isDefined)
    // progressive: flip SOF0 -> SOF2
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegKernels.decode(prog).isEmpty)
    assert(JpegKernels.decode(Array.fill[Byte](64)(0x41)).isEmpty)
    // forged SOF dimensions far beyond the entropy data must refuse
    val forged = good.clone()
    val s2 = forged.indices.find(i =>
      (forged(i) & 0xff) == 0xff && (forged(i + 1) & 0xff) == 0xc0).get
    forged(s2 + 5) = 0xff.toByte; forged(s2 + 6) = 0xff.toByte // height
    forged(s2 + 7) = 0xff.toByte; forged(s2 + 8) = 0xff.toByte // width
    assert(JpegKernels.decode(forged).isEmpty)
  }

  test("imageMeta triage and the full decoder agree on dimensions") {
    // the metadata pass (SOF scan only) must see the same dims the
    // pixel decoder produces — the filter-then-decode pipeline depends
    // on that agreement
    val bytes = encode(24, 16, Seq((2, 2), (1, 1), (1, 1)), flatQt,
      ci => (_, _) => dcOnly(Seq(12, 0, 0)(ci)))
    val r = JpegKernels.decode(bytes).get
    assert(r.width == 24 && r.height == 16)
    val meta = graft.functions.MediaKernels.imageMeta(bytes)
    assert(meta != null)
    // MediaKernels.imageMeta returns (format, width, height)
    assert(meta.getUTF8String(0).toString == "jpeg")
    assert(meta.getInt(1) == r.width && meta.getInt(2) == r.height)
  }

  test("RasterKernels dispatch routes FFD8 to the JPEG decoder") {
    val bytes = encode(8, 8, Seq((1, 1)), flatQt, _ => (_, _) => dcOnly(30))
    val viaDispatch = RasterKernels.decode(bytes)
    assert(viaDispatch.contains(JpegKernels.decode(bytes).get))
  }
}
