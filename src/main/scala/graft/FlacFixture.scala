package graft

import graft.functions.FlacKernels
import scala.collection.mutable.ArrayBuffer

/** Constructed-FLAC fixture for q_audio_flac (round 13): per-doc valid
  * FLAC streams assembled IN-PLAN as column arithmetic — mono 16-bit
  * 8 kHz, one frame, 12 template families = 4 blocksize codes (192/256
  * from the fixed table, 576 from the 576·2ᵏ family, 512 from the
  * 256·2ᵏ family) × 3 subframe kinds (CONSTANT, FIXED order-1 with a
  * Rice-coded all-zero residual partition, VERBATIM). The per-doc
  * amplitude a = doc_id%127+1 varies only the sample value v = a·256
  * (v_lo is always 0), so each template's bytes are a constant hex
  * prefix/middle around `h2(a)` occurrences — and the frame CRC-16,
  * which depends on a, is PRECOMPUTED here for all 127 amplitudes per
  * template and rides the plan as a 127-element array literal the
  * query indexes with `element_at`. The ORACLE needs none of this: it
  * predicts features (n_bytes, channels, rate, n_frames, mean_abs =
  * peak = a/128 — dyadic, float-exact) from doc_id alone; the CRC
  * machinery exists only so the engine decodes REAL, checksummed FLAC.
  *
  * [[bytesFor]] is the single source of truth: the in-plan pieces are
  * DERIVED from its output (diffing two amplitudes finds the varying
  * byte positions), so the Column construction cannot drift from the
  * builder, and FlacSpec pins `decode(bytesFor(...))` for every
  * template × amplitude sample.
  */
private[graft] object FlacFixture {

  /** (blockSize, blocksize code) per bsIdx = doc_id % 4. */
  val BsFamilies: IndexedSeq[(Int, Int)] =
    IndexedSeq((192, 1), (256, 8), (576, 2), (512, 9))
  val Rate = 8000 // frame header code 4 — no end-of-header rate bytes

  /** Complete stream bytes for (bsIdx, sfIdx, amplitude a in 1..127). */
  def bytesFor(bsIdx: Int, sfIdx: Int, a: Int): Array[Byte] = {
    require(a >= 1 && a <= 127)
    val (bs, bsCode) = BsFamilies(bsIdx)
    val out = ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("US-ASCII")
    out += 0x80.toByte; out += 0; out += 0; out += 34 // last, STREAMINFO
    out += (bs >> 8).toByte; out += bs.toByte // min blocksize
    out += (bs >> 8).toByte; out += bs.toByte // max blocksize
    out ++= new Array[Byte](6) // min/max framesize unknown
    // packed: rate(20) ch-1(3) bps-1(5) total(36)
    out += (Rate >> 12).toByte
    out += ((Rate >> 4) & 0xff).toByte
    out += (((Rate & 0xf) << 4) | (15 >> 4)).toByte // ch-1 = 0
    out += ((15 & 0xf) << 4).toByte // total bits 35..32 = 0 (bs < 2^32)
    out += ((bs >> 24) & 0xff).toByte; out += ((bs >> 16) & 0xff).toByte
    out += ((bs >> 8) & 0xff).toByte; out += (bs & 0xff).toByte
    out ++= new Array[Byte](16) // MD5 unset

    val frame = ArrayBuffer.empty[Byte]
    frame += 0xFF.toByte; frame += 0xF8.toByte // sync + fixed blocking
    frame += ((bsCode << 4) | 4).toByte // srCode 4 = 8000 Hz
    frame += 0x08.toByte // chAssign 0 (mono), ssCode 4 (16-bit)
    frame += 0x00 // frame number 0 (single-byte UTF-8)
    frame += FlacKernels.crc8(frame.toArray, 0, frame.length).toByte
    val v = a * 256
    sfIdx match {
      case 0 => // CONSTANT: header 0x00 + one 16-bit sample
        frame += 0x00; frame += (v >> 8).toByte; frame += (v & 0xff).toByte
      case 1 => // FIXED order 1: warmup sample + Rice zeros (k = 0)
        frame += 0x12 // 0 001001 0
        frame += (v >> 8).toByte; frame += (v & 0xff).toByte
        // 2b method 00, 4b partition order 0, 4b param 0, then bs-1
        // zero residuals (each one '1' bit), zero-padded to the byte
        val bits = ArrayBuffer.fill(10)(0) ++= ArrayBuffer.fill(bs - 1)(1)
        while (bits.length % 8 != 0) bits += 0
        bits.grouped(8).foreach(g =>
          frame += g.foldLeft(0)((acc, b) => (acc << 1) | b).toByte)
      case 2 => // VERBATIM: bs copies of the 16-bit sample
        frame += 0x02
        var i = 0
        while (i < bs) {
          frame += (v >> 8).toByte; frame += (v & 0xff).toByte; i += 1
        }
    }
    val c16 = FlacKernels.crc16(frame.toArray, 0, frame.length)
    frame += (c16 >> 8).toByte; frame += (c16 & 0xff).toByte
    (out ++ frame).toArray
  }

  private def hexOf(b: Array[Byte], from: Int, until: Int): String =
    b.slice(from, until).map(x => f"${x & 0xff}%02X").mkString

  /** In-plan construction pieces for one template, derived from
    * [[bytesFor]] by diffing amplitudes (no hand-maintained offsets):
    * constant/fixed emit prefix + h2(a) + mid + crc(a); verbatim emits
    * prefix + bs·(h2(a) + "00") + crc(a).
    */
  final case class Pieces(prefixHex: String, midHex: Option[String],
                          bs: Int, nBytes: Int, crcHex: IndexedSeq[String])

  lazy val pieces: Map[(Int, Int), Pieces] = (for {
    bsIdx <- 0 until 4
    sfIdx <- 0 until 3
  } yield {
    val b1 = bytesFor(bsIdx, sfIdx, 1)
    val b2 = bytesFor(bsIdx, sfIdx, 2)
    require(b1.length == b2.length)
    val n = b1.length
    val varying = (0 until n - 2).filter(i => b1(i) != b2(i))
    val crcTable = (1 to 127).map { a =>
      val b = bytesFor(bsIdx, sfIdx, a)
      hexOf(b, n - 2, n)
    }
    val bs = BsFamilies(bsIdx)._1
    val p = if (sfIdx == 2) {
      // verbatim: varying = every even offset of the sample data
      val start = varying.head
      require(varying == (start until n - 2 by 2), s"verbatim layout drifted")
      require((start + 1 until n - 2 by 2).forall(b1(_) == 0))
      require(n - 2 - start == 2 * bs)
      Pieces(hexOf(b1, 0, start), None, bs, n, crcTable)
    } else {
      require(varying.size == 1, s"expected one varying byte, got $varying")
      val vp = varying.head
      Pieces(hexOf(b1, 0, vp), Some(hexOf(b1, vp + 1, n - 2)), bs, n, crcTable)
    }
    (bsIdx, sfIdx) -> p
  }).toMap
}
