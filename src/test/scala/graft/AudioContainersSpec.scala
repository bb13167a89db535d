package graft

import graft.functions.AudioKernels
import org.scalatest.funsuite.AnyFunSuite

/** AU and AIFF container pins (round 11). The independent encoder is
  * the JDK's own `javax.sound.sampled.AudioSystem`, which writes both
  * containers; hand-built streams pin the header edges (until-EOF AU
  * data sizes, SSND offsets, 80-bit-extended rates, truncation
  * refusals) byte by byte. */
class AudioContainersSpec extends AnyFunSuite {

  private def jsWrite(fmt: javax.sound.sampled.AudioFormat,
                      data: Array[Byte], frames: Long,
                      typ: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, typ, bos)
    bos.toByteArray
  }

  private def stats(samples: Seq[Double]): (Double, Double) =
    (samples.map(math.abs).sum / samples.size, samples.map(math.abs).max)

  test("javax.sound AIFF: 16-bit mono and stereo, exact stats") {
    import javax.sound.sampled._
    val vals = Seq(1000, -2000, 3000, -32768, 32767, 0, 512, -1)
    val data = vals.flatMap(v => Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray
    val mono = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true)
    val out = AudioKernels.decode(
      jsWrite(mono, data, vals.size, AudioFileFormat.Type.AIFF)).get
    val (ma, pk) = stats(vals.map(_ / 32768.0))
    assert((out.channels, out.sampleRate, out.bits, out.nFrames) ==
      ((1, 8000, 16, vals.size.toLong)))
    assert(out.meanAbs == ma && out.peak == pk)

    val stereo = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      44100f, 16, 2, 4, 44100f, true)
    val o2 = AudioKernels.decode(
      jsWrite(stereo, data, vals.size / 2, AudioFileFormat.Type.AIFF)).get
    assert((o2.channels, o2.sampleRate, o2.nFrames) == ((2, 44100, 4L)))
    assert(o2.meanAbs == ma && o2.peak == pk)
  }

  test("javax.sound AU: big-endian PCM16 and mu-law passthrough") {
    import javax.sound.sampled._
    val vals = Seq(-12345, 42, 30000, -256)
    val data = vals.flatMap(v => Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray
    val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, true)
    val out = AudioKernels.decode(
      jsWrite(pcm, data, vals.size, AudioFileFormat.Type.AU)).get
    val (ma, pk) = stats(vals.map(_ / 32768.0))
    assert((out.channels, out.sampleRate, out.bits, out.nFrames) ==
      ((1, 16000, 16, vals.size.toLong)))
    assert(out.meanAbs == ma && out.peak == pk)

    // mu-law: javax.sound writes the companded bytes through unchanged;
    // the expansion itself is pinned by hand values in MultimodalSpec
    val ubytes = Array(0x00, 0x7f, 0xff, 0x93, 0x45).map(_.toByte)
    val ufmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val uo = AudioKernels.decode(
      jsWrite(ufmt, ubytes, ubytes.length, AudioFileFormat.Type.AU)).get
    val lin = ubytes.map(x => AudioKernels.ulawToLinear(x & 0xff) / 32768.0)
    assert(uo.bits == 8 && uo.nFrames == ubytes.length)
    assert(uo.meanAbs == lin.map(math.abs).sum / lin.length)
    assert(uo.peak == lin.map(math.abs).max)
  }

  // ---- hand-built streams ----

  private def be32(v: Long): Array[Byte] = Array((v >>> 24).toByte,
    (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def au(enc: Int, rate: Int, ch: Int, dataSize: Long,
                 data: Array[Byte]): Array[Byte] =
    ".snd".getBytes ++ be32(24) ++ be32(dataSize) ++ be32(enc) ++
      be32(rate) ++ be32(ch) ++ data

  test("hand AU: signed PCM8, until-EOF size, refusals") {
    // AU PCM8 is SIGNED: -128..127 -> /128
    val d = Array[Byte](-128, 64, 0, -64)
    val o = AudioKernels.decode(au(2, 8000, 1, 4, d)).get
    assert(o.meanAbs == (128 + 64 + 0 + 64) / 128.0 / 4)
    assert(o.peak == 1.0)
    // 0xFFFFFFFF data size = until EOF
    val o2 = AudioKernels.decode(au(2, 8000, 1, 0xffffffffL, d)).get
    assert(o2.nFrames == 4)
    // declared more data than present: refuse
    assert(AudioKernels.decode(au(2, 8000, 1, 5, d)).isEmpty)
    // G.721 (encoding 23): declared refusal
    assert(AudioKernels.decode(au(23, 8000, 1, 4, d)).isEmpty)
    // zero channels / junk rate
    assert(AudioKernels.decode(au(2, 8000, 0, 4, d)).isEmpty)
    assert(AudioKernels.decode(au(2, -1, 1, 4, d)).isEmpty)
  }

  /** 80-bit extended for an integer: value = m · 2^(e−16383−63). */
  private def ext80(v: Long): Array[Byte] = {
    var m = v
    var e = 16383 + 63
    while ((m & (1L << 63)) == 0) { m <<= 1; e -= 1 }
    Array((e >> 8).toByte, (e & 0xff).toByte) ++
      (0 until 8).map(i => ((m >>> (56 - 8 * i)) & 0xff).toByte)
  }

  private def aiff(ch: Int, frames: Int, bits: Int, rate: Long,
                   ssndOffset: Int, data: Array[Byte]): Array[Byte] = {
    val comm = "COMM".getBytes ++ be32(18) ++
      Array((ch >> 8).toByte, ch.toByte) ++ be32(frames).drop(0) ++
      Array((bits >> 8).toByte, bits.toByte) ++ ext80(rate)
    val ssnd = "SSND".getBytes ++ be32(8 + ssndOffset + data.length) ++
      be32(ssndOffset) ++ be32(0) ++ Array.fill[Byte](ssndOffset)(0x55) ++ data
    val body = "AIFF".getBytes ++ comm ++ ssnd
    "FORM".getBytes ++ be32(body.length) ++ body
  }

  test("hand AIFF: extended-float rates, SSND offset, signed PCM8, refusals") {
    val d16 = Array[Byte](0x10, 0x00, 0xf0.toByte, 0x00) // 4096, -4096
    val o = AudioKernels.decode(aiff(1, 2, 16, 44100L, 0, d16)).get
    assert((o.sampleRate, o.nFrames) == ((44100, 2L)))
    assert(o.meanAbs == 4096 / 32768.0 && o.peak == 4096 / 32768.0)
    // a nonzero SSND offset skips pad bytes before the samples
    val o2 = AudioKernels.decode(aiff(1, 2, 16, 8000L, 6, d16)).get
    assert(o2.meanAbs == 4096 / 32768.0)
    // 8-bit AIFF is SIGNED
    val o3 = AudioKernels.decode(aiff(1, 2, 8, 8000L,
      0, Array[Byte](-100, 50))).get
    assert(o3.peak == 100 / 128.0)
    // COMM frame count beyond the SSND payload: refuse
    assert(AudioKernels.decode(aiff(1, 3, 16, 8000L, 0, d16)).isEmpty)
    // 24-bit: out of scope
    assert(AudioKernels.decode(aiff(1, 1, 24, 8000L, 0,
      Array[Byte](1, 2, 3))).isEmpty)
  }
}
