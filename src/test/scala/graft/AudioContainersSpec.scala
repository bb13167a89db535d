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

  // ---- WAVE_FORMAT_EXTENSIBLE (round 12) ----

  /** Hand-built EXTENSIBLE WAV: every field explicit so the refusal
    * cases can forge exactly one byte at a time. `samples` are written
    * interleaved at `bits` depth, LE. */
  private def wavExt(ch: Int, bits: Int, samples: Array[Int],
                     innerTag: Int = 1, cbSize: Int = 22,
                     fmtSize: Int = 40,
                     suffixByte8: Int = 0x80): Array[Byte] = {
    val bps = bits / 8
    val dataLen = samples.length * bps
    val b = java.nio.ByteBuffer.allocate(28 + fmtSize + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(20 + fmtSize + 8 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(fmtSize)
      .putShort(0xfffe.toShort).putShort(ch.toShort).putInt(8000)
      .putInt(8000 * ch * bps).putShort((ch * bps).toShort).putShort(bits.toShort)
    if (fmtSize >= 18) b.putShort(cbSize.toShort)
    if (fmtSize >= 40) {
      b.putShort(bits.toShort).putInt(0).putShort(innerTag.toShort)
      Array(0x00, 0x00, 0x00, 0x00, 0x10, 0x00, suffixByte8, 0x00,
        0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71).foreach(x => b.put(x.toByte))
    }
    b.put("data".getBytes).putInt(dataLen)
    samples.foreach { v =>
      b.put((v & 0xff).toByte)
      if (bps >= 2) b.put(((v >> 8) & 0xff).toByte)
      if (bps >= 3) b.put(((v >> 16) & 0xff).toByte)
    }
    b.array()
  }

  test("WAVE_FORMAT_EXTENSIBLE: GUID-wrapped mono 16, stereo 24, 4-channel 16") {
    // mono 16-bit: dyadic values, exact stats
    val m = AudioKernels.decode(wavExt(1, 16,
      Array(4 * 256, -6 * 256, 2 * 256, -2 * 256))).get
    assert((m.channels, m.sampleRate, m.bits, m.nFrames) == ((1, 8000, 16, 4L)))
    assert(m.meanAbs == 14 / (4 * 128.0) && m.peak == 6 / 128.0)
    // stereo 24-bit: v = k·65536 decodes to exactly k/128
    val s = AudioKernels.decode(wavExt(2, 24,
      Array(5 * 65536, -3 * 65536, 7 * 65536, -1 * 65536))).get
    assert((s.channels, s.bits, s.nFrames) == ((2, 24, 2L)))
    assert(s.meanAbs == 16 / (4 * 128.0) && s.peak == 7 / 128.0)
    // 4-channel 16-bit: one frame of four samples
    val q = AudioKernels.decode(wavExt(4, 16,
      Array(256, -512, 768, -1024))).get
    assert((q.channels, q.nFrames) == ((4, 1L)))
    assert(q.peak == 4 / 128.0)
    // plain tag-1 24-bit PCM (no wrapper) also decodes now
    val plain24 = {
      val vals = Array(9 * 65536, -2 * 65536)
      val b = java.nio.ByteBuffer.allocate(44 + vals.length * 3)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + vals.length * 3).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(24000).putShort(3).putShort(24)
      b.put("data".getBytes).putInt(vals.length * 3)
      vals.foreach { v =>
        b.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
          .put(((v >> 16) & 0xff).toByte)
      }
      b.array()
    }
    val p = AudioKernels.decode(plain24).get
    assert(p.bits == 24 && p.meanAbs == 11 / (2 * 128.0))
  }

  test("WAVE_FORMAT_EXTENSIBLE refusals: forged GUID, short cbSize, short fmt") {
    val ok = Array(4 * 256, -6 * 256)
    assert(AudioKernels.decode(wavExt(1, 16, ok)).isDefined) // control
    // one wrong byte in the KSDATAFORMAT suffix: unknown codec, refuse
    assert(AudioKernels.decode(wavExt(1, 16, ok, suffixByte8 = 0x81)).isEmpty)
    // cbSize < 22: the GUID cannot be present, refuse
    assert(AudioKernels.decode(wavExt(1, 16, ok, cbSize = 21)).isEmpty)
    // fmt chunk too short to hold the GUID: refuse
    assert(AudioKernels.decode(wavExt(1, 16, ok, fmtSize = 18)).isEmpty)
    // inner tag IEEE float: outside the integer-PCM family, refuse
    assert(AudioKernels.decode(wavExt(1, 16, ok, innerTag = 3)).isEmpty)
  }
}
