package graft

import graft.functions.AudioKernels
import org.scalatest.funsuite.AnyFunSuite

/** IMA/DVI ADPCM (WAV format 0x11) pins. No independent encoder exists
  * in this JVM (javax.sound has no IMA codec), so the spec follows the
  * JpegSpec pattern: streams are assembled byte-by-byte and the
  * expected samples come from an INDEPENDENT transcription of the
  * public IMA recurrence (its own copies of the step/index tables, a
  * deliberately different code shape), so the kernel is checked against
  * the spec's math, not against itself. */
class AdpcmSpec extends AnyFunSuite {

  // ---- independent reference: the IMA recurrence, re-transcribed ----
  private val RefStep = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val RefIdx = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode one mono block the reference way: header predictor is
    * sample 0, then one sample per nibble (low first). */
  private def refBlock(pred0: Int, idx0: Int, nibbles: Seq[Int]): Seq[Int] = {
    var p = pred0
    var ix = idx0
    val out = Seq.newBuilder[Int]
    out += p
    for (n <- nibbles) {
      val step = RefStep(ix)
      // the spec's shift-sum (integer division form — the truncation
      // points are part of the algorithm, a (2·mag+1)·step/8 closed
      // form would round differently at odd steps)
      val mag = n & 7
      var d = step / 8
      if ((mag & 1) != 0) d += step / 4
      if ((mag & 2) != 0) d += step / 2
      if ((mag & 4) != 0) d += step
      p = if ((n & 8) != 0) p - d else p + d
      if (p > 32767) p = 32767
      if (p < -32768) p = -32768
      ix += RefIdx(mag)
      if (ix < 0) ix = 0
      if (ix > 88) ix = 88
      out += p
    }
    out.result()
  }

  /** Mono format-0x11 WAV: fmt (size 20, cbSize 2, samplesPerBlock) +
    * data of whole blocks (4-byte header + packed nibbles, low first). */
  private def adpcmWav(rate: Int, blocks: Seq[(Int, Int, Seq[Int])],
                       blockDataBytes: Int,
                       samplesPerBlockOverride: Int = -1): Array[Byte] = {
    val blockAlign = 4 + blockDataBytes
    val spb = if (samplesPerBlockOverride >= 0) samplesPerBlockOverride
      else blockDataBytes * 2 + 1
    val dataLen = blocks.size * blockAlign
    val b = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(4 + 28 + 8 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(20).putShort(0x11).putShort(1)
      .putInt(rate).putInt(rate * blockAlign / spb)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(spb.toShort)
    b.put("data".getBytes).putInt(dataLen)
    for ((p0, i0, nibbles) <- blocks) {
      require(nibbles.size == blockDataBytes * 2)
      b.putShort(p0.toShort).put(i0.toByte).put(0.toByte)
      nibbles.grouped(2).foreach { g =>
        b.put(((g(1) << 4) | g(0)).toByte)
      }
    }
    b.array()
  }

  test("kernel matches the independent recurrence on mixed nibbles") {
    // nibble stream hitting every magnitude, both signs, index clamps
    val nibbles = Seq(4, 7, 15, 2, 8, 3, 12, 0, 5, 9, 14, 1, 6, 10, 13, 11)
    val p0 = -1234; val i0 = 12
    val wav = adpcmWav(8000, Seq((p0, i0, nibbles)), 8)
    val got = AudioKernels.decode(wav).get
    val samples = refBlock(p0, i0, nibbles)
    assert(got.channels == 1 && got.sampleRate == 8000 && got.bits == 4)
    assert(got.nFrames == samples.size)
    val n = samples.size.toDouble
    assert(got.meanAbs == samples.map(s => math.abs(s / 32768.0)).sum / n)
    assert(got.peak == samples.map(s => math.abs(s / 32768.0)).max)
  }

  test("predictor clamps at the int16 rails") {
    // start at the top of the range with max-magnitude positive nibbles
    val nibbles = Seq.fill(8)(7)
    val wav = adpcmWav(8000, Seq((32700, 88, nibbles)), 4)
    val got = AudioKernels.decode(wav).get
    val samples = refBlock(32700, 88, nibbles)
    assert(samples.max == 32767) // the reference clamped, so must the kernel
    assert(got.peak == samples.map(s => math.abs(s / 32768.0)).max)
  }

  test("all-zero nibbles hold the header predictor exactly (multi-block)") {
    val blocks = Seq((300, 0, Seq.fill(8)(0)), (-500, 0, Seq.fill(8)(0)))
    val got = AudioKernels.decode(adpcmWav(16000, blocks, 4)).get
    assert(got.nFrames == 18)
    assert(got.meanAbs == (9 * 300 + 9 * 500) / 32768.0 / 18)
    assert(got.peak == 500 / 32768.0)
  }

  test("fail-closed: stereo, misdeclared samples-per-block, partial block, bad index") {
    val good = adpcmWav(8000, Seq((0, 0, Seq.fill(8)(0))), 4)
    assert(AudioKernels.decode(good).isDefined)
    val stereo = good.clone(); stereo(22) = 2 // nChannels
    assert(AudioKernels.decode(stereo).isEmpty)
    assert(AudioKernels.decode(adpcmWav(8000,
      Seq((0, 0, Seq.fill(8)(0))), 4, samplesPerBlockOverride = 8)).isEmpty)
    assert(AudioKernels.decode(good.dropRight(1)).isEmpty) // partial block
    val badIdx = good.clone()
    badIdx(good.length - 6) = 89.toByte // step index past the table
    assert(AudioKernels.decode(badIdx).isEmpty)
  }
}
