package graft.functions

/** Sample decode for the audio formats that need NO codec library —
  * integer PCM (8-bit unsigned, 16-bit signed LE) and ITU-T G.711
  * companded telephony audio (µ-law, format 7; A-law, format 6) inside
  * a WAV/RIFF container. G.711 expansion is pure table arithmetic from
  * the public spec (segment + mantissa + bias), so telephony corpora
  * decode for real; the honest stub shrinks to the genuinely
  * codec-bound formats (MP3/AAC/Opus), which this sandbox cannot
  * decode. The audio analog of [[RasterKernels]]: amplitude statistics
  * come from real sample iteration.
  *
  * Every parse failure — wrong magic, compressed/float payloads,
  * unsupported bit depth, truncated data — returns None rather than
  * throwing: a corrupt blob must cost a NULL feature row, never a task.
  * All header-derived arithmetic stays in Long ([[RasterKernels]]'s
  * overflow lesson): RIFF sizes are unsigned 32-bit and
  * attacker-controlled.
  */
object AudioKernels {

  /** Decoded summary over all interleaved samples, amplitudes
    * normalized to [-1, 1]: 16-bit as v/32768, 8-bit as (v-128)/128.
    * `meanAbs`/`meanSq`/`peak` are exact IEEE-double statistics;
    * rms = sqrt(meanSq) is left to callers so the stored stats stay
    * closed-form rationals (float-exact for dyadic inputs).
    */
  final case class Pcm(channels: Int, sampleRate: Int, bits: Int,
                       nFrames: Long, meanAbs: Double, meanSq: Double,
                       peak: Double)

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leI32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** ITU-T G.711 µ-law byte → linear 16-bit sample (range ±32124).
    * Complement, then mantissa·8 + bias 0x84 shifted by the segment;
    * sign from the complemented top bit. */
  def ulawToLinear(byte: Int): Int = {
    val u = (~byte) & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law byte → linear 16-bit sample (range ±32256).
    * XOR 0x55, mantissa·16 plus the per-segment offset (8 in segment 0,
    * 0x108 then doubling); sign INVERTED relative to µ-law's layout. */
  def alawToLinear(byte: Int): Int = {
    val a = (byte ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** Decode integer-PCM WAV. Unlike [[MediaKernels.audioMeta]] (which
    * reports a truncated blob's surviving frames — triage wants the
    * real count), decode REQUIRES the declared data chunk to be fully
    * present: statistics over half the samples would be silently wrong
    * in exactly the way a feature pipeline can't detect.
    */
  def decode(b: Array[Byte]): Option[Pcm] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var formatTag = -1
    var channels = -1
    var rate = -1
    var bits = -1
    var dataOff = -1L
    var dataLen = -1L
    var i = 12L
    while (i + 8 <= b.length && (channels < 0 || dataLen < 0)) {
      val j = i.toInt
      val isFmt = b(j) == 'f' && b(j + 1) == 'm' && b(j + 2) == 't' && b(j + 3) == ' '
      val isData = b(j) == 'd' && b(j + 1) == 'a' && b(j + 2) == 't' && b(j + 3) == 'a'
      val size = leI32(b, j + 4).toLong & 0xffffffffL
      if (isFmt) {
        if (size < 16 || j + 8 + 16 > b.length) return None
        formatTag = leU16(b, j + 8)
        channels = leU16(b, j + 10)
        rate = leI32(b, j + 12)
        bits = leU16(b, j + 22)
      } else if (isData) {
        dataOff = j + 8L
        dataLen = size
      }
      i += 8L + size + (size & 1L)
    }
    val pcm = formatTag == 1 && (bits == 8 || bits == 16)
    val g711 = (formatTag == 6 || formatTag == 7) && bits == 8
    if (!(pcm || g711) || channels <= 0 || channels > 64 || rate <= 0 ||
        dataOff < 0 || dataLen < 0) return None
    if (dataOff + dataLen > b.length) return None // truncated: refuse
    val bytesPerSample = bits / 8
    val frameBytes = channels.toLong * bytesPerSample
    val nFrames = dataLen / frameBytes
    val nSamples = nFrames * channels
    if (nSamples == 0) return None
    var sumAbs = 0.0
    var sumSq = 0.0
    var peak = 0.0
    var p = dataOff.toInt
    val end = (dataOff + nSamples * bytesPerSample).toInt
    while (p < end) {
      val v =
        if (formatTag == 7) ulawToLinear(b(p) & 0xff) / 32768.0
        else if (formatTag == 6) alawToLinear(b(p) & 0xff) / 32768.0
        else if (bits == 16) {
          val s = ((b(p) & 0xff) | (b(p + 1) << 8)).toShort
          s / 32768.0
        } else (( b(p) & 0xff) - 128) / 128.0
      val a = math.abs(v)
      sumAbs += a
      sumSq += v * v
      if (a > peak) peak = a
      p += bytesPerSample
    }
    Some(Pcm(channels, rate, bits, nFrames,
      sumAbs / nSamples, sumSq / nSamples, peak))
  }
}
