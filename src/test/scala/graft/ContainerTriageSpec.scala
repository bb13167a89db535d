package graft

import graft.functions.MediaKernels
import org.apache.spark.sql.Row

/** Matroska/WebM (EBML) and OGG (Vorbis/Opus) arms of the codec-free
  * triage tier — [[MediaKernels.videoMeta]] / [[MediaKernels.audioMeta]].
  * Fixtures are built byte-by-byte from the public specs (RFC 8794
  * EBML, the Matroska element registry, RFC 3533 OGG framing, the
  * Vorbis I and OpusHead identification headers); every fail-closed
  * branch gets a hostile fixture.
  */
class ContainerTriageSpec extends SparkSpec {

  // ---- EBML builders -------------------------------------------------

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def ebmlHeaderEl(docType: Option[String]): Array[Byte] = {
    val body = docType.map { dt =>
      bytes(0x42, 0x82, 0x80 | dt.length) ++ dt.getBytes("US-ASCII")
    }.getOrElse(Array.emptyByteArray)
    bytes(0x1a, 0x45, 0xdf, 0xa3, 0x80 | body.length) ++ body
  }

  private def infoEl(tsScale: Option[Long], dur: Option[Either[Float, Double]]): Array[Byte] = {
    val ts = tsScale.map { v =>
      bytes(0x2a, 0xd7, 0xb1, 0x84, ((v >> 24) & 0xff).toInt,
        ((v >> 16) & 0xff).toInt, ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)
    }.getOrElse(Array.emptyByteArray)
    val d = dur.map {
      case Left(f) =>
        val bits = java.lang.Float.floatToIntBits(f)
        bytes(0x44, 0x89, 0x84, bits >>> 24, (bits >> 16) & 0xff,
          (bits >> 8) & 0xff, bits & 0xff)
      case Right(dd) =>
        val bits = java.lang.Double.doubleToLongBits(dd)
        bytes(0x44, 0x89, 0x88) ++
          (7 to 0 by -1).map(s => ((bits >> (8 * s)) & 0xff).toByte).toArray
    }.getOrElse(Array.emptyByteArray)
    val body = ts ++ d
    bytes(0x15, 0x49, 0xa9, 0x66, 0x80 | body.length) ++ body
  }

  private def tracksEl(n: Int): Array[Byte] = {
    val one = bytes(0xae, 0x83, 0xd7, 0x81, 0x01) // TrackEntry{TrackNumber 1}
    val body = Array.fill(n)(one).flatten
    bytes(0x16, 0x54, 0xae, 0x6b, 0x80 | body.length) ++ body
  }

  private def segment(children: Array[Byte], unknownSize: Boolean): Array[Byte] =
    bytes(0x18, 0x53, 0x80, 0x67,
      if (unknownSize) 0xff else 0x80 | children.length) ++ children

  private def vm(b: Array[Byte]): Row = {
    val r = MediaKernels.videoMeta(b)
    if (r == null) null
    else Row(r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getInt(3))
  }

  // ---- EBML cases ----------------------------------------------------

  test("webm: DocType, TimestampScale->ticks/sec, floored float Duration, TrackEntry count") {
    val b = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(1000000L), Some(Left(12345.7f))) ++ tracksEl(2),
        unknownSize = false)
    assert(vm(b) == Row("webm", 1000L, 12345L, 2))
  }

  test("matroska: unknown-size Segment (streamed mux) clamps to end of blob") {
    val b = ebmlHeaderEl(Some("matroska")) ++
      segment(infoEl(Some(1000000L), Some(Left(500f))) ++ tracksEl(1),
        unknownSize = true)
    assert(vm(b) == Row("matroska", 1000L, 500L, 1))
  }

  test("DocType defaults to matroska when the EBML header omits it") {
    val b = ebmlHeaderEl(None) ++
      segment(infoEl(Some(1000000L), Some(Left(7f))) ++ tracksEl(1),
        unknownSize = false)
    assert(vm(b) == Row("matroska", 1000L, 7L, 1))
  }

  test("8-byte double Duration and a non-default TimestampScale") {
    val b = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(1000000000L), Some(Right(98765.25))) ++ tracksEl(3),
        unknownSize = false)
    assert(vm(b) == Row("webm", 1L, 98765L, 3))
  }

  test("an unknown-size CHILD (streaming Cluster) ends the walk, keeping Info/Tracks") {
    val cluster = bytes(0x1f, 0x43, 0xb6, 0x75, 0xff, 0x00, 0x00, 0x00)
    val b = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(1000000L), Some(Left(42f))) ++ tracksEl(1) ++ cluster,
        unknownSize = true)
    assert(vm(b) == Row("webm", 1000L, 42L, 1))
  }

  test("fail-closed: missing Duration, missing Info, NaN/negative duration, zero scale") {
    val noDur = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(1000000L), None) ++ tracksEl(1), unknownSize = false)
    assert(vm(noDur) == null)
    val noInfo = ebmlHeaderEl(Some("webm")) ++
      segment(tracksEl(1), unknownSize = false)
    assert(vm(noInfo) == null)
    val nan = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(1000000L), Some(Left(Float.NaN))), unknownSize = false)
    assert(vm(nan) == null)
    val neg = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(1000000L), Some(Left(-1f))), unknownSize = false)
    assert(vm(neg) == null)
    val zeroScale = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(0L), Some(Left(5f))), unknownSize = false)
    assert(vm(zeroScale) == null)
    // a scale above 1 s/tick floors to 0 ticks/sec -> refused
    val hugeScale = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(2000000000L), Some(Left(5f))), unknownSize = false)
    assert(vm(hugeScale) == null)
  }

  test("fail-closed: every truncation of the webm fixture is NULL, never junk") {
    val b = ebmlHeaderEl(Some("webm")) ++
      segment(infoEl(Some(1000000L), Some(Left(12345.7f))) ++ tracksEl(2),
        unknownSize = false)
    for (cut <- 4 until b.length)
      assert(vm(b.take(cut)) == null, s"cut at $cut")
  }

  // ---- OGG builders --------------------------------------------------

  private def le32(v: Int): Array[Byte] =
    (0 to 3).map(s => ((v >> (8 * s)) & 0xff).toByte).toArray
  private def le64(v: Long): Array[Byte] =
    (0 to 7).map(s => ((v >> (8 * s)) & 0xff).toByte).toArray

  private def oggPage(htype: Int, granule: Long, serial: Int, seq: Int,
                      payload: Array[Byte]): Array[Byte] = {
    val full = payload.length / 255
    val segs = Array.fill(full)(255.toByte) :+ (payload.length % 255).toByte
    "OggS".getBytes("US-ASCII") ++ bytes(0, htype) ++ le64(granule) ++
      le32(serial) ++ le32(seq) ++ le32(0) ++ bytes(segs.length) ++
      segs ++ payload
  }

  private def vorbisId(channels: Int, rate: Int): Array[Byte] =
    bytes(1) ++ "vorbis".getBytes("US-ASCII") ++ le32(0) ++
      bytes(channels) ++ le32(rate) ++ le32(0) ++ le32(0) ++ le32(0) ++
      bytes(0x66, 0x01)

  private def opusHead(channels: Int): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ bytes(1, channels) ++
      bytes(0, 0) ++ le32(24000) ++ bytes(0, 0, 0)

  private def am(b: Array[Byte]): Row = {
    val r = MediaKernels.audioMeta(b)
    if (r == null) null
    else Row(r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
      r.getInt(3), r.getLong(4))
  }

  // pad so the 36-byte audioMeta gate never hides an OGG case
  private def junkAudio(n: Int): Array[Byte] = Array.fill(n)('x'.toByte)

  // ---- OGG cases -----------------------------------------------------

  test("ogg vorbis: id header fields + last-page granule as n_frames") {
    val b = oggPage(2, 0, 7, 0, vorbisId(2, 44100)) ++
      oggPage(4, 9600L, 7, 1, junkAudio(40))
    assert(am(b) == Row("vorbis", 2, 44100, 0, 9600L))
  }

  test("ogg opus: 48 kHz granule clock, channels from OpusHead; input rate is a hint only") {
    val b = oggPage(2, 0, 9, 0, opusHead(2)) ++
      oggPage(4, 96000L, 9, 1, junkAudio(25))
    assert(am(b) == Row("opus", 2, 48000, 0, 96000L))
  }

  test("ogg: a granule of -1 (no packet completes) is skipped, not counted") {
    val b = oggPage(2, 0, 7, 0, vorbisId(1, 8000)) ++
      oggPage(0, -1L, 7, 1, junkAudio(30)) ++
      oggPage(4, 4800L, 7, 2, junkAudio(10))
    assert(am(b) == Row("vorbis", 1, 8000, 0, 4800L))
  }

  test("ogg: multi-segment lacing sums the segment table") {
    val big = vorbisId(2, 22050) ++ junkAudio(300)
    val b = oggPage(2, 0, 5, 0, big) ++ oggPage(4, 1024L, 5, 1, junkAudio(12))
    assert(am(b) == Row("vorbis", 2, 22050, 0, 1024L))
  }

  test("ogg fail-closed: truncation, trailing garbage, serial mix, bad versions, junk first packet") {
    val good = oggPage(2, 0, 7, 0, vorbisId(2, 44100)) ++
      oggPage(4, 9600L, 7, 1, junkAudio(40))
    assert(am(good.dropRight(3)) == null)          // truncated final page
    assert(am(good ++ junkAudio(5)) == null)       // pages must tile exactly
    val mixed = oggPage(2, 0, 7, 0, vorbisId(2, 44100)) ++
      oggPage(4, 9600L, 8, 1, junkAudio(40))       // second logical stream
    assert(am(mixed) == null)
    val badVer = good.clone(); badVer(4) = 1       // stream structure version
    assert(am(badVer) == null)
    val vorbisV1 = oggPage(2, 0, 7, 0,
      bytes(1) ++ "vorbis".getBytes ++ le32(1) ++ bytes(2) ++ le32(44100) ++
        le32(0) ++ le32(0) ++ le32(0) ++ bytes(0x66, 0x01)) ++
      oggPage(4, 10L, 7, 1, junkAudio(40))
    assert(am(vorbisV1) == null)                   // vorbis_version must be 0
    val opusV2 = oggPage(2, 0, 7, 0,
      "OpusHead".getBytes ++ bytes(0x20, 2) ++ bytes(0, 0) ++ le32(24000) ++
        bytes(0, 0, 0)) ++ oggPage(4, 10L, 7, 1, junkAudio(25))
    assert(am(opusV2) == null)                     // incompatible major version
    val junkFirst = oggPage(2, 0, 7, 0, junkAudio(40)) ++
      oggPage(4, 10L, 7, 1, junkAudio(40))
    assert(am(junkFirst) == null)
  }

  test("dispatch intact: BMFF and WAV still route; EBML/OggS magic with a lying body is NULL") {
    // minimal sanity that the new arms didn't shadow the old ones
    val wav = {
      val bb = java.nio.ByteBuffer.allocate(44 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes).putInt(8)
      bb.putLong(0L)
      bb.array()
    }
    assert(am(wav) == Row("wav", 1, 8000, 16, 4L))
    assert(am("OggS".getBytes ++ junkAudio(60)) == null)
    assert(vm(bytes(0x1a, 0x45, 0xdf, 0xa3) ++ junkAudio(40)) == null)
  }
}
