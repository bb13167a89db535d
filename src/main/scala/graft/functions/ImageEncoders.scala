package graft.functions

/** Deterministic minimal image ENCODERS (round 15) — test-vector /
  * fixture tooling for the perceptual-hash codec family. Each encoder
  * produces a spec-minimal, byte-deterministic stream whose DECODED
  * pixels equal the input grays exactly, so a DuckDB oracle can replay
  * any pixel-derived feature (dHash grids, means) by pure arithmetic
  * without decoding:
  *
  *  - [[pngGray]]: 8-bit grayscale PNG, filter 0 rows, one IDAT
  *    (stored zlib via Deflater level 0 would be non-canonical across
  *    JDKs, so the default level is fine — PNG is lossless, bytes of
  *    the STREAM may vary by JDK but pixels never do; fixtures are
  *    generated driver-side per run, not frozen).
  *  - [[gifGray]]: GIF89a, 256-gray global palette, one image,
  *    LZW-literal coding (CLEAR + one literal code per pixel + EOI;
  *    for ≤254 pixels after a clear the code width stays at
  *    minCode+1, here 9 bits).
  *  - [[tiffGray]]: little-endian baseline TIFF, photometric 1
  *    (BlackIsZero), one uncompressed strip.
  *  - [[jpegGrayBlocks]]: baseline T.81 JPEG, single gray component,
  *    flat all-8 quantization, DC-ONLY constant 8×8 blocks — with
  *    qt(0)=8 the IDCT of a pure-DC block is exactly dc+128 in IEEE
  *    doubles (pinned by JpegSpec "flat gray"), so the lossy format
  *    becomes pixel-exact BY CONSTRUCTION: block (bx,by) decodes to
  *    the constant `blocks(by)(bx)`.
  *
  * Huffman/zigzag constants are the public ITU-T T.81 Annex K tables.
  */
object ImageEncoders {

  /** 8-bit grayscale PNG of `px` (row-major, w×h). */
  def pngGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, "pixel count")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte,
      (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, payload: Array[Byte]): Unit = {
      out.write(be32(payload.length), 0, 4)
      val tb = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(payload)
      out.write(tb, 0, 4)
      out.write(payload, 0, payload.length)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0))
    val raw = new Array[Byte](h * (w + 1)) // filter byte 0 + row
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raw(y * (w + 1) + 1 + x) = px(y * w + x).toByte; x += 1 }
      y += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** GIF89a of `px` gray values (row-major) through a 256-gray global
    * palette: palette index == gray value, so decode is exact. */
  def gifGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, "pixel count")
    require(px.length <= 254, "literal-LZW width stays 9 bits only ≤254 px")
    val out = new java.io.ByteArrayOutputStream()
    def s(t: String): Unit = out.write(t.getBytes("US-ASCII"), 0,
      t.length)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    s("GIF89a"); le16(w); le16(h)
    out.write(0xf7) // global table, 256 entries, 8-bit color resolution
    out.write(0); out.write(0) // background, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
    out.write(8) // LZW min code size
    // CLEAR(256) + literals + EOI(257), all 9-bit LSB-first
    var acc = 0L; var bits = 0
    val data = new java.io.ByteArrayOutputStream()
    def put(code: Int): Unit = {
      acc |= code.toLong << bits; bits += 9
      while (bits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; bits -= 8 }
    }
    put(256)
    px.foreach(put)
    put(257)
    if (bits > 0) data.write((acc & 0xff).toInt)
    val db = data.toByteArray
    var o = 0
    while (o < db.length) {
      val n = math.min(255, db.length - o)
      out.write(n); out.write(db, o, n)
      o += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Little-endian baseline TIFF: 8-bit gray, photometric 1, one
    * uncompressed strip. */
  def tiffGray(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    require(px.length == w * h, "pixel count")
    val nEntries = 8
    val ifdOff = 8
    val dataOff = ifdOff + 2 + nEntries * 12 + 4
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16(v >>> 16) }
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Unit = {
      le16(tag); le16(typ); le32(cnt); le32(value)
    }
    s"II".getBytes("US-ASCII").foreach(out.write(_))
    le16(42); le32(ifdOff)
    le16(nEntries)
    entry(256, 3, 1, w)           // ImageWidth
    entry(257, 3, 1, h)           // ImageLength
    entry(258, 3, 1, 8)           // BitsPerSample
    entry(259, 3, 1, 1)           // Compression: none
    entry(262, 3, 1, 1)           // Photometric: BlackIsZero
    entry(273, 4, 1, dataOff)     // StripOffsets
    entry(277, 3, 1, 1)           // SamplesPerPixel
    entry(279, 4, 1, px.length)   // StripByteCounts
    le32(0) // next IFD
    px.foreach(v => out.write(v & 0xff))
    out.toByteArray
  }

  // ---- baseline JPEG, DC-only gray (T.81 Annex K tables) ----

  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  // AC table only needs the EOB symbol, but a legal DHT must carry a
  // canonical table — Annex K's first few rows suffice (EOB=0x00 is
  // the 4th symbol at length 4... keep the full table for validity)
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
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

  private def huffCodes(bits: Array[Int],
                        vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) {
        out += vals(k) -> ((code, l)); code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Baseline gray JPEG where 8×8 block (bx,by) is the CONSTANT value
    * `blocks(by)(bx)` (0..255). Width/height must be multiples of 8
    * matching the block grid. Decode is pixel-exact: flat qt=8, pure
    * DC, pixel = 128 + (v−128) = v. */
  def jpegGrayBlocks(blocks: Array[Array[Int]]): Array[Byte] = {
    val blocksY = blocks.length
    val blocksX = blocks(0).length
    val w = blocksX * 8
    val h = blocksY * 8
    val dcC = huffCodes(DcBits, DcVals)
    val acC = huffCodes(AcBits, AcVals)
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0; var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          body.write(acc)
          if (acc == 0xff) body.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    var pred = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      val dc = blocks(by)(bx) - 128 // qt(0)=8 → pixel = 128 + dc
      val diff = dc - pred
      var t = 0; var a = math.abs(diff)
      while (a != 0) { t += 1; a >>= 1 }
      val (c, l) = dcC(t)
      putBits(c, l)
      if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      val (ec, el) = acC(0x00) // EOB: all AC zero
      putBits(ec, el)
      pred = dc
    }
    if (nbits > 0) putBits((1 << (8 - nbits)) - 1, 8 - nbits) // pad with 1s
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xdb, Array(0.toByte) ++ Array.fill(64)(8.toByte)) // DQT flat 8
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++
      DcVals.map(_.toByte))
    seg(0xc4, Array(0x10.toByte) ++ AcBits.map(_.toByte) ++
      AcVals.map(_.toByte))
    seg(0xc0, Array(8, (h >> 8), h & 0xff, (w >> 8), w & 0xff, 1,
      1, 0x11, 0).map(_.toByte)) // SOF0: 1 component, 1×1 sampling, tq 0
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte))
    val bb = body.toByteArray
    out.write(bb, 0, bb.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
