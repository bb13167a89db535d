package graft

import graft.functions.{PngKernels, RasterKernels}
import org.scalatest.funsuite.AnyFunSuite

/** [[PngKernels]] pins, two independent directions:
  *
  *  - AGAINST THE JDK'S OWN ENCODER: `javax.imageio` writes real PNGs
  *    (dynamic-Huffman DEFLATE, encoder-chosen per-row filters) from
  *    deterministic pixel arrays; the kernel must reproduce the exact
  *    channel means computed from the source pixels. This validates
  *    inflate handling and filter reconstruction against an encoder
  *    this repo did not write.
  *  - AGAINST HAND-COMPUTED VECTORS: stored-block (uncompressed
  *    DEFLATE) PNGs built byte-by-byte here exercise each filter type
  *    in isolation with means worked out by hand in the comments — so
  *    a sign error in one filter cannot hide behind an encoder that
  *    never emits it.
  */
class PngSpec extends AnyFunSuite {

  // ---- byte-building helpers (CRCs are zeros: the kernel documents
  // that storage-layer integrity owns bit-rot; structure still gates)
  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def chunk(tag: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length) ++ tag.getBytes("US-ASCII") ++ payload ++
      Array[Byte](0, 0, 0, 0)
  private val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)
  private def ihdr(w: Int, h: Int, colorType: Int, bitDepth: Int = 8,
                   interlace: Int = 0): Array[Byte] =
    chunk("IHDR", be32(w) ++ be32(h) ++
      bytes(bitDepth, colorType, 0, 0, interlace))
  /** One stored (BTYPE=00, uncompressed) DEFLATE block in a zlib
    * wrapper; Adler32 trailer zeroed (unchecked in raw mode). */
  private def zlibStored(raw: Array[Byte]): Array[Byte] =
    Array(0x78.toByte, 0x01.toByte, 0x01.toByte) ++
      le16(raw.length) ++ le16(~raw.length & 0xffff) ++ raw ++
      Array[Byte](0, 0, 0, 0)
  private def png(w: Int, h: Int, colorType: Int,
                  raw: Array[Byte]): Array[Byte] =
    magic ++ ihdr(w, h, colorType) ++ chunk("IDAT", zlibStored(raw)) ++
      chunk("IEND", Array.empty)
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def dec(b: Array[Byte]) = PngKernels.decode(b)

  test("filter 0 (None), RGB: pixels pass through") {
    // 2x1: (10,20,30), (40,50,60)
    val r = dec(png(2, 1, 2, bytes(0, 10, 20, 30, 40, 50, 60))).get
    assert((r.width, r.height) == ((2, 1)))
    assert((r.meanR, r.meanG, r.meanB) == ((25.0, 35.0, 45.0)))
  }

  test("filter 1 (Sub): left-neighbor prediction per channel") {
    // deltas (10,20,30),(5,5,5) -> px (10,20,30),(15,25,35)
    val r = dec(png(2, 1, 2, bytes(1, 10, 20, 30, 5, 5, 5))).get
    assert((r.meanR, r.meanG, r.meanB) == ((12.5, 22.5, 32.5)))
  }

  test("filter 2 (Up): row-above prediction") {
    // row0 raw (100,110,120); row1 deltas (1,2,3) -> (101,112,123)
    val r = dec(png(1, 2, 2,
      bytes(0, 100, 110, 120) ++ bytes(2, 1, 2, 3))).get
    assert((r.meanR, r.meanG, r.meanB) == ((100.5, 111.0, 121.5)))
  }

  test("filter 3 (Average): floor((left+up)/2) prediction") {
    // row0 raw (10,10,10),(20,20,20); row1 deltas (5,5,5),(1,2,3)
    // -> row1 px0 = 5+floor((0+10)/2) = (10,10,10)
    //    row1 px1 = d+floor((10+20)/2) = (16,17,18)
    val r = dec(png(2, 2, 2,
      bytes(0, 10, 10, 10, 20, 20, 20) ++ bytes(3, 5, 5, 5, 1, 2, 3))).get
    assert((r.meanR, r.meanG, r.meanB) == ((14.0, 14.25, 14.5)))
  }

  test("filter 4 (Paeth): nearest-of-a/b/c prediction, spec tie order") {
    // row0 raw (10,20,30),(40,50,60); row1 deltas (2,0,1),(3,0,0)
    // -> row1 px0 = (12,20,31) (b wins: a=c=0), px1 = (43,50,60)
    val r = dec(png(2, 2, 2,
      bytes(0, 10, 20, 30, 40, 50, 60) ++ bytes(4, 2, 0, 1, 3, 0, 0))).get
    assert((r.meanR, r.meanG, r.meanB) == ((26.25, 35.0, 45.25)))
  }

  test("grayscale (type 0) and gray+alpha (type 4): R=G=B, alpha ignored") {
    val g = dec(png(2, 1, 0, bytes(0, 100, 200))).get
    assert((g.meanR, g.meanG, g.meanB) == ((150.0, 150.0, 150.0)))
    val ga = dec(png(2, 1, 4, bytes(0, 100, 0, 200, 255))).get
    assert((ga.meanR, ga.meanG, ga.meanB) == ((150.0, 150.0, 150.0)))
  }

  test("RGBA (type 6): alpha never contributes to means") {
    val r = dec(png(1, 1, 6, bytes(0, 10, 20, 30, 0))).get
    assert((r.meanR, r.meanG, r.meanB) == ((10.0, 20.0, 30.0)))
  }

  test("one zlib stream split across multiple IDAT chunks") {
    val z = zlibStored(bytes(1, 10, 20, 30, 5, 5, 5))
    val (z1, z2) = z.splitAt(3)
    val b = magic ++ ihdr(2, 1, 2) ++ chunk("IDAT", z1) ++
      chunk("IDAT", z2) ++ chunk("IEND", Array.empty)
    val r = dec(b).get
    assert((r.meanR, r.meanG, r.meanB) == ((12.5, 22.5, 32.5)))
  }

  test("unknown ancillary chunks are skipped, not fatal") {
    val b = magic ++ ihdr(1, 1, 2) ++
      chunk("tEXt", ("k".getBytes("US-ASCII") :+ 0.toByte) ++ "v".getBytes("US-ASCII")) ++
      chunk("IDAT", zlibStored(bytes(0, 7, 8, 9))) ++
      chunk("IEND", Array.empty)
    assert(dec(b).get.meanR == 7.0)
  }

  test("corrupt and out-of-scope shapes fail closed to None") {
    val good = png(2, 1, 2, bytes(0, 10, 20, 30, 40, 50, 60))
    assert(dec(good.take(20)).isEmpty)                       // truncated
    assert(dec(bytes(1, 2, 3)).isEmpty)                      // not PNG
    assert(dec(magic ++ ihdr(2, 1, 3) ++ good.drop(33)).isEmpty) // type 3, no PLTE
    assert(dec(magic ++ ihdr(2, 1, 2, bitDepth = 4) ++
      good.drop(33)).isEmpty)            // sub-byte truecolor: illegal pair
    assert(dec(magic ++ ihdr(2, 1, 3, bitDepth = 16) ++
      good.drop(33)).isEmpty)                           // 16-bit palette: illegal
    assert(dec(magic ++ ihdr(2, 1, 2, bitDepth = 16) ++
      good.drop(33)).isEmpty)              // 16-bit with an 8-bit-sized stream
    assert(dec(magic ++ ihdr(2, 1, 2, interlace = 1) ++
      good.drop(33)).isEmpty)   // stream shorter than the Adam7 layout promise
    assert(dec(magic ++ ihdr(2, 1, 2, interlace = 2) ++
      good.drop(33)).isEmpty)                     // undefined interlace method
    // IDAT stream shorter than the IHDR promise (1 missing byte)
    assert(dec(png(2, 1, 2, bytes(0, 10, 20, 30, 40, 50))).isEmpty)
    // filter byte out of range
    assert(dec(png(1, 1, 2, bytes(5, 1, 2, 3))).isEmpty)
    // FDICT set in the zlib header
    val fd = png(1, 1, 2, bytes(0, 1, 2, 3))
    val fi = fd.indexOfSlice(Array(0x78.toByte, 0x01.toByte))
    fd(fi + 1) = 0x21.toByte
    assert(dec(fd).isEmpty)
    // absurd declared dimensions must refuse BEFORE allocating
    val huge = magic ++ ihdr(0x7fffffff, 0x7fffffff, 2) ++
      chunk("IDAT", zlibStored(bytes(0))) ++ chunk("IEND", Array.empty)
    assert(dec(huge).isEmpty)
  }

  test("palette (type 3): indices resolve through PLTE, hand-computed means") {
    // 2x1, palette [(10,20,30),(40,50,60)], indices 0,1 with filter 0
    val plte = chunk("PLTE", bytes(10, 20, 30, 40, 50, 60))
    val b = magic ++ ihdr(2, 1, 3) ++ plte ++
      chunk("IDAT", zlibStored(bytes(0, 0, 1))) ++ chunk("IEND", Array.empty)
    val r = dec(b).get
    assert((r.width, r.height) == ((2, 1)))
    assert((r.meanR, r.meanG, r.meanB) == ((25.0, 35.0, 45.0)))
  }

  test("palette (type 3): filters apply to INDICES before the lookup") {
    // Sub filter on index bytes: deltas 1,1 -> indices 1,2
    val plte = chunk("PLTE", bytes(0, 0, 0, 10, 0, 0, 30, 0, 0))
    val b = magic ++ ihdr(2, 1, 3) ++ plte ++
      chunk("IDAT", zlibStored(bytes(1, 1, 1))) ++ chunk("IEND", Array.empty)
    val r = dec(b).get
    assert((r.meanR, r.meanG, r.meanB) == ((20.0, 0.0, 0.0)))
  }

  test("palette (type 3) malformed shapes fail closed to None") {
    val idat = chunk("IDAT", zlibStored(bytes(0, 0, 1)))
    val iend = chunk("IEND", Array.empty)
    // index 5 with a 2-entry palette: spec violation, never a stray read
    val p2 = chunk("PLTE", bytes(10, 20, 30, 40, 50, 60))
    assert(dec(magic ++ ihdr(2, 1, 3) ++ p2 ++
      chunk("IDAT", zlibStored(bytes(0, 0, 5))) ++ iend).isEmpty)
    // PLTE length not a multiple of 3
    assert(dec(magic ++ ihdr(2, 1, 3) ++ chunk("PLTE", bytes(1, 2, 3, 4)) ++
      idat ++ iend).isEmpty)
    // two PLTE chunks (spec: at most one)
    assert(dec(magic ++ ihdr(2, 1, 3) ++ p2 ++ p2 ++ idat ++ iend).isEmpty)
    // empty palette
    assert(dec(magic ++ ihdr(2, 1, 3) ++ chunk("PLTE", Array.empty[Byte]) ++
      idat ++ iend).isEmpty)
  }

  // ---- 16-bit depth (round 11): BE sample pairs, means on the 8-bit
  // scale via the exact rational /257 ----

  private def png16(w: Int, h: Int, colorType: Int,
                    raw: Array[Byte]): Array[Byte] =
    magic ++ ihdr(w, h, colorType, bitDepth = 16) ++
      chunk("IDAT", zlibStored(raw)) ++ chunk("IEND", Array.empty)

  test("16-bit gray: bit-replicated samples reproduce 8-bit means exactly") {
    // samples 100·257 and 200·257 → pixel values 100, 200 after /257
    val r = dec(png16(2, 1, 0, bytes(0, 100, 100, 200, 200))).get
    assert((r.width, r.height) == ((2, 1)))
    assert((r.meanR, r.meanG, r.meanB) == ((150.0, 150.0, 150.0)))
    // a non-replicated sample: 0x8000 = 32768 → 32768/257
    val s = dec(png16(1, 1, 0, bytes(0, 0x80, 0x00))).get
    assert(s.meanR == 32768.0 / 257.0)
  }

  test("16-bit RGB and RGBA: channel order, alpha ignored") {
    val rgb = dec(png16(1, 1, 2, bytes(0, 10, 10, 20, 20, 30, 30))).get
    assert((rgb.meanR, rgb.meanG, rgb.meanB) == ((10.0, 20.0, 30.0)))
    val rgba = dec(png16(1, 1, 6,
      bytes(0, 10, 10, 20, 20, 30, 30, 0xff, 0xff))).get
    assert((rgba.meanR, rgba.meanG, rgba.meanB) == ((10.0, 20.0, 30.0)))
  }

  test("16-bit filters operate on bytes with bpp = 2·channels") {
    // Sub on gray16: row (0x6464, then deltas 5,5) → second sample
    // 0x6969 = 105·257 → pixels 100, 105
    val r = dec(png16(2, 1, 0, bytes(1, 0x64, 0x64, 5, 5))).get
    assert(r.meanR == 102.5)
    // Up on gray16 across rows: row1 = row0 + (1,1) per byte →
    // 0x6565 = 101·257 → pixels 100, 101
    val u = dec(png16(1, 2, 0,
      bytes(0, 0x64, 0x64) ++ bytes(2, 1, 1))).get
    assert(u.meanR == 100.5)
  }

  test("ImageIO-encoded 16-bit gray: real encoder, exact Σv/257 means") {
    val (w, h) = (13, 7)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    var sv = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5039 + y * 12203) % 65536
      sv += v
      img.getRaster.setSample(x, y, 0, v)
    }
    val out = dec(imageIoPng(img)).get
    assert((out.width, out.height) == ((w, h)))
    val expected = sv.toDouble / ((w * h) * 257.0)
    assert(out.meanR == expected && out.meanG == expected && out.meanB == expected)
  }

  // ---- sub-byte depths (round 11): packed MSB-first samples, exact
  // integer scaling (255/(2^d−1) = 255, 85, 17), pad bits ignored ----

  test("1/2/4-bit gray: packed samples, exact scaling, garbage pad bits ignored") {
    // 1-bit 2x1: bits 10 -> samples 1,0 -> px 255,0
    val b1 = magic ++ ihdr(2, 1, 0, bitDepth = 1) ++
      chunk("IDAT", zlibStored(bytes(0, 0x80))) ++ chunk("IEND", Array.empty)
    assert(dec(b1).get.meanR == 127.5)
    // 2-bit 3x1: 11 01 10 + GARBAGE pad 11 (0xDB) -> px 255,85,170
    val b2 = magic ++ ihdr(3, 1, 0, bitDepth = 2) ++
      chunk("IDAT", zlibStored(bytes(0, 0xDB))) ++ chunk("IEND", Array.empty)
    assert(dec(b2).get.meanR == 170.0)
    // 4-bit 3x1: 15,5,4 + GARBAGE pad F (0xF5, 0x4F) -> px 255,85,68
    val b4 = magic ++ ihdr(3, 1, 0, bitDepth = 4) ++
      chunk("IDAT", zlibStored(bytes(0, 0xF5, 0x4F))) ++ chunk("IEND", Array.empty)
    assert(dec(b4).get.meanR == 136.0)
  }

  test("sub-byte rows still go through the byte-level filters (bpp = 1)") {
    // 4-bit 2x2: row0 None 0xAB -> samples 10,11; row1 Up +0x11 ->
    // 0xBC -> 11,12. px 170,187,187,204 -> mean 187
    val b = magic ++ ihdr(2, 2, 0, bitDepth = 4) ++
      chunk("IDAT", zlibStored(bytes(0, 0xAB) ++ bytes(2, 0x11))) ++
      chunk("IEND", Array.empty)
    assert(dec(b).get.meanR == 187.0)
  }

  test("sub-byte palette: indices through PLTE, range-checked") {
    // 2-bit palette, 4 entries; 4x1 indices 0,1,2,3 packed as 0x1B
    val plte = bytes(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val img = magic ++ ihdr(4, 1, 3, bitDepth = 2) ++ chunk("PLTE", plte) ++
      chunk("IDAT", zlibStored(bytes(0, 0x1B))) ++ chunk("IEND", Array.empty)
    val r = dec(img).get
    assert((r.meanR, r.meanG, r.meanB) == ((55.0, 65.0, 75.0)))
    // index 3 against a 3-entry palette: past the end -> NULL row
    val img2 = magic ++ ihdr(4, 1, 3, bitDepth = 2) ++
      chunk("PLTE", plte.take(9)) ++
      chunk("IDAT", zlibStored(bytes(0, 0x1B))) ++ chunk("IEND", Array.empty)
    assert(dec(img2).isEmpty)
  }

  // ---- Adam7 interlace (round 11): per-pass filtering, means
  // accumulated pass by pass — worked example, all 5 non-empty passes
  // of a 4x4 gray image with value 16y+x (sum 408, mean 25.5) ----

  test("Adam7 gray: per-pass independent filters reproduce exact means") {
    // p1 (0,0): [0|0]  p4 (2,0): [0|2]  p5 (0,2),(2,2): [0|32,34]
    // p6 rows {1,3}x{0,2}: [0|1,3] then Up [2|32,32]
    // p7 rows y=1 (Sub) and y=3 (Up over y=1)
    val raw = bytes(0, 0) ++ bytes(0, 2) ++ bytes(0, 32, 34) ++
      bytes(0, 1, 3) ++ bytes(2, 32, 32) ++
      bytes(1, 16, 1, 1, 1) ++ bytes(2, 32, 32, 32, 32)
    val b = magic ++ ihdr(4, 4, 0, interlace = 1) ++
      chunk("IDAT", zlibStored(raw)) ++ chunk("IEND", Array.empty)
    val r = dec(b).get
    assert((r.width, r.height) == ((4, 4)))
    assert((r.meanR, r.meanG, r.meanB) == ((25.5, 25.5, 25.5)))
  }

  // ---- the independent encoder: javax.imageio ----

  private def imageIoPng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos),
      "JDK has no PNG writer?")
    bos.toByteArray
  }

  test("ImageIO-encoded RGB: real DEFLATE + encoder-chosen filters, exact means") {
    val (w, h) = (23, 17) // odd sizes, gradient defeats trivial filters
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31 + y * 57) % 256
      val g = (x * 7 + y * 3) % 256
      val b = (x * x + y) % 256
      sr += r; sg += g; sb += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = dec(imageIoPng(img)).get
    val n = (w * h).toDouble
    assert((out.width, out.height) == ((w, h)))
    assert(out.meanR == sr / n && out.meanG == sg / n && out.meanB == sb / n)
  }

  test("ImageIO-encoded RGBA and grayscale decode to the same exact means") {
    val (w, h) = (9, 5)
    val argb = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 11 + y) % 256; val g = (y * 19 + x) % 256
      val b = (x + y * 43) % 256; val a = (x * y * 29) % 256
      sr += r; sg += g; sb += b
      argb.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    val oa = dec(imageIoPng(argb)).get
    val n = (w * h).toDouble
    assert(oa.meanR == sr / n && oa.meanG == sg / n && oa.meanB == sb / n)

    val gray = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var sv = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 37 + y * 5) % 256
      sv += v
      gray.getRaster.setSample(x, y, 0, v)
    }
    val og = dec(imageIoPng(gray)).get
    assert(og.meanR == sv / n && og.meanG == sv / n && og.meanB == sv / n)
  }

  test("ImageIO-encoded indexed (palette) PNG: exact means through PLTE") {
    // a FULL 256-entry IndexColorModel forces the encoder to 8-bit
    // type-3 output (smaller palettes legally drop to 1/2/4-bit depths,
    // covered by their own ImageIO test below); indices are set
    // directly on the raster so no nearest-color remap can blur the
    // expected means
    val pal = (0 until 256).map { i =>
      ((i * 31) % 256, (i * 7 + 3) % 256, (i * i + 11) % 256)
    }
    val cm = new java.awt.image.IndexColorModel(8, 256,
      pal.map(_._1.toByte).toArray, pal.map(_._2.toByte).toArray,
      pal.map(_._3.toByte).toArray)
    val (w, h) = (19, 11)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val idx = (x * 13 + y * 41) % 256
      val (r, g, b) = pal(idx)
      sr += r; sg += g; sb += b
      img.getRaster.setSample(x, y, 0, idx)
    }
    val out = dec(imageIoPng(img)).get
    val n = (w * h).toDouble
    assert((out.width, out.height) == ((w, h)))
    assert(out.meanR == sr / n && out.meanG == sg / n && out.meanB == sb / n)
  }

  test("ImageIO 1-bit binary and 4-bit indexed: real sub-byte encodings") {
    // TYPE_BYTE_BINARY with no color model = 1-bit black/white
    val (w, h) = (10, 6)
    val bin = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    var ones = 0
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x + y) % 2
      ones += v
      bin.getRaster.setSample(x, y, 0, v)
    }
    val ob = dec(imageIoPng(bin)).get
    val expB = ones * 255.0 / (w * h)
    assert((ob.width, ob.height) == ((w, h)))
    assert(ob.meanR == expB && ob.meanG == expB && ob.meanB == expB)

    // a 16-entry IndexColorModel encodes as a 4-bit type-3 PNG
    val pal = (0 until 16).map(i => (i * 17, (i * 5 + 7) % 256, (i * i) % 256))
    val cm = new java.awt.image.IndexColorModel(4, 16,
      pal.map(_._1.toByte).toArray, pal.map(_._2.toByte).toArray,
      pal.map(_._3.toByte).toArray)
    val idx4 = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_BINARY, cm)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val i = (x * 3 + y * 7) % 16
      val (r, g, b) = pal(i)
      sr += r; sg += g; sb += b
      idx4.getRaster.setSample(x, y, 0, i)
    }
    val oi = dec(imageIoPng(idx4)).get
    val n = (w * h).toDouble
    assert(oi.meanR == sr / n && oi.meanG == sg / n && oi.meanB == sb / n)
  }

  /** Same writer, but progressive mode on — the JDK PNG encoder emits
    * a REAL Adam7 stream (asserted on the IHDR interlace byte). */
  private def imageIoPngAdam7(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    val out = bos.toByteArray
    assert(out(28) == 1, "encoder did not produce an Adam7 stream")
    out
  }

  test("ImageIO Adam7 RGB and 16-bit gray: encoder-interlaced, exact means") {
    val (w, h) = (23, 17) // odd sizes exercise ragged interlace passes
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31 + y * 57) % 256
      val g = (x * 7 + y * 3) % 256
      val b = (x * x + y) % 256
      sr += r; sg += g; sb += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = dec(imageIoPngAdam7(img)).get
    val n = (w * h).toDouble
    assert((out.width, out.height) == ((w, h)))
    assert(out.meanR == sr / n && out.meanG == sg / n && out.meanB == sb / n)

    val g16 = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    var sv = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5039 + y * 12203) % 65536
      sv += v
      g16.getRaster.setSample(x, y, 0, v)
    }
    val og = dec(imageIoPngAdam7(g16)).get
    val exp = sv.toDouble / (n * 257.0)
    assert(og.meanR == exp && og.meanG == exp && og.meanB == exp)
  }

  test("RasterKernels front door dispatches PNG by magic") {
    val r = RasterKernels.decode(png(2, 1, 2, bytes(0, 1, 2, 3, 4, 5, 6)))
    assert(r.exists(_.width == 2))
  }

  test("imageMeta triage and the full decoder agree on dimensions") {
    // same pin as JpegSpec's: the filter-then-decode pipeline depends
    // on the cheap metadata pass and the pixel decoder seeing one truth
    val img = new java.awt.image.BufferedImage(
      31, 13, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val b = imageIoPng(img)
    val r = dec(b).get
    assert((r.width, r.height) == ((31, 13)))
    val meta = graft.functions.MediaKernels.imageMeta(b)
    assert(meta != null && meta.getUTF8String(0).toString == "png")
    assert(meta.getInt(1) == r.width && meta.getInt(2) == r.height)
  }
}
