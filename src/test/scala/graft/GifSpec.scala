package graft

import graft.functions.{GifKernels, RasterKernels}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** [[GifKernels]] pins, the PngSpec two-direction pattern:
  *
  *  - AGAINST THE JDK'S OWN ENCODER: `javax.imageio` writes real GIFs
  *    (variable-width LZW, dictionary growth, clear codes) from
  *    indexed images with explicit palettes; the kernel must reproduce
  *    the exact channel means computed from palette + indices.
  *  - AGAINST HAND-BUILT STREAMS: the classic "uncompressed GIF"
  *    construction (min code size 7 → 8-bit literal codes, a CLEAR
  *    every ≤100 literals so the width never grows) keeps every byte
  *    of the stream explainable by hand — interlacing, local palettes,
  *    animation (decode() reports frame 1; frames() walks them all,
  *    round 11), and the fail-closed shapes are
  *    pinned there.
  */
class GifSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  /** 128-entry palette: entry 0 = `a`, entry 1 = `b`, the rest black. */
  private def palette(a: (Int, Int, Int), b: (Int, Int, Int)): Array[Byte] = {
    val p = new Array[Byte](128 * 3)
    p(0) = a._1.toByte; p(1) = a._2.toByte; p(2) = a._3.toByte
    p(3) = b._1.toByte; p(4) = b._2.toByte; p(5) = b._3.toByte
    p
  }

  /** LZW data for index stream `idx` (all < 128) via min-code-size 7:
    * codes are 8 bits as long as the dictionary stays under 256, which
    * a CLEAR every 100 literals guarantees — so the encoded bytes ARE
    * the codes and the stream is hand-checkable. */
  private def lzwLiteral(idx: Seq[Int]): Array[Byte] = {
    require(idx.forall(i => i >= 0 && i < 128))
    val codes = ArrayBuffer[Int](0x80) // leading CLEAR
    idx.grouped(100).foreach { g => codes ++= g; codes += 0x80 }
    codes(codes.size - 1) = 0x81 // final CLEAR slot becomes EOI
    val out = ArrayBuffer[Byte](7.toByte)
    codes.map(_.toByte).grouped(255).foreach { blk =>
      out += blk.size.toByte; out ++= blk
    }
    out += 0
    out.toArray
  }

  private def screen(w: Int, h: Int, globalPal: Option[Array[Byte]]): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      Array((if (globalPal.isDefined) 0x80 | 0x06 else 0).toByte, 0.toByte,
        0.toByte) ++ globalPal.getOrElse(Array.empty[Byte])

  private def imageDesc(w: Int, h: Int, interlaced: Boolean = false,
                        localPal: Option[Array[Byte]] = None): Array[Byte] =
    Array(0x2c.toByte) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
      Array((((if (localPal.isDefined) 0x80 | 0x06 else 0)) |
        (if (interlaced) 0x40 else 0)).toByte) ++
      localPal.getOrElse(Array.empty[Byte])

  private val trailer = Array(0x3b.toByte)

  test("literal-coded GIF: two-color image, exact means") {
    // 4x2: first pixel color A=(200,100,50), rest B=(10,20,30)
    val idx = 0 +: Seq.fill(7)(1)
    val g = screen(4, 2, Some(palette((200, 100, 50), (10, 20, 30)))) ++
      imageDesc(4, 2) ++ lzwLiteral(idx) ++ trailer
    val r = GifKernels.decode(g).get
    assert((r.width, r.height) == ((4, 2)))
    assert(r.meanR == (200 + 7 * 10) / 8.0)
    assert(r.meanG == (100 + 7 * 20) / 8.0)
    assert(r.meanB == (50 + 7 * 30) / 8.0)
  }

  test("clear-every-100 framing survives multi-block streams (>255 codes)") {
    // 20x20 = 400 pixels: forces several CLEARs and two sub-blocks
    val idx = Seq.tabulate(400)(i => i % 2)
    val g = screen(20, 20, Some(palette((100, 0, 0), (0, 100, 0)))) ++
      imageDesc(20, 20) ++ lzwLiteral(idx) ++ trailer
    val r = GifKernels.decode(g).get
    assert(r.meanR == 50.0 && r.meanG == 50.0 && r.meanB == 0.0)
  }

  test("interlaced image: de-interlace mapping is a bijection (sums survive)") {
    // 2x8, every row a distinct color index — a rowMap collision would
    // overwrite one row and drop another, moving the mean
    val pal = new Array[Byte](128 * 3)
    for (i <- 0 until 8) pal(3 * i) = (10 * (i + 1)).toByte // R = 10(i+1)
    val idx = (0 until 16).map(_ / 2) // rows 0..7 -> indices 0..7
    val g = screen(2, 8, Some(pal)) ++ imageDesc(2, 8, interlaced = true) ++
      lzwLiteral(idx) ++ trailer
    val r = GifKernels.decode(g).get
    assert(r.meanR == (10 + 20 + 30 + 40 + 50 + 60 + 70 + 80) / 8.0)
    assert(r.meanG == 0.0 && r.meanB == 0.0)
  }

  test("local color table overrides the global one") {
    val g = screen(1, 1, Some(palette((9, 9, 9), (9, 9, 9)))) ++
      imageDesc(1, 1, localPal = Some(palette((77, 88, 99), (0, 0, 0)))) ++
      lzwLiteral(Seq(0)) ++ trailer
    val r = GifKernels.decode(g).get
    assert((r.meanR, r.meanG, r.meanB) == ((77.0, 88.0, 99.0)))
  }

  test("extensions are skipped; animated GIF reports the FIRST frame") {
    val gce = Array(0x21, 0xf9, 4, 0, 0, 0, 0, 0).map(_.toByte) // GCE
    val comment = Array(0x21.toByte, 0xfe.toByte, 3.toByte, 'h'.toByte,
      'e'.toByte, 'y'.toByte, 0.toByte)
    val frame1 = imageDesc(1, 1) ++ lzwLiteral(Seq(0))
    val frame2 = imageDesc(1, 1) ++ lzwLiteral(Seq(1))
    val g = screen(1, 1, Some(palette((11, 22, 33), (200, 200, 200)))) ++
      comment ++ gce ++ frame1 ++ gce ++ frame2 ++ trailer
    val r = GifKernels.decode(g).get
    assert((r.meanR, r.meanG, r.meanB) == ((11.0, 22.0, 33.0)))
  }

  private def imageDescAt(x: Int, y: Int, w: Int, h: Int): Array[Byte] =
    Array(0x2c.toByte) ++ le16(x) ++ le16(y) ++ le16(w) ++ le16(h) ++
      Array(0.toByte)

  // ---- frames() (round 11): the full animation walk ----

  test("frames(): two-frame animation with GCE state, per-frame means") {
    // frame 1: 4x2 at (0,0), A then Bs; GCE disposal 1, delay 123
    // frame 2: 3x2 at (1,0), B then As; GCE disposal 2, delay 7,
    //          transparent index 0 (the 5 A-pixels count as transparent)
    val gce1 = Array(0x21, 0xf9, 4, 0x04, 123, 0, 0, 0).map(_.toByte)
    val gce2 = Array(0x21, 0xf9, 4, 0x09, 7, 0, 0, 0).map(_.toByte)
    val g = screen(4, 2, Some(palette((200, 100, 50), (10, 20, 30)))) ++
      gce1 ++ imageDesc(4, 2) ++ lzwLiteral(0 +: Seq.fill(7)(1)) ++
      gce2 ++ imageDescAt(1, 0, 3, 2) ++ lzwLiteral(1 +: Seq.fill(5)(0)) ++
      trailer
    val fs = GifKernels.frames(g).get
    assert(fs.size == 2)
    val f1 = fs(0)
    assert((f1.x, f1.y, f1.w, f1.h) == ((0, 0, 4, 2)))
    assert((f1.delayCs, f1.disposal, f1.transparentPx) == ((123, 1, 0L)))
    assert(f1.meanR == (200 + 7 * 10) / 8.0)
    val f2 = fs(1)
    assert((f2.x, f2.y, f2.w, f2.h) == ((1, 0, 3, 2)))
    assert((f2.delayCs, f2.disposal, f2.transparentPx) == ((7, 2, 5L)))
    assert(f2.meanR == (10 + 5 * 200) / 6.0)
    assert(f2.meanG == (20 + 5 * 100) / 6.0)
    assert(f2.meanB == (30 + 5 * 50) / 6.0)
    // decode() keeps its frame-1 contract on the same blob
    assert(GifKernels.decode(g).get.meanR == f1.meanR)
  }

  test("frames(): EOI mid-sub-block — trailing bytes skipped to the terminator") {
    // frame 1 data: one sub-block [CLEAR, literal 0, EOI, junk, junk]
    val f1data = Array(7, 5, 0x80, 0x00, 0x81, 0x55, 0x66, 0).map(_.toByte)
    val g = screen(1, 1, Some(palette((40, 50, 60), (0, 0, 0)))) ++
      imageDesc(1, 1) ++ f1data ++
      imageDesc(1, 1) ++ lzwLiteral(Seq(1)) ++ trailer
    val fs = GifKernels.frames(g).get
    assert(fs.size == 2)
    assert(fs(0).meanR == 40.0 && fs(1).meanR == 0.0)
  }

  test("frames() fails closed blob-wide") {
    val pal = palette((1, 2, 3), (4, 5, 6))
    val one = screen(1, 1, Some(pal)) ++ imageDesc(1, 1) ++ lzwLiteral(Seq(0))
    assert(GifKernels.frames(one ++ trailer).exists(_.size == 1))
    // a later frame truncated mid-data poisons the WHOLE blob
    val two = one ++ imageDesc(1, 1) ++ lzwLiteral(Seq(1))
    assert(GifKernels.frames(two.dropRight(3)).isEmpty)
    // zero frames before the trailer is not an animation
    assert(GifKernels.frames(screen(1, 1, Some(pal)) ++ trailer).isEmpty)
    // an invalid block introducer after a good frame
    assert(GifKernels.frames(one ++ Array(0x99.toByte) ++ trailer).isEmpty)
  }

  test("ImageIO-encoded animated GIF: every frame decoded, exact means") {
    val pal = (0 until 256).map { i =>
      ((i * 31) % 256, (i * 7 + 3) % 256, (i * i + 11) % 256)
    }
    val cm = new java.awt.image.IndexColorModel(8, 256,
      pal.map(_._1.toByte).toArray, pal.map(_._2.toByte).toArray,
      pal.map(_._3.toByte).toArray)
    val (w, h) = (9, 7)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val sums = ArrayBuffer.empty[(Long, Long, Long)]
    for (f <- 0 until 3) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = (x * 13 + y * 41 + f * 29) % 256
        val (r, g, b) = pal(i)
        sr += r; sg += g; sb += b
        img.getRaster.setSample(x, y, 0, i)
      }
      sums += ((sr, sg, sb))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val fs = GifKernels.frames(bos.toByteArray).get
    assert(fs.size == 3)
    val n = (w * h).toDouble
    for (f <- 0 until 3) {
      assert((fs(f).w, fs(f).h) == ((w, h)))
      assert(fs(f).meanR == sums(f)._1 / n)
      assert(fs(f).meanG == sums(f)._2 / n)
      assert(fs(f).meanB == sums(f)._3 / n)
    }
  }

  test("corrupt and out-of-scope shapes fail closed to None") {
    val pal = palette((1, 2, 3), (4, 5, 6))
    val good = screen(4, 2, Some(pal)) ++ imageDesc(4, 2) ++
      lzwLiteral(0 +: Seq.fill(7)(1)) ++ trailer
    assert(GifKernels.decode(good).isDefined)
    assert(GifKernels.decode(null).isEmpty)
    assert(GifKernels.decode("GIF88a".getBytes ++ good.drop(6)).isEmpty)
    assert(GifKernels.decode(good.take(30)).isEmpty)          // truncated
    // trailer before any image
    assert(GifKernels.decode(screen(4, 2, Some(pal)) ++ trailer).isEmpty)
    // no color table anywhere
    assert(GifKernels.decode(screen(4, 2, None) ++ imageDesc(4, 2) ++
      lzwLiteral(Seq(0, 1, 0, 1, 0, 1, 0, 1)) ++ trailer).isEmpty)
    // pixel shortfall: 4x2 descriptor, 3 pixels of data
    assert(GifKernels.decode(screen(4, 2, Some(pal)) ++ imageDesc(4, 2) ++
      lzwLiteral(Seq(0, 1, 1)) ++ trailer).isEmpty)
    // pixel excess: 1x1 descriptor, 4 pixels of data
    assert(GifKernels.decode(screen(1, 1, Some(pal)) ++ imageDesc(1, 1) ++
      lzwLiteral(Seq(0, 1, 1, 1)) ++ trailer).isEmpty)
    // code beyond the dictionary: first code must be a literal
    val badFirst = lzwLiteral(Seq(0)); badFirst(2 + 1) = 0x90.toByte
    assert(GifKernels.decode(screen(1, 1, Some(pal)) ++ imageDesc(1, 1) ++
      badFirst ++ trailer).isEmpty)
  }

  // ---- the independent encoder: javax.imageio ----

  private def indexedImage(w: Int, h: Int, pal: Array[(Int, Int, Int)],
                           idx: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val cm = new java.awt.image.IndexColorModel(8, pal.length,
      pal.map(_._1.toByte), pal.map(_._2.toByte), pal.map(_._3.toByte))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idx(x, y))
    img
  }

  test("ImageIO-encoded GIF: real variable-width LZW decodes to exact means") {
    // 97x41 with an 8-color palette and enough structure to push the
    // dictionary through several width growths
    val pal = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30),
      (200, 150, 100), (1, 2, 3), (99, 98, 97), (50, 60, 70))
    val (w, h) = (97, 41)
    def pick(x: Int, y: Int) = ((x * x + y * 3 + x * y) % 8 + 8) % 8
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(indexedImage(w, h, pal, pick), "gif", bos),
      "JDK has no GIF writer?")
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val c = pal(pick(x, y)); sr += c._1; sg += c._2; sb += c._3
    }
    val r = GifKernels.decode(bos.toByteArray).get
    val n = (w * h).toDouble
    assert((r.width, r.height) == ((w, h)))
    assert(r.meanR == sr / n && r.meanG == sg / n && r.meanB == sb / n)
  }

  test("ImageIO-encoded GIF: highly repetitive image (deep LZW chains)") {
    // constant-plus-stripe content makes the encoder emit long
    // composite chains — the KwKwK path and deep chain walks
    val pal = Array((8, 16, 32), (128, 64, 192))
    val (w, h) = (64, 64)
    def pick(x: Int, y: Int) = if (y == 32) 1 else 0
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(indexedImage(w, h, pal, pick), "gif", bos)
    val r = GifKernels.decode(bos.toByteArray).get
    val n = (w * h).toDouble
    assert(r.meanR == (63 * 64 * 8 + 64 * 128) / n)
    assert(r.meanG == (63 * 64 * 16 + 64 * 64) / n)
    assert(r.meanB == (63 * 64 * 32 + 64 * 192) / n)
  }

  test("RasterKernels front door dispatches GIF by magic") {
    val g = screen(1, 1, Some(palette((5, 6, 7), (0, 0, 0)))) ++
      imageDesc(1, 1) ++ lzwLiteral(Seq(0)) ++ trailer
    assert(RasterKernels.decode(g).exists(_.meanR == 5.0))
  }
}
