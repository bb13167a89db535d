package graft

import graft.functions.{RasterKernels, TiffKernels}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** [[TiffKernels]] pins, the two-direction pattern:
  *
  *  - AGAINST THE JDK'S OWN ENCODER: the `javax.imageio` TIFF plugin
  *    (JDK 9+) writes real files — uncompressed, LZW (with the
  *    horizontal predictor the JDK applies), PackBits, both gray and
  *    RGB — and the kernel must reproduce exact source-pixel means
  *    (TIFF is lossless, so equality is exact, no JPEG-style
  *    tolerance).
  *  - AGAINST HAND-BUILT FILES: IFDs assembled byte-by-byte pin both
  *    byte orders, WhiteIsZero inversion, palette ColorMap lookups,
  *    multi-strip layout, PackBits runs, and the fail-closed shapes.
  */
class TiffSpec extends AnyFunSuite {

  // ---- hand-built little-endian TIFF ----

  private def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte,
    (v >>> 16).toByte, (v >>> 24).toByte)
  private def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
  private def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
    (v >>> 8).toByte, v.toByte)

  /** Minimal single-strip file: header(8) + pixel data + IFD. */
  private def tiffLE(w: Int, h: Int, photometric: Int, spp: Int,
                     data: Array[Byte],
                     colorMap: Option[Array[Int]] = None,
                     compression: Int = 1,
                     stripByteCount: Int = -1): Array[Byte] = {
    val dataAt = 8
    val ifdAt = dataAt + data.length
    val entries = ArrayBuffer.empty[Array[Byte]]
    def entry(tag: Int, typ: Int, cnt: Int, value: Int): Array[Byte] =
      le16(tag) ++ le16(typ) ++ le32(cnt) ++ le32(value)
    val bitsCnt = spp
    // bits-per-sample values: inline when spp<=2, else via offset
    val nEntries = 10 + (if (colorMap.isDefined) 1 else 0)
    val afterIfd = ifdAt + 2 + 12 * nEntries + 4
    val bitsAt = afterIfd
    val bitsInline = spp <= 2
    val cmAt = bitsAt + (if (bitsInline) 0 else 2 * spp)
    entries += entry(256, 3, 1, w)
    entries += entry(257, 3, 1, h)
    entries += (if (bitsInline)
      le16(258) ++ le16(3) ++ le32(bitsCnt) ++
        (if (spp == 1) le16(8) ++ le16(0) else le16(8) ++ le16(8))
    else entry(258, 3, bitsCnt, bitsAt))
    entries += entry(259, 3, 1, compression)
    entries += entry(262, 3, 1, photometric)
    entries += entry(273, 4, 1, dataAt)
    entries += entry(277, 3, 1, spp)
    entries += entry(278, 3, 1, h)
    entries += entry(279, 4, 1,
      if (stripByteCount >= 0) stripByteCount else data.length)
    entries += entry(284, 3, 1, 1)
    colorMap.foreach(_ => entries += entry(320, 3, 3 * 256, cmAt))
    val ifd = le16(entries.size) ++ entries.flatten ++ le32(0)
    val tailBits = if (bitsInline) Array.empty[Byte]
      else (0 until spp).flatMap(_ => le16(8)).toArray
    val tailCm = colorMap.map(_.flatMap(le16)).getOrElse(Array.empty[Byte])
    Array('I'.toByte, 'I'.toByte, 42.toByte, 0.toByte) ++ le32(ifdAt) ++
      data ++ ifd ++ tailBits ++ tailCm
  }

  test("little-endian gray, single strip: exact mean") {
    val data = Array[Byte](10, 20, 30, 40, 50, 60)
    val r = TiffKernels.decode(tiffLE(3, 2, 1, 1, data)).get
    assert((r.width, r.height) == ((3, 2)))
    assert(r.meanR == 35.0 && r.meanG == 35.0 && r.meanB == 35.0)
  }

  test("WhiteIsZero gray inverts") {
    val data = Array[Byte](0, 100.toByte, 200.toByte, 255.toByte)
    val r = TiffKernels.decode(tiffLE(2, 2, 0, 1, data)).get
    assert(r.meanR == (255 + 155 + 55 + 0) / 4.0)
  }

  test("RGB chunky: channel order") {
    val data = Array[Byte](10, 20, 30, 40, 50, 60)
    val r = TiffKernels.decode(tiffLE(2, 1, 2, 3, data)).get
    assert((r.meanR, r.meanG, r.meanB) == ((25.0, 35.0, 45.0)))
  }

  test("palette: 16-bit ColorMap, exact /257 rescale") {
    // cm entries bit-replicated (257·v) -> decode to exactly v
    val cm = new Array[Int](3 * 256)
    cm(0) = 257 * 11; cm(256) = 257 * 22; cm(512) = 257 * 33   // index 0
    cm(1) = 257 * 99; cm(257) = 257 * 88; cm(513) = 257 * 77   // index 1
    val data = Array[Byte](0, 1)
    val r = TiffKernels.decode(tiffLE(2, 1, 3, 1, data, Some(cm))).get
    assert((r.meanR, r.meanG, r.meanB) == ((55.0, 55.0, 55.0)))
    // a non-replicated entry: 40000/257
    val cm2 = cm.clone(); cm2(0) = 40000
    val r2 = TiffKernels.decode(tiffLE(1, 1, 3, 1,
      Array[Byte](0), Some(cm2))).get
    assert(r2.meanR == 40000.0 / 257.0)
  }

  test("big-endian (MM) header and values") {
    // hand-build a 1x1 gray MM file
    val data = Array[Byte](77)
    val dataAt = 8
    val ifdAt = dataAt + 1
    def entry(tag: Int, typ: Int, cnt: Int, valHi: Array[Byte]): Array[Byte] =
      be16(tag) ++ be16(typ) ++ be32(cnt) ++ valHi
    // SHORT values sit in the HIGH half of the big-endian value field
    def shortVal(v: Int): Array[Byte] = be16(v) ++ be16(0)
    val entries = Array(
      entry(256, 3, 1, shortVal(1)),
      entry(257, 3, 1, shortVal(1)),
      entry(258, 3, 1, shortVal(8)),
      entry(259, 3, 1, shortVal(1)),
      entry(262, 3, 1, shortVal(1)),
      entry(273, 4, 1, be32(dataAt)),
      entry(277, 3, 1, shortVal(1)),
      entry(278, 3, 1, shortVal(1)),
      entry(279, 4, 1, be32(1)),
      entry(284, 3, 1, shortVal(1)))
    val f = Array('M'.toByte, 'M'.toByte, 0.toByte, 42.toByte) ++
      be32(ifdAt) ++ data ++ be16(entries.length) ++ entries.flatten ++ be32(0)
    assert(TiffKernels.decode(f).get.meanR == 77.0)
  }

  test("PackBits: literal runs, repeat runs, noop") {
    // rows: [5 x 10] then literals 1,2,3,4,5 -> 10 pixels wide? build 5x2
    val packed = Array[Byte](
      (-4).toByte, 10,            // repeat 10 five times
      (-128).toByte,              // noop
      4, 1, 2, 3, 4, 5)           // 5 literals
    val r = TiffKernels.decode(
      tiffLE(5, 2, 1, 1, packed, compression = 32773)).get
    assert(r.meanR == (50 + 15) / 10.0)
  }

  test("fail-closed shapes") {
    val good = tiffLE(3, 2, 1, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    assert(TiffKernels.decode(good).isDefined)
    assert(TiffKernels.decode(good.take(10)).isEmpty)         // truncated
    assert(TiffKernels.decode(Array[Byte]('I', 'I', 41, 0)).isEmpty) // magic
    // strip byte count shorter than the raster promise
    assert(TiffKernels.decode(tiffLE(3, 2, 1, 1,
      Array[Byte](1, 2, 3, 4, 5, 6), stripByteCount = 5)).isEmpty)
    // palette without a ColorMap
    assert(TiffKernels.decode(tiffLE(2, 1, 3, 1, Array[Byte](0, 1))).isEmpty)
    // unsupported compression (Deflate = 8)
    assert(TiffKernels.decode(tiffLE(2, 1, 1, 1, Array[Byte](0, 1),
      compression = 8)).isEmpty)
  }

  // ---- the independent encoder: the JDK's TIFF plugin ----

  private def imageIoTiff(img: java.awt.image.BufferedImage,
                          compression: Option[String]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    val p = writer.getDefaultWriteParam
    compression.foreach { c =>
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  private def grayImg(w: Int, h: Int): (java.awt.image.BufferedImage, Double) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var s = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 37 + y * 11) % 256
      s += v
      img.getRaster.setSample(x, y, 0, v)
    }
    (img, s.toDouble / (w * h))
  }

  private def rgbImg(w: Int, h: Int): (java.awt.image.BufferedImage, (Double, Double, Double)) = {
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
    val n = (w * h).toDouble
    (img, (sr / n, sg / n, sb / n))
  }

  test("ImageIO uncompressed gray and RGB: exact means") {
    val (g, gm) = grayImg(23, 17)
    val rg = TiffKernels.decode(imageIoTiff(g, None)).get
    assert((rg.width, rg.height) == ((23, 17)))
    assert(rg.meanR == gm && rg.meanG == gm && rg.meanB == gm)
    val (c, (er, eg, eb)) = rgbImg(19, 13)
    val rc = TiffKernels.decode(imageIoTiff(c, None)).get
    assert(rc.meanR == er && rc.meanG == eg && rc.meanB == eb)
  }

  test("ImageIO LZW (with the JDK's horizontal predictor): exact means") {
    val (g, gm) = grayImg(40, 30)
    val bytes = imageIoTiff(g, Some("LZW"))
    val r = TiffKernels.decode(bytes).get
    assert(r.meanR == gm)
    val (c, (er, eg, eb)) = rgbImg(33, 21)
    val rc = TiffKernels.decode(imageIoTiff(c, Some("LZW"))).get
    assert(rc.meanR == er && rc.meanG == eg && rc.meanB == eb)
  }

  test("ImageIO PackBits: exact means") {
    val (g, gm) = grayImg(31, 9)
    val r = TiffKernels.decode(imageIoTiff(g, Some("PackBits"))).get
    assert(r.meanR == gm)
  }

  test("RasterKernels front door dispatches TIFF by magic, both orders") {
    val via = RasterKernels.decode(tiffLE(3, 2, 1, 1,
      Array[Byte](1, 2, 3, 4, 5, 6)))
    assert(via.exists(_.width == 3))
  }

  test("imageMeta triage and the full decoder agree on TIFF dimensions") {
    val blob = tiffLE(5, 4, 1, 1, Array.fill[Byte](20)(9))
    val meta = graft.functions.MediaKernels.imageMeta(blob)
    assert(meta != null)
    assert(meta.getUTF8String(0).toString == "tiff")
    val r = TiffKernels.decode(blob).get
    assert(meta.getInt(1) == r.width && meta.getInt(2) == r.height)
    // a real JDK-written file triages too (and in big-endian if the
    // JDK ever switches — the walk honors both orders)
    val (g, _) = grayImg(7, 3)
    val m2 = graft.functions.MediaKernels.imageMeta(imageIoTiff(g, None))
    assert(m2 != null && m2.getInt(1) == 7 && m2.getInt(2) == 3)
  }

  test("imageMeta refuses dimension entries whose value field is an offset") {
    // a LONG entry with count > 1 stores an OFFSET in the value field
    // (TIFF 6.0 §2); trusting it reported garbage dims for a blob the
    // full decoder itself refuses (TiffKernels caps these tags at
    // count 1)
    val data = Array.fill[Byte](20)(9)
    val blob = tiffLE(5, 4, 1, 1, data)
    val at = 8 + data.length + 2 // first IFD entry = tag 256
    assert(((blob(at) & 0xff) | ((blob(at + 1) & 0xff) << 8)) == 256)
    val forged = blob.clone()
    forged(at + 2) = 4 // type LONG
    forged(at + 4) = 2 // count 2 -> value field no longer inline
    forged(at + 8) = 0; forged(at + 9) = 4 // "width" now reads 1024
    assert(graft.functions.TiffKernels.decode(forged).isEmpty)
    assert(graft.functions.MediaKernels.imageMeta(forged) == null)
  }
}
