package graft

import graft.functions.Lz4Kernels
import org.scalatest.funsuite.AnyFunSuite

/** [[Lz4Kernels]] against the REAL `lz4` CLI: the decoder is checked
  * on reference-encoder output across levels, block sizes,
  * linked/independent modes, checksum variants, and the legacy
  * format; [[Lz4Kernels.compressStore]]'s frames are decoded by the
  * reference binary. Corruption/truncation fuzz pins the fail-closed
  * contract, and the XXH32 implementation is pinned on published
  * vectors.
  */
class Lz4Spec extends AnyFunSuite {

  private val cli: Option[String] =
    Seq("/root/miniconda/bin/lz4", "/usr/bin/lz4", "/usr/local/bin/lz4")
      .find(p => new java.io.File(p).canExecute)

  private def cliCompress(data: Array[Byte], args: String*): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("lz4")
    val in = dir.resolve("in.raw"); val out = dir.resolve("out.lz4")
    java.nio.file.Files.write(in, data)
    val cmd = Seq(cli.get, "-f", "-q") ++ args ++ Seq(in.toString, out.toString)
    val p = new ProcessBuilder(cmd: _*).inheritIO().start()
    assert(p.waitFor() == 0, s"lz4 CLI failed: $cmd")
    java.nio.file.Files.readAllBytes(out)
  }

  private def cliDecompress(comp: Array[Byte]): Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("lz4d")
    val in = dir.resolve("in.lz4"); val out = dir.resolve("out.raw")
    java.nio.file.Files.write(in, comp)
    val p = new ProcessBuilder(cli.get, "-d", "-f", "-q",
      in.toString, out.toString).inheritIO().start()
    assert(p.waitFor() == 0, "lz4 -d failed on compressStore output")
    java.nio.file.Files.readAllBytes(out)
  }

  private def shapes: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(0x124c)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    Seq(
      "empty" -> Array.emptyByteArray,
      "one" -> Array[Byte]('x'),
      "tiny-rep" -> ("ab" * 10).getBytes("US-ASCII"),
      "flat" -> Array.fill[Byte](300000)('a'),
      "text" -> (0 until 120000).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ").getBytes("US-ASCII"),
      "runs" -> Array.concat((0 until 20000).map(_ =>
        Array.fill[Byte](rnd.nextInt(30) + 1)(rnd.nextInt(256).toByte)): _*),
      "random" -> Array.fill[Byte](150000)(rnd.nextInt(256).toByte))
  }

  test("XXH32 matches the published empty-input vectors and the " +
    "REFERENCE binary's content-checksum trailer across lengths " +
    "(every xxh32 code path: <16, 4-tail, byte-tail, long)") {
    // the two published vectors from the xxHash spec (public)
    assert(Lz4Kernels.xxh32(Array.emptyByteArray, 0, 0, 0) == 0x02CC5D05)
    assert(Lz4Kernels.xxh32(Array.emptyByteArray, 0, 0, 0x9E3779B1) == 0x36B78AE7)
    assume(cli.isDefined, "no lz4 CLI in this environment")
    val rnd = new scala.util.Random(0x1332)
    for (n <- Seq(1, 3, 4, 7, 15, 16, 17, 31, 100, 4096, 100001)) {
      val data = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      // default CLI frames end with XXH32(content): the reference
      // binary is the vector source
      val frame = cliCompress(data, "-1")
      val stored = (frame(frame.length - 4) & 0xff) |
        ((frame(frame.length - 3) & 0xff) << 8) |
        ((frame(frame.length - 2) & 0xff) << 16) |
        ((frame(frame.length - 1) & 0xff) << 24)
      assert(stored == Lz4Kernels.xxh32(data, 0, n, 0), s"n=$n")
    }
  }

  test("decodes reference-encoder frames bit-exactly: levels 1/9/12, " +
    "block sizes 64K-4M, independent AND linked blocks, block " +
    "checksums, content size, no-frame-crc, every data shape") {
    assume(cli.isDefined, "no lz4 CLI in this environment")
    for ((name, data) <- shapes; lvl <- Seq("-1", "-9")) {
      val dec = Lz4Kernels.decompress(cliCompress(data, lvl))
      assert(dec != null && java.util.Arrays.equals(dec, data), s"$name @$lvl")
    }
    val big = shapes.find(_._1 == "text").get._2
    for (extra <- Seq(
      Seq("-12", "-B4", "-BD"), Seq("-9", "-B5", "-BD", "-BX"),
      Seq("-1", "-B7"), Seq("-9", "--content-size"),
      Seq("-9", "--no-frame-crc"), Seq("-12", "-B4", "-BD", "-BX",
        "--content-size"))) {
      val dec = Lz4Kernels.decompress(cliCompress(big, extra: _*))
      assert(dec != null && java.util.Arrays.equals(dec, big), extra.toString)
    }
  }

  test("legacy format (-l) decodes; multi-frame concatenation " +
    "decodes to the concatenated content; skippable frames skipped") {
    assume(cli.isDefined, "no lz4 CLI in this environment")
    val big = shapes.find(_._1 == "runs").get._2
    val leg = Lz4Kernels.decompress(cliCompress(big, "-l", "-9"))
    assert(leg != null && java.util.Arrays.equals(leg, big))
    val a = "first frame payload ".getBytes("US-ASCII")
    val b2 = "and the second".getBytes("US-ASCII")
    val fa = cliCompress(a, "-1")
    val fb = cliCompress(b2, "-9")
    val skip = Array[Byte](0x5a, 0x2a, 0x4d, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
    val dec = Lz4Kernels.decompress(fa ++ skip ++ fb)
    assert(dec != null && java.util.Arrays.equals(dec, a ++ b2))
    // legacy + standard concatenation
    val dec2 = Lz4Kernels.decompress(cliCompress(a, "-l") ++ fb)
    assert(dec2 != null && java.util.Arrays.equals(dec2, a ++ b2))
    assert(Lz4Kernels.decompress(skip) == null) // no content frame
  }

  test("compressStore frames decode in the REFERENCE binary and in " +
    "this decoder, above and below the 64 KB block cut") {
    val rnd = new scala.util.Random(0x570f)
    for (n <- Seq(0, 1, 1000, 65535, 65536, 200000)) {
      val data = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      val frame = Lz4Kernels.compressStore(data)
      val own = Lz4Kernels.decompress(frame)
      assert(own != null && java.util.Arrays.equals(own, data), s"own n=$n")
      if (cli.isDefined)
        assert(java.util.Arrays.equals(cliDecompress(frame), data),
          s"reference decode n=$n")
    }
  }

  test("fail-closed: dict frames refused, header/content checksum " +
    "mismatches NULL, truncations NULL, declared-size mismatch NULL, " +
    "bit-flip fuzz never throws") {
    assume(cli.isDefined, "no lz4 CLI in this environment")
    val data = ("lz4 fail closed " * 1000).getBytes("US-ASCII")
    val frame = cliCompress(data, "-9", "--content-size")
    for (cut <- Seq(1, 4, 6, 8, frame.length / 2, frame.length - 1))
      assert(Lz4Kernels.decompress(frame.take(cut)) == null, s"cut=$cut")
    // flip a bit in the trailing content checksum
    val bad = frame.clone(); bad(bad.length - 1) = (bad.last ^ 1).toByte
    assert(Lz4Kernels.decompress(bad) == null)
    // corrupt the header checksum byte
    val hb = frame.clone(); hb(6) = (hb(6) ^ 0x55).toByte
    assert(Lz4Kernels.decompress(hb) == null)
    // declare a dict: set FLG DictID bit and fix nothing else -> HC
    // mismatch; also a frame with a VALID descriptor but dict bit
    val withDict = frame.clone(); withDict(4) = (withDict(4) | 0x01).toByte
    assert(Lz4Kernels.decompress(withDict) == null)
    val rnd = new scala.util.Random(0xfa4f)
    for (_ <- 0 until 300) {
      val fz = frame.clone()
      fz(rnd.nextInt(fz.length)) = rnd.nextInt(256).toByte
      Lz4Kernels.decompress(fz) // must never throw
    }
  }
}
