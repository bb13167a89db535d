package graft

import graft.functions.LzwKernels
import org.scalatest.funsuite.AnyFunSuite

/** [[LzwKernels]] against BOTH reference implementations available
  * here: libarchive's encoder (`bsdtar --compress` writes real
  * block-mode `.Z`) checks the decode direction, and `gzip -dc` +
  * `bsdcat` (independent lineages: compress-4.0 unlzw vs libarchive)
  * check [[LzwKernels.compress]] output. Pinned hex fixtures keep
  * coverage alive on a machine without the CLIs.
  */
class LzwSpec extends AnyFunSuite {

  private val bsdtar = Seq("/root/miniconda/bin/bsdtar", "/usr/bin/bsdtar")
    .find(p => new java.io.File(p).canExecute)
  private val bsdcat = Seq("/root/miniconda/bin/bsdcat", "/usr/bin/bsdcat")
    .find(p => new java.io.File(p).canExecute)
  private val gzip = Seq("/usr/bin/gzip", "/bin/gzip")
    .find(p => new java.io.File(p).canExecute)

  private def run(cmd: Seq[String], stdin: Array[Byte] = null): Array[Byte] = {
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(false).start()
    if (stdin != null) p.getOutputStream.write(stdin)
    p.getOutputStream.close()
    val out = p.getInputStream.readAllBytes()
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed")
    out
  }

  private def shapes: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(0x1f9d)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    Seq(
      "empty" -> Array.emptyByteArray,
      "one" -> Array[Byte]('x'),
      "tiny-rep" -> ("ab" * 10).getBytes("US-ASCII"),
      "flat" -> Array.fill[Byte](100000)('a'),
      "text" -> (0 until 60000).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ").getBytes("US-ASCII"),
      "runs" -> Array.concat((0 until 12000).map(_ =>
        Array.fill[Byte](rnd.nextInt(30) + 1)(rnd.nextInt(4).toByte)): _*),
      "random" -> Array.fill[Byte](60000)(rnd.nextInt(256).toByte))
  }

  test("decodes reference-encoder (libarchive) streams bit-exactly: " +
    "bsdtar --compress output across data shapes, checked against " +
    "gzip -dc of the same stream") {
    assume(bsdtar.isDefined && gzip.isDefined, "no bsdtar/gzip CLI")
    for ((name, data) <- shapes if data.nonEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("lzw")
      val in = dir.resolve("in.raw"); val out = dir.resolve("out.tar.Z")
      java.nio.file.Files.write(in, data)
      run(Seq(bsdtar.get, "--create", "--compress", "--file",
        out.toString, "-C", dir.toString, "in.raw"))
      val z = java.nio.file.Files.readAllBytes(out)
      val want = run(Seq(gzip.get, "-dc", out.toString))
      val got = LzwKernels.decompress(z)
      assert(got != null && java.util.Arrays.equals(got, want), name)
    }
  }

  test("compress() output decodes in BOTH reference decoders " +
    "(gzip -dc and bsdcat) and in this decoder: width growth to 16 " +
    "bits, maxbits 12, table-pressure CLEAR, every data shape") {
    for ((name, data) <- shapes;
         (mb, ce) <- Seq((16, 0), (12, 0), (16, 997), (12, 1999))) {
      val z = LzwKernels.compress(data, maxbits = mb, clearEvery = ce)
      val own = LzwKernels.decompress(z)
      assert(own != null && java.util.Arrays.equals(own, data),
        s"own $name mb=$mb ce=$ce")
      val dir = java.nio.file.Files.createTempDirectory("lzw")
      val f = dir.resolve("t.Z")
      java.nio.file.Files.write(f, z)
      if (gzip.isDefined) {
        val dec = run(Seq(gzip.get, "-dc", f.toString))
        assert(java.util.Arrays.equals(dec, data), s"gzip $name mb=$mb ce=$ce")
      }
      if (bsdcat.isDefined) {
        val dec = run(Seq(bsdcat.get, f.toString))
        assert(java.util.Arrays.equals(dec, data), s"bsdcat $name mb=$mb ce=$ce")
      }
    }
  }

  test("pinned fixtures decode offline: block mode (gzip-validated hex) " +
    "and old non-block mode, which libarchive does not implement") {
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // gzip-validated at fixture build: TOBEORNOT... classic, block mode
    val block = unhex("1f9d90549e0829f2448a932754020e2ca890a04184")
    assert(new String(LzwKernels.decompress(block), "US-ASCII") ==
      "TOBEORNOTTOBEORTOBEORNOT")
    // gzip-validated non-block stream (flags 0x10: maxbits 16, bit7 off)
    val old = unhex("1f9d10418400141890e040")
    assert(new String(LzwKernels.decompress(old), "US-ASCII") ==
      "ABABABABABABABAB")
    // header-only stream is a valid empty payload
    assert(LzwKernels.decompress(unhex("1f9d90")).length == 0)
  }

  test("fail-closed: bad magic, reserved flag bits, maxbits out of " +
    "range, truncation, future-code corruption, non-literal first " +
    "code; bit-flip fuzz never throws") {
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(LzwKernels.decompress(null) == null)
    assert(LzwKernels.decompress(unhex("1f9d")) == null) // short
    assert(LzwKernels.decompress(unhex("1f8b90aa")) == null) // gzip magic
    assert(LzwKernels.decompress(unhex("1f9db0aa")) == null) // reserved bit
    assert(LzwKernels.decompress(unhex("1f9d91aa")) == null) // maxbits 17
    assert(LzwKernels.decompress(unhex("1f9d88aa")) == null) // maxbits 8
    // first code = 256 (CLEAR as stream start): 9-bit LSB-first 0x100
    assert(LzwKernels.decompress(unhex("1f9d900001")) == null)
    // literal 'A' then code 300 (far beyond free_ent 257): corrupt
    // bits: 41 (9b) then 300=0x12C (9b) -> bytes 41, 58, 02
    assert(LzwKernels.decompress(unhex("1f9d90415802")) == null)
    val good = LzwKernels.compress(
      ("lzw fuzz corpus " * 500).getBytes("US-ASCII"))
    val rnd = new scala.util.Random(0xfaaf)
    for (_ <- 0 until 300) {
      val bad = good.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      LzwKernels.decompress(bad) // must not throw; null or bytes both fine
    }
    for (cut <- Seq(0, 1, 2, good.length / 2))
      LzwKernels.decompress(good.take(cut)) // no throw
  }
}
