package graft
import org.scalatest.funsuite.AnyFunSuite
/** Throughput probe (not a correctness pin): decoder MB/s on the level-3
  * 5 MB text vector, printed for SCALING.md. Tagged always-pass. */
class ZstdPerfProbe extends AnyFunSuite {
  test("probe") {
    val p = java.nio.file.Paths.get("/tmp/z5_l3.zst")
    assume(java.nio.file.Files.exists(p))
    val comp = java.nio.file.Files.readAllBytes(p)
    val raw = graft.functions.ZstdKernels.decompress(comp)
    assert(raw != null)
    for (_ <- 0 until 3) graft.functions.ZstdKernels.decompress(comp) // warm
    val t0 = System.nanoTime()
    val n = 10
    for (_ <- 0 until n) graft.functions.ZstdKernels.decompress(comp)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"decoded ${raw.length} B x $n in $sec%.2f s = ${raw.length * n / sec / 1e6}%.1f MB/s")
    // gzip comparison on the same content
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos); g.write(raw); g.close()
    val gz = bos.toByteArray
    for (_ <- 0 until 3) graft.functions.WarcKernels.gunzipAll(gz)
    val t1 = System.nanoTime()
    for (_ <- 0 until n) graft.functions.WarcKernels.gunzipAll(gz)
    val sec2 = (System.nanoTime() - t1) / 1e9
    info(f"gunzip (JDK Inflater): ${raw.length * n / sec2 / 1e6}%.1f MB/s")
  }
}
