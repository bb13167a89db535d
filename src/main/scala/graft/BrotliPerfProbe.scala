package graft

/** Brotli decode-throughput probe (round 17, VERDICT r16 #8).
  *
  * Reads `<dir>/<name>.br` / `<dir>/<name>.raw` pairs for names
  * `bin`,`txt` (generate with brotlicffi — see the shell recipe in
  * SCALING.md's brotli section), verifies the roundtrip, and prints
  * the single-thread median decode rate of 10 runs after warmup.
  *
  * r17 measurement on this container (8 MB incompressible q=5 binary;
  * 4 MB match-heavy q=9 text): 414 MB/s binary (was 17 before the
  * one-level 8-bit peek/consume table), 350 MB/s text (was 215).
  */
object BrotliPerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/brperf")
    for (name <- Seq("bin", "txt")) {
      val base = java.nio.file.Paths.get(dir)
      val compP = base.resolve(s"$name.br")
      if (!java.nio.file.Files.exists(compP)) {
        System.err.println(s"missing $compP — see SCALING.md for the " +
          "brotlicffi generation recipe")
      } else {
        val comp = java.nio.file.Files.readAllBytes(compP)
        val raw = java.nio.file.Files.readAllBytes(base.resolve(s"$name.raw"))
        var out: Array[Byte] = null
        for (_ <- 0 until 3) out = graft.functions.BrotliKernels.decompress(comp)
        assert(out != null && java.util.Arrays.equals(out, raw),
          s"$name roundtrip failed")
        val times = (0 until 10).map { _ =>
          val t0 = System.nanoTime()
          graft.functions.BrotliKernels.decompress(comp)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = times(times.length / 2)
        println(f"$name: ${raw.length / med / 1e6}%.1f MB/s (median of 10)")
      }
    }
  }
}
