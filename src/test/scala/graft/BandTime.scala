package graft
object BandTime {
  def main(args: Array[String]): Unit = {
    import graft.functions.JaroWinkler
    for (tau <- Seq(0.95, 0.99, 0.9999)) {
      val jmin = (tau - 5e-7 - 0.4) / 0.6
      val r = 3 * jmin - 2
      // warm
      var s = 0
      for (i <- 0 until 200000) s += JaroWinkler.lengthBand(1 + (i % 1000000), r)
      val t0 = System.nanoTime()
      val n = 2000000
      for (i <- 0 until n) s += JaroWinkler.lengthBand(1 + (i % 1000000), r)
      val ns = (System.nanoTime() - t0).toDouble / n
      println(f"[band-time] tau=$tau%.4f r=$r%.4f ns/call=$ns%.1f (lengths cycling 1..1e6) sink=$s%d")
    }
  }
}
