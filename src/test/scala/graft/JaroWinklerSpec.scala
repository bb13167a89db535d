package graft

import graft.functions.JaroWinkler
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1e-4): Boolean =
    math.abs(a - b) <= eps

  test("textbook reference pairs") {
    // classic values from the record-linkage literature
    assert(approx(JaroWinkler.sim("MARTHA", "MARHTA"), 0.9611))
    assert(approx(JaroWinkler.sim("DIXON", "DICKSONX"), 0.8133))
    assert(approx(JaroWinkler.sim("JELLYFISH", "SMELLYFISH"), 0.8963))
  }

  test("edge cases") {
    assert(JaroWinkler.sim("", "") == 1.0)
    assert(JaroWinkler.sim("a", "") == 0.0)
    assert(JaroWinkler.sim("", "a") == 0.0)
    assert(JaroWinkler.sim("abc", "abc") == 1.0)
    assert(JaroWinkler.sim("abc", "xyz") == 0.0)
  }

  test("winkler bonus only above 0.7 jaro") {
    // completely dissimilar strings get no prefix bonus
    assert(JaroWinkler.sim("ab", "ba") <= 0.7 + 1e-12)
  }

  test("memoized lengthBand equals the reference walk (r13), across r and " +
    "interleaved lengths/ratios sharing the cache") {
    // interleave lengths (big first, then small, then bigger) and ratios
    // so the lazily-extended per-r boundary cache is exercised in every
    // growth order — a coverage bug would disagree with the walk
    val rs = Seq(0.805, 0.85, 0.9, 0.95, 0.99, 0.999)
    val lens = Seq(5000, 1, 2, 17, 100000, 3, 64, 999, 7, 250000, 0, -1)
    for (r <- rs; len <- lens; rAgain <- rs) {
      assert(JaroWinkler.lengthBand(len, r) ==
        JaroWinkler.lengthBandWalk(len, r), s"len=$len r=$r")
      // touch another ratio's cache between queries
      assert(JaroWinkler.lengthBand(len / 2 + 1, rAgain) ==
        JaroWinkler.lengthBandWalk(len / 2 + 1, rAgain), s"len=${len / 2 + 1} r=$rAgain")
    }
    // exhaustive small-length sweep where band boundaries are densest
    for (r <- rs; len <- 0 to 600)
      assert(JaroWinkler.lengthBand(len, r) ==
        JaroWinkler.lengthBandWalk(len, r), s"len=$len r=$r")
  }

  test("property: symmetric, in [0,1], identity = 1 (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    def word(): String =
      (0 until rnd.nextInt(20)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 500) {
      val (a, b) = (word(), word())
      val s = JaroWinkler.sim(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range for ($a, $b)")
      assert(approx(s, JaroWinkler.sim(b, a), 1e-12), s"asymmetric for ($a, $b)")
      assert(JaroWinkler.sim(a, a) == 1.0)
    }
  }
}
