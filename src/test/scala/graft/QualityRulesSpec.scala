package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[TF.gopherRules]] / [[TF.c4Rules]] — the published Gopher (Rae et
  * al. 2021, A1.1) and C4 (Raffel et al. 2020 §2.2) quality-rule
  * suites. Each case plants a document violating exactly one rule and
  * asserts that rule (and only that rule) flips the verdict; the
  * metric values themselves are hand-computed.
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  // a 25-word document that passes every Gopher rule at minWords = 20:
  // mean word length in [3,10], no symbols, all-alpha words, no
  // bullet/ellipsis lines, stopwords "the" and "with" present
  private val good =
    ("the quick brown fox jumps over lazy dogs with great speed today " +
      "while many other animals watch from their warm dens under trees").trim

  private def gopher(text: String, minWords: Int = 20): Row =
    Seq(text).toDF("t")
      .select(TF.gopherRules(col("t"), minWords = minWords).as("g"))
      .select(col("g.*")).head()

  private def c4(text: String): Row =
    Seq(text).toDF("t").select(TF.c4Rules(col("t")).as("c"))
      .select(col("c.*")).head()

  test("gopher: the good document passes, with hand-checked stats") {
    val r = gopher(good)
    assert(r.getAs[Long]("n_words") == 23L)
    val meanLen = r.getAs[Double]("mean_word_len")
    assert(meanLen > 3.0 && meanLen < 10.0)
    assert(r.getAs[Double]("symbol_ratio") == 0.0)
    assert(r.getAs[Double]("frac_alpha") == 1.0)
    assert(r.getAs[Double]("bullet_frac") == 0.0)
    assert(r.getAs[Double]("ellipsis_frac") == 0.0)
    assert(r.getAs[Long]("stop_hits") == 2L) // "the", "with"
    assert(r.getAs[Boolean]("keep"))
  }

  test("gopher: each rule flips keep on its own") {
    // word count below the band
    assert(!gopher("the fox runs with joy").getAs[Boolean]("keep"))
    // mean word length too small (unit-length words)
    val short = (("a b c d e f g h i j " * 3) + "the x with y").trim
    val rShort = gopher(short)
    assert(rShort.getAs[Double]("mean_word_len") < 3.0 &&
      !rShort.getAs[Boolean]("keep"))
    // symbol ratio: hash marks push past 0.1
    val symb = good + " ## ## ##"
    val rSymb = gopher(symb)
    assert(rSymb.getAs[Double]("symbol_ratio") > 0.1 &&
      !rSymb.getAs[Boolean]("keep"))
    // alphabetic-word fraction below 0.8 (numeric tokens)
    val nums = good + " 11 22 33 44 55 66 77 88 99 10 12 13 14 15 16 17 18 19 20 21"
    val rNums = gopher(nums)
    assert(rNums.getAs[Double]("frac_alpha") < 0.8 &&
      !rNums.getAs[Boolean]("keep"))
    // bullet lines over 90% (words kept alpha-rich and >=3 chars so
    // ONLY the bullet rule fails)
    val bullets = (1 to 20).map(_ => "• many items sit on the shelf with care")
      .mkString("\n")
    val rBul = gopher(bullets)
    assert(rBul.getAs[Double]("bullet_frac") == 1.0 &&
      !rBul.getAs[Boolean]("keep"))
    // ellipsis line endings over 30%
    val ell = Seq(good + " …", good + "...", good).mkString("\n")
    val rEll = gopher(ell)
    assert(rEll.getAs[Double]("ellipsis_frac") > 0.3 &&
      !rEll.getAs[Boolean]("keep"))
    // fewer than two distinct stopwords
    val noStops = (("lorem dolor amet consectetur " * 6) + "magna via").trim
    val rStop = gopher(noStops)
    assert(rStop.getAs[Long]("stop_hits") < 2L &&
      !rStop.getAs[Boolean]("keep"))
  }

  test("gopher: '...' runs count non-overlapping; '…' counts per char") {
    assert(gopher("....").getAs[Double]("symbol_ratio") == 1.0) // one '...'
    val r = gopher("… and ... more")
    // 4 words, 2 symbols
    assert(r.getAs[Double]("symbol_ratio") == 0.5)
  }

  test("gopher: repeated stopword counts once; bullet/ellipsis fracs are 0 with no lines") {
    val r = gopher("the the the the the")
    assert(r.getAs[Long]("stop_hits") == 1L)
    assert(gopher("").getAs[Double]("bullet_frac") == 0.0)
    assert(gopher("").getAs[Long]("n_words") == 0L)
    assert(!gopher("").getAs[Boolean]("keep"))
  }

  test("c4: line rule keeps >=5-word terminal-punct lines; clean is the kept text") {
    val page = Seq(
      "This line has five words.",     // kept
      "Too short.",                     // < 5 words
      "this line has no terminal punct",// no punct
      "  ",                             // empty: not a line
      "Does a question mark count too?",// kept
      "Quoted lines also make the cut.\"" // kept (ends with ")
    ).mkString("\n")
    val r = c4(page)
    assert(r.getAs[Long]("n_lines") == 5L)
    assert(r.getAs[Long]("n_kept_lines") == 3L)
    assert(r.getAs[String]("clean") ==
      "This line has five words.\nDoes a question mark count too?\nQuoted lines also make the cut.\"")
  }

  test("c4: page rules — sentences, lorem ipsum, curly brace") {
    val threeSent = "One sentence here. Two sentences now! Three is enough?"
    assert(c4(threeSent).getAs[Long]("n_sentences") == 3L)
    assert(c4(threeSent).getAs[Boolean]("keep"))
    assert(!c4("Only one. And two!").getAs[Boolean]("keep"))
    assert(c4(threeSent + " Lorem Ipsum dolor").getAs[Boolean]("has_lorem"))
    assert(!c4(threeSent + " Lorem Ipsum dolor").getAs[Boolean]("keep"))
    assert(c4(threeSent + " { code }").getAs[Boolean]("has_brace"))
    assert(!c4(threeSent + " { code }").getAs[Boolean]("keep"))
    // "..." is one sentence-punct run, not three
    assert(c4("Wait... what. Really?").getAs[Long]("n_sentences") == 3L)
  }

  test("null text: both suites return zeros and keep = false, never NULL") {
    val df = Seq(null.asInstanceOf[String]).toDF("t")
      .select(TF.gopherRules(col("t"), 20).as("g"), TF.c4Rules(col("t")).as("c"))
      .select(col("g.n_words"), col("g.keep").as("gk"),
        col("c.n_lines"), col("c.keep").as("ck"), col("c.clean"))
    val r = df.head()
    assert(r.getAs[Long]("n_words") == 0L)
    assert(!r.getAs[Boolean]("gk") && !r.getAs[Boolean]("ck"))
    assert(r.getAs[String]("clean") == "")
  }
}
