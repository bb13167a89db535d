package graft

import graft.functions.RobotsKernels
import graft.operators.Robots
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 9309 robots evaluation — [[RobotsKernels]] (parse + glob match)
  * and [[Robots.filter]] (group selection, most-specific-match
  * precedence, default-allow). Match cases follow the RFC's own
  * examples; the operator cases pin the published Google semantics
  * (longest pattern wins, allow wins length ties).
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def m(path: String, pattern: String): Boolean =
    RobotsKernels.matches(UTF8String.fromString(path), UTF8String.fromString(pattern))

  test("glob match: prefix, * spans, $ anchors") {
    assert(m("/fish/salmon", "/fish"))
    assert(m("/fishheads", "/fish"))       // prefix, not segment, semantics
    assert(!m("/Fish", "/fish"))           // case-sensitive paths
    assert(m("/filename.php", "/*.php"))
    assert(m("/folder/filename.php?p=1", "/*.php"))
    assert(!m("/", "/*.php"))
    assert(m("/filename.php", "/*.php$"))
    assert(!m("/filename.php?p=1", "/*.php$"))
    assert(m("/fish.php", "/fish*.php"))
    assert(m("/fishheads/catfish.php?parameters", "/fish*.php"))
    assert(!m("/fish.PHP", "/fish*.php"))
    assert(m("/a/b", "/a/b$"))
    assert(!m("/a/bc", "/a/b$"))
    assert(m("/anything", "/"))
    assert(m("/a..b", "/a*b"))             // * matches empty too? no: a..b has chars; check empty:
    assert(m("/ab", "/a*b"))               // * matches the empty sequence
    assert(m("/x", "*"))
    assert(!m("/abc", "/abc$x"))           // $ only anchors at the END of the pattern
  }

  test("parse: grouping, case-insensitivity, comments, empty disallow, unknown directives") {
    val txt =
      """# robots for example.com
        |User-agent: GoodBot
        |User-Agent: OtherBot
        |Disallow: /private
        |Allow: /private/ok$
        |
        |User-agent: *
        |Disallow: /tmp # trailing comment
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: https://example.com/sitemap.xml
        |""".stripMargin
    val rows = Robots.rules(Seq(("h", txt)).toDF("host", "text"), "host", "text")
      .as[(String, String, Boolean, String)].collect().toSet
    assert(rows == Set(
      ("h", "goodbot", false, "/private"),
      ("h", "goodbot", true, "/private/ok$"),
      ("h", "otherbot", false, "/private"),
      ("h", "otherbot", true, "/private/ok$"),
      ("h", "*", false, "/tmp")))
  }

  test("parse: rules before any group are ignored; agent after rules opens a new group") {
    val txt =
      """Disallow: /orphan
        |User-agent: a
        |Disallow: /x
        |User-agent: b
        |Disallow: /y
        |""".stripMargin
    val rows = Robots.rules(Seq(("h", txt)).toDF("host", "text"), "host", "text")
      .as[(String, String, Boolean, String)].collect().toSet
    // 'b' follows a RULE line, so it starts a fresh group: /y is b's only
    assert(rows == Set(("h", "a", false, "/x"), ("h", "b", false, "/y")))
  }

  test("filter: group selection, longest-match precedence, allow tie-break, default allow") {
    val robots = Seq(
      ("a.com",
        """User-agent: graftbot
          |Disallow: /nope
          |User-agent: *
          |Disallow: /
          |""".stripMargin),
      ("b.com",
        """User-agent: *
          |Disallow: /private
          |Allow: /private/ok$
          |Disallow: /dir
          |Allow: /dir
          |""".stripMargin)
    ).toDF("host", "text")
    val urls = Seq(
      (1L, "a.com", "/fine"),        // named group has only /nope -> allow
      (2L, "a.com", "/nope/x"),      // named group disallows
      (3L, "b.com", "/private/doc"), // * group disallows
      (4L, "b.com", "/private/ok"),  // longer Allow wins over /private
      (5L, "b.com", "/dir/page"),    // same-length allow/disallow: allow wins
      (6L, "c.com", "/whatever")     // no robots row: default allow
    ).toDF("id", "host", "path")
    val got = Robots.filter(urls, "host", "path", robots, "host", "text", "GraftBot")
      .select(col("id"), col("allowed"), col("robots_rule"))
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((true, null)))
    assert(got(2L) == ((false, "/nope")))
    assert(got(3L) == ((false, "/private")))
    assert(got(4L) == ((true, "/private/ok$")))
    assert(got(5L) == ((true, "/dir")))
    assert(got(6L) == ((true, null)))
  }

  test("filter plan: corpus side never shuffles — dimension aggregates, broadcast join, projection") {
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /x")).toDF("host", "text")
    val urls = Seq((1L, "a.com", "/x/1")).toDF("id", "host", "path")
    val plan = Robots.filter(urls, "host", "path", robots, "host", "text", "bot")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // nothing above the join may shuffle (the decision is a pure
    // projection), and the streamed (urls) subtree — the text between
    // the join node and its BroadcastExchange child — has no Exchange:
    // every exchange in the plan belongs to the robots dimension side
    val joinAt = plan.indexOf("BroadcastHashJoin")
    assert(!plan.substring(0, joinAt).contains("Exchange"), plan)
    val bcastAt = plan.indexOf("BroadcastExchange", joinAt)
    assert(bcastAt > 0, plan)
    assert(!plan.substring(joinAt + 1, bcastAt).contains("Exchange"), plan)
  }

  test("SQL surface: robots_parse and robots_match registered") {
    val n = spark.sql(
      "SELECT size(robots_parse('User-agent: *\nDisallow: /a\nAllow: /a/b')) AS n")
      .as[Int].head()
    assert(n == 2)
    assert(spark.sql("SELECT robots_match('/a/b/c', '/a/*/c$') AS m").as[Boolean].head())
  }

  test("sitemaps: group-independent, file order, comments stripped, case-insensitive") {
    val txt =
      """User-agent: a
        |Disallow: /x
        |Sitemap: https://h.com/map1.xml # primary
        |User-agent: b
        |SITEMAP: https://h.com/map2.xml
        |Sitemap:
        |""".stripMargin
    import graft.functions.RobotsKernels
    import org.apache.spark.unsafe.types.UTF8String
    val arr = RobotsKernels.sitemaps(UTF8String.fromString(txt))
    val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    assert(got == Seq("https://h.com/map1.xml", "https://h.com/map2.xml"))
    val viaSql = spark.sql(
      "SELECT robots_sitemaps('Sitemap: https://a/s.xml') AS s")
      .as[Seq[String]].head()
    assert(viaSql == Seq("https://a/s.xml"))
  }

  test("crawlDelays kernel: group attribution, malformed/absurd values " +
    "skipped, multi-agent groups fan out") {
    import graft.functions.RobotsKernels
    def rows(s: String): Seq[(String, Double)] = {
      val a = RobotsKernels.crawlDelays(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getDouble(1))
      }
    }
    assert(rows("User-agent: A\nUser-agent: B\nCrawl-delay: 1.5\n") ==
      Seq(("a", 1.5), ("b", 1.5)))
    assert(rows("User-agent: *\nCrawl-delay: soon\n") == Seq.empty)   // NaN-ish
    assert(rows("User-agent: *\nCrawl-delay: -1\n") == Seq.empty)     // negative
    assert(rows("User-agent: *\nCrawl-delay: 100000\n") == Seq.empty) // absurd
    assert(rows("Crawl-delay: 3\n") == Seq.empty)                     // no group
    // a delay closes the group like a rule does: the next user-agent
    // starts a NEW group
    assert(rows("User-agent: A\nCrawl-delay: 1\nUser-agent: B\nCrawl-delay: 2\n")
      == Seq(("a", 1.0), ("b", 2.0)))
  }

  test("fetchSchedule: named group beats *, first directive wins, default " +
    "fills, ranks deterministic, budget visible; dimension broadcasts") {
    import graft.operators.Robots
    val urls = Seq(
      ("https://a.com/1", "a.com"), ("https://a.com/2", "a.com"),
      ("https://a.com/3", "a.com"),
      ("https://b.com/x", "b.com"), ("https://b.com/y", "b.com"),
      ("https://c.com/only", "c.com")).toDF("url", "host")
    val robots = Seq(
      ("a.com", "User-agent: bot\nCrawl-delay: 2\nUser-agent: *\nCrawl-delay: 9\n"),
      ("b.com", "User-agent: *\nCrawl-delay: 0.5\nUser-agent: *\nCrawl-delay: 7\n"))
      .toDF("rhost", "rtext") // c.com has no robots -> default
    val out = Robots.fetchSchedule(urls, "url", "host", robots,
      "rhost", "rtext", agent = "bot", defaultDelaySec = 1.0, maxPerHost = 2)
    val got = out.select("url", "crawl_delay", "fetch_rank",
        "fetch_offset_sec", "within_budget")
      .as[(String, Double, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("https://a.com/1") == ((2.0, 0L, 0.0, true)))
    assert(got("https://a.com/2") == ((2.0, 1L, 2.0, true)))
    assert(got("https://a.com/3") == ((2.0, 2L, 4.0, false))) // over budget, kept
    assert(got("https://b.com/x") == ((0.5, 0L, 0.0, true)))  // first directive
    assert(got("https://b.com/y") == ((0.5, 1L, 0.5, true)))
    assert(got("https://c.com/only") == ((1.0, 0L, 0.0, true))) // default
    // plan: the delay dimension broadcasts; the frontier side pays
    // exactly ONE exchange (the window's host partitioning — the
    // fetcher's natural layout). The second hashpartitioning in the
    // tree is the DIMENSION-side group-by inside the broadcast build.
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }

  test("kernel fuzz: parse and match never throw") {
    val rnd = new scala.util.Random(0x0b07513L)
    val alphabet = "Uuser-agnt:AlowDi/*$# \n\telborpqx."
    for (_ <- 0 until 800) {
      val s = new String(Array.fill(rnd.nextInt(120))(
        alphabet.charAt(rnd.nextInt(alphabet.length))))
      RobotsKernels.parse(UTF8String.fromString(s))
      val pat = new String(Array.fill(rnd.nextInt(20))(
        "/*$ab".charAt(rnd.nextInt(5))))
      RobotsKernels.matches(UTF8String.fromString(s.take(40)), UTF8String.fromString(pat))
    }
  }
}
