package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.Acquire
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** HTTP acquisition against a local in-JVM server — no network egress.
  * Covers pagination stop, retry-with-backoff on 5xx, permanent 4xx,
  * and the landed-JSONL → Spark read round trip.
  */
class AcquireSpec extends SparkSpec {

  private def withServer(routes: (String, HttpExchange => Unit)*)
                        (body: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => { h(ex); ex.close() })
    }
    server.start()
    try body(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, s: String = ""): Unit = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  test("paginated fetch lands one JSONL per page and stops on 404") {
    val out = Files.createTempDirectory("acquire").toString
    withServer("/api" -> { ex =>
      val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
      if (page < 3)
        respond(ex, 200, s"""{"doc_id": $page, "text": "page $page"}""")
      else respond(ex, 404)
    }) { port =>
      val report = Acquire.fetchJsonPages(
        p => s"http://127.0.0.1:$port/api?page=$p", out, maxPages = 10)
      assert(report.landedFiles.size == 3 && report.failedPages.isEmpty)
      // distributed parse of the landed files: the actual pipeline step
      val df = spark.read.schema("doc_id LONG, text STRING").json(s"$out/*.jsonl")
      assert(df.count() == 3)
      assert(df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L, 2L))
    }
  }

  test("5xx retries with backoff until success; attempts are reported") {
    val out = Files.createTempDirectory("acquire").toString
    val hits = new AtomicInteger(0)
    withServer("/flaky" -> { ex =>
      if (hits.incrementAndGet() <= 2) respond(ex, 503)
      else respond(ex, 200, """{"ok": true}""")
    }) { port =>
      val report = Acquire.fetchJsonPages(
        _ => s"http://127.0.0.1:$port/flaky", out, maxPages = 1,
        retries = 3, backoffMs = 1)
      assert(report.landedFiles.size == 1)
      assert(report.pages.head.attempts == 3)
    }
  }

  test("5xx beyond the retry budget fails THAT page, not the run") {
    val out = Files.createTempDirectory("acquire").toString
    withServer("/half" -> { ex =>
      val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
      if (page == 0) respond(ex, 500)
      else respond(ex, 200, s"""{"doc_id": $page}""")
    }) { port =>
      val report = Acquire.fetchJsonPages(
        p => s"http://127.0.0.1:$port/half?page=$p", out, maxPages = 2,
        retries = 1, backoffMs = 1)
      assert(report.failedPages == Seq(0))
      assert(report.pages.map(_.page) == Seq(0, 1))
      assert(report.landedFiles.size == 1)
    }
  }

  test("a shorter re-run clears stale pages from a prior longer run") {
    val out = Files.createTempDirectory("acquire").toString
    val limit = new AtomicInteger(5)
    withServer("/api" -> { ex =>
      val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
      if (page < limit.get) respond(ex, 200, s"""{"doc_id": $page}""")
      else respond(ex, 404)
    }) { port =>
      def run() = Acquire.fetchJsonPages(
        p => s"http://127.0.0.1:$port/api?page=$p", out, maxPages = 10)
      assert(run().landedFiles.size == 5)
      limit.set(2) // the source shrank; a glob reader must not see pages 2-4
      assert(run().landedFiles.size == 2)
      val df = spark.read.schema("doc_id LONG").json(s"$out/*.jsonl")
      assert(df.count() == 2)
    }
  }

  test("a re-run that lands nothing preserves the prior run's snapshot") {
    val out = Files.createTempDirectory("acquire").toString
    val dead = new AtomicInteger(0)
    withServer("/api" -> { ex =>
      val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
      if (dead.get() == 1) respond(ex, 500)
      else if (page < 3) respond(ex, 200, s"""{"doc_id": $page}""")
      else respond(ex, 404)
    }) { port =>
      def run() = Acquire.fetchJsonPages(
        p => s"http://127.0.0.1:$port/api?page=$p", out, maxPages = 10,
        retries = 1, backoffMs = 1)
      assert(run().landedFiles.size == 3)
      dead.set(1) // the source goes down entirely
      val failed = run()
      // cleanup-first had a data-loss window here: the good snapshot
      // was deleted before the first (failing) fetch. Now the failed
      // run lands nothing AND deletes nothing.
      assert(failed.landedFiles.isEmpty && failed.failedPages.nonEmpty)
      val df = spark.read.schema("doc_id LONG").json(s"$out/*.jsonl")
      assert(df.count() == 3)
      // staging dirs never survive a completed run
      val leftover = Files.newDirectoryStream(
        java.nio.file.Paths.get(out), ".incoming-*")
      try assert(!leftover.iterator().hasNext) finally leftover.close()
    }
  }

  test("non-404 client errors fail immediately without retries") {
    val out = Files.createTempDirectory("acquire").toString
    val hits = new AtomicInteger(0)
    withServer("/forbidden" -> { ex =>
      hits.incrementAndGet(); respond(ex, 403)
    }) { port =>
      val report = Acquire.fetchJsonPages(
        _ => s"http://127.0.0.1:$port/forbidden", out, maxPages = 1,
        retries = 5, backoffMs = 1)
      assert(report.pages.head.status == 403 && report.pages.head.attempts == 1)
      assert(hits.get() == 1)
    }
  }
}
