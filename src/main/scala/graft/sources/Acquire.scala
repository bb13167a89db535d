package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.Duration

/** HTTP acquisition — the engine-side replacement for the reference's
  * scraper fleet (`motogp_scaper.py:14-27,98-153`,
  * `scraping/quali.py:200-255`, `scraping/race_date_script.py:77-176`,
  * `scraping/race_coord.py:88-127`): fetch paginated HTTP resources to
  * local JSONL landing files that `Ingest`/`spark.read` then parse
  * distributed.
  *
  * Deliberately DRIVER-SIDE (plain JDK `HttpClient`, no Spark): web
  * acquisition is edge work — rate-limited, sequential, politeness-
  * bound — and parallelizing it across executors multiplies load on the
  * origin server without making the pipeline faster (the reference's
  * scrapers sleep between requests for the same reason,
  * `motogp_scaper.py:86,143`). Scale lives in the SUBSEQUENT distributed
  * parse of the landed files, not in the fetch. Unlike the reference's
  * bare `requests.get` (which aborts a whole run on one transient 500),
  * every page retries with exponential backoff and failures are
  * recorded per page, never fatal to the pages already landed.
  */
object Acquire {

  /** One page's outcome: landed file (None if permanently failed),
    * HTTP status of the last attempt — or the sentinel -1 when the last
    * attempt never produced a status (connection-level failure) — and
    * attempts made. */
  final case class PageResult(page: Int, file: Option[String],
                              status: Int, attempts: Int)

  /** Acquisition summary: per-page outcomes in page order. */
  final case class Report(pages: Seq[PageResult]) {
    def landedFiles: Seq[String] = pages.flatMap(_.file)
    def failedPages: Seq[Int] = pages.filter(_.file.isEmpty).map(_.page)
  }

  /** Fetch pages `0 until maxPages` of `urlFor` into `outDir` as
    * `page-NNNNN.jsonl`, one response body per file. Stops early the
    * first time the server answers 404 (the past-the-end convention of
    * paginated APIs). A page is retried up to `retries` times on 5xx or
    * connection failure with doubling backoff starting at `backoffMs`;
    * 4xx (other than the stopping 404) fails the page immediately
    * (client errors do not heal by retrying).
    *
    * Re-run semantics: after a run that landed at least one page, any
    * `page-*.jsonl` in `outDir` NOT landed by that run is deleted — a
    * shorter re-run after a longer one would otherwise leave stale
    * high-numbered pages that a subsequent `spark.read.json(outDir)`
    * glob silently ingests. A run that lands nothing deletes nothing,
    * so a dead source never destroys the previous good snapshot.
    * Readers that must be glob-free can use `Report.landedFiles`.
    */
  def fetchJsonPages(urlFor: Int => String, outDir: String,
                     maxPages: Int, retries: Int = 3,
                     backoffMs: Long = 100L,
                     requestTimeout: Duration = Duration.ofSeconds(30))
      : Report = {
    require(maxPages >= 1, s"maxPages must be >= 1, got $maxPages")
    require(retries >= 0, s"retries must be >= 0, got $retries")
    Files.createDirectories(Paths.get(outDir))
    // pages land in a HIDDEN staging dir and are committed into outDir
    // only after the whole run: a crash mid-run (urlFor throwing,
    // interrupt, OOM) leaves the previous snapshot byte-identical —
    // neither destroyed (the old cleanup-first hazard) nor mixed with a
    // half-landed new generation (the old write-in-place hazard). The
    // dot prefix keeps Spark's file index from ever globbing the
    // staging files.
    val staging = Files.createTempDirectory(Paths.get(outDir), ".incoming-")
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(requestTimeout)
      .build()
    val results = Seq.newBuilder[PageResult]
    var page = 0
    var pastEnd = false
    while (page < maxPages && !pastEnd) {
      val url = urlFor(page)
      var attempt = 0
      var done: Option[PageResult] = None
      while (done.isEmpty) {
        attempt += 1
        val status =
          try {
            val req = HttpRequest.newBuilder(URI.create(url))
              .timeout(requestTimeout).GET().build()
            val res = client.send(req, HttpResponse.BodyHandlers.ofString())
            res.statusCode() match {
              case 200 =>
                val f = staging.resolve(f"page-$page%05d.jsonl")
                Files.write(f, res.body().getBytes(StandardCharsets.UTF_8),
                  StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
                done = Some(PageResult(page, Some(f.toString), 200, attempt))
                200
              case 404 =>
                pastEnd = true
                done = Some(PageResult(page, None, 404, attempt))
                404
              case s if s >= 500 => s // transient: retry below
              case s => // other 4xx: permanent for this page, keep going
                done = Some(PageResult(page, None, s, attempt))
                s
            }
          } catch {
            case _: java.io.IOException => -1 // connection-level: retry
          }
        if (done.isEmpty) {
          if (attempt > retries)
            done = Some(PageResult(page, None, status, attempt))
          else
            // doubling backoff, CAPPED: an uncapped shift overflows past
            // attempt ~57 (Thread.sleep would throw and kill the run,
            // losing already-landed pages) and even attempt 20 would
            // sleep for hours
            Thread.sleep(math.min(backoffMs << math.min(attempt - 1, 6), 30000L))
        }
      }
      // the stopping 404 is the end MARKER, not a failed page
      if (!(pastEnd && done.get.status == 404)) results += done.get
      page += 1
    }
    val staged = Report(results.result())
    // COMMIT: only a run that landed at least one page touches outDir —
    // move the staged pages in (replacing same-named predecessors) and
    // delete stale page files the new generation didn't produce, so a
    // shorter re-run can't leave high-numbered pages for a glob read to
    // silently ingest. A run that landed nothing commits nothing: a
    // dead source never destroys the previous good snapshot
    // (`failedPages` is the caller's signal). Only OUR naming pattern
    // is touched — never other files in a shared dir.
    val report =
      if (staged.landedFiles.isEmpty) staged
      else {
        val landedNames = Seq.newBuilder[String]
        val committed = staged.pages.map { pr =>
          pr.file match {
            case Some(f) =>
              val name = Paths.get(f).getFileName.toString
              val dst = Paths.get(outDir, name)
              Files.move(Paths.get(f), dst,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              landedNames += name
              pr.copy(file = Some(dst.toString))
            case None => pr
          }
        }
        val landed = landedNames.result().toSet
        val stale = Files.newDirectoryStream(Paths.get(outDir), "page-*.jsonl")
        try stale.forEach { p =>
          if (!landed.contains(p.getFileName.toString)) Files.delete(p)
        } finally stale.close()
        Report(committed)
      }
    Files.deleteIfExists(staging) // empty after commit (or an empty run)
    report
  }
}
