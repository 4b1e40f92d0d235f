package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** One page of a paged endpoint: raw record payloads (one JSON object
  * per string) and the cursor of the next page, if any. */
final case class Page(records: Seq[String], nextCursor: Option[String])

/** The connector seam (SURVEY §7.4.10): every external service
  * (Kobo S1, PDS trips/tracks S6/S7, Sheets S8) stays DRIVER-side
  * behind this interface and lands raw records in the landing zone;
  * Spark only ever reads landed files. Tests drive the whole loop from
  * a local-file-backed fake — no network in CI, ever.
  *
  * `sinceId` mirrors Kobo's server-side `since_id` filter
  * (`/root/reference/R/retrieve-survey-data.R:140-147`): endpoints that
  * support it skip already-landed rows at the source; for those that
  * don't, [[Fetcher.fetchToLandingZone]] re-filters client-side, so the
  * landing zone never duplicates an id either way. */
trait PagedEndpoint {
  /** Fetch one page; `cursor = None` means the first page. */
  def fetch(cursor: Option[String], sinceId: Option[Long]): Page
}

/** A paged endpoint reading pre-captured page files `page_00000.jsonl`,
  * `page_00001.jsonl`, … from a local directory — the test double, and
  * equally a replay tool for captured API responses. */
final class FilePagedEndpoint(dir: String) extends PagedEndpoint {
  override def fetch(cursor: Option[String], sinceId: Option[Long]): Page = {
    val n = cursor.map(_.toInt).getOrElse(0)
    val p = Paths.get(dir, f"page_$n%05d.jsonl")
    if (!Files.exists(p)) Page(Seq.empty, None)
    else {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
      import scala.jdk.CollectionConverters._
      val next = if (Files.exists(Paths.get(dir, f"page_${n + 1}%05d.jsonl")))
        Some((n + 1).toString) else None
      Page(lines.asScala.toSeq.filter(_.nonEmpty), next)
    }
  }
}

/** A real HTTP JSON endpoint, parameterized on URL construction and
  * response parsing so each service (Kobo asset export, PDS trips /
  * tracks, Sheets CSV export) is a thin wiring of public API shapes.
  * NOT exercised in CI (the build environment has no egress) — the
  * fetch loop, pagination and HWM resume are tested through
  * [[FilePagedEndpoint]]; this class only owns the transport. */
final class HttpJsonEndpoint(
    urlFor: (Option[String], Option[Long]) => String,
    parse: String => Page,
    headers: Map[String, String] = Map.empty) extends PagedEndpoint {
  override def fetch(cursor: Option[String], sinceId: Option[Long]): Page = {
    val conn = new java.net.URL(urlFor(cursor, sinceId))
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setRequestMethod("GET")
    val body = try {
      val in = conn.getInputStream
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    } finally conn.disconnect()
    parse(body)
  }
}

/** The reference's retry discipline (`purrr::insistently` with
  * exponential backoff, at most 10 tries, pauses capped at 5 minutes —
  * `R/ingest-pds-data.R:226-235`) as an endpoint decorator. `sleep` is
  * injected so specs run instantly and the policy itself is the unit
  * under test; after the last attempt the failure propagates. */
final class RetryingEndpoint(
    inner: PagedEndpoint,
    maxTries: Int = 10,
    pauseBaseMs: Long = 1000L,
    pauseCapMs: Long = 5 * 60 * 1000L,
    sleep: Long => Unit = Thread.sleep) extends PagedEndpoint {
  override def fetch(cursor: Option[String], sinceId: Option[Long]): Page = {
    var attempt = 1
    var out: Option[Page] = None
    while (out.isEmpty) {
      try out = Some(inner.fetch(cursor, sinceId))
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= maxTries) throw e
          sleep(math.min(pauseBaseMs << (attempt - 1), pauseCapMs))
          attempt += 1
      }
    }
    out.get
  }
}

/** Airtable's client-side throttle (the API ceiling is 5 req/s; the
  * reference paces at 4/s — `R/airtable.R:53-55`): a minimum gap
  * between consecutive fetches. Clock and sleep are injected for
  * testability; the fetch loop is single-threaded driver code. */
final class ThrottledEndpoint(
    inner: PagedEndpoint,
    minGapMs: Long = 250L,
    nowMs: () => Long = System.currentTimeMillis _,
    sleep: Long => Unit = Thread.sleep) extends PagedEndpoint {
  private var lastMs: Long = Long.MinValue
  override def fetch(cursor: Option[String], sinceId: Option[Long]): Page = {
    val now = nowMs()
    if (lastMs != Long.MinValue && now - lastMs < minGapMs)
      sleep(minGapMs - (now - lastMs))
    lastMs = nowMs()
    inner.fetch(cursor, sinceId)
  }
}

/** Concrete endpoint wirings for the reference's services — public API
  * shapes only, transport owned by [[HttpJsonEndpoint]], pagination +
  * resume owned by [[Fetcher]]. Like the transport, these are not
  * exercised in CI (no egress): the loop they plug into is what the
  * specs drive, through [[FilePagedEndpoint]]. */
object Connectors {

  /** Kobo v2 asset data (S1, `R/retrieve-survey-data.R:77-151`):
    * limit/start paging where the cursor IS the `next` URL of the
    * previous response, with the server-side `since_id` filter
    * expressed as a `{"_id":{"$gte":…}}` query (the reference re-fetches
    * the boundary row; the fetch loop's client-side filter drops it). */
  def kobo(server: String, assetId: String, apiToken: String,
           limit: Int = 1000): HttpJsonEndpoint =
    new HttpJsonEndpoint(
      urlFor = (cursor, sinceId) => cursor.getOrElse {
        val base = s"https://$server/api/v2/assets/$assetId/data.json?limit=$limit&start=0"
        sinceId.fold(base) { s =>
          base + "&query=" + java.net.URLEncoder.encode(
            s"""{"_id":{"$$gte":$s}}""", "UTF-8")
        }
      },
      parse = parseKoboPage,
      headers = Map("Authorization" -> s"Token $apiToken"))

  /** Kobo page body: `{"count":N,"next":url|null,"results":[…]}` —
    * one raw JSON object per record, `next` as the cursor. */
  private[graft] def parseKoboPage(body: String): Page = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(body)
    val results = root.path("results")
    val recs = (0 until results.size).map(i => results.get(i).toString)
    val next = Option(root.get("next")).filterNot(_.isNull).map(_.asText)
    Page(recs, next)
  }

  /** PDS trip points CSV (S7, `R/retrieve-pds-data.R:96-110`):
    * single-shot export, landed as raw CSV lines. */
  def pdsTracks(token: String, secret: String, tripId: Long): HttpJsonEndpoint =
    new HttpJsonEndpoint(
      urlFor = (_, _) =>
        s"https://analytics.pelagicdata.com/api/$token/v1/trips/$tripId/points",
      parse = body => Page(body.linesIterator.filter(_.nonEmpty).toSeq, None),
      headers = Map("X-API-SECRET" -> secret))

  /** Google Sheets CSV export (S8): single-shot public export URL. */
  def sheetCsv(spreadsheetId: String, gid: String): HttpJsonEndpoint =
    new HttpJsonEndpoint(
      urlFor = (_, _) =>
        s"https://docs.google.com/spreadsheets/d/$spreadsheetId/export?format=csv&gid=$gid",
      parse = body => Page(body.linesIterator.filter(_.nonEmpty).toSeq, None))
}

final case class FetchReport(pages: Int, landed: Long, highWaterMark: Option[Long])

/** Driver-side fetch-to-landing-zone loop: follows the endpoint's
  * cursor chain, filters records at or under the landed high-water mark
  * (resume), and appends one `batch_<runId>_p<n>.jsonl` file per
  * non-empty page. File naming is caller-supplied (`runId`) — no wall
  * clock in the loop, so runs are replayable. */
object Fetcher {

  /** Max record id already in the landing zone; None when absent or
    * empty. Missing directory = fresh start; any OTHER read failure
    * propagates (swallowing it would re-land everything — the same
    * error discipline as [[graft.streaming.Incremental]]). */
  def landedHighWaterMark(spark: SparkSession, landingDir: String,
                          idOf: String => Long): Option[Long] = {
    if (!Files.isDirectory(Paths.get(landingDir))) None
    else {
      import spark.implicits._
      val ids = spark.read.textFile(s"$landingDir/*.jsonl")
        .filter(_.nonEmpty).map(idOf)
      if (ids.isEmpty) None else Some(ids.agg(org.apache.spark.sql.functions.max("value")).head().getLong(0))
    }
  }

  def fetchToLandingZone(spark: SparkSession, endpoint: PagedEndpoint,
                         landingDir: String, runId: String,
                         idOf: String => Long): FetchReport = {
    val hwm = landedHighWaterMark(spark, landingDir, idOf)
    Files.createDirectories(Paths.get(landingDir))
    var cursor: Option[String] = None
    var pages = 0
    var landed = 0L
    var newHwm = hwm
    var done = false
    while (!done) {
      val page = endpoint.fetch(cursor, hwm)
      // client-side resume guard for endpoints that ignore sinceId
      val fresh = page.records.filter(r => hwm.forall(idOf(r) > _))
      if (fresh.nonEmpty) {
        Files.write(
          Paths.get(landingDir, f"batch_${runId}_p$pages%05d.jsonl"),
          fresh.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
        landed += fresh.size
        val pageMax = fresh.map(idOf).max
        newHwm = Some(newHwm.fold(pageMax)(math.max(_, pageMax)))
      }
      pages += 1
      cursor = page.nextCursor
      done = cursor.isEmpty
    }
    FetchReport(pages, landed, newHwm)
  }
}
