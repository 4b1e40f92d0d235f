package graft

import graft.functions.Dates
import graft.sources.Sources
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("graft-src").toString

  test("allStringCsv reads every column as string (S3 semantics)") {
    val dir = tmp() + "/csv"
    Seq((1, 2.5, "x"), (2, 3.5, "y")).toDF("a", "b", "c")
      .coalesce(1).write.option("header", "true").csv(dir)
    val back = Sources.allStringCsv(spark, dir)
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.count() == 2)
    assert(back.filter($"a" === "1").head().getAs[String]("b") == "2.5")
  }

  test("pdsTripsCsv parses the typed schema incl. the UTC Last Seen format (S4)") {
    val dir = tmp()
    val csv = Seq(
      "Trip,Started,Ended,Boat,Boat Name,Boat Gear,Community,Duration (Seconds),Range (Meters),Distance (Meters),IMEI,Device Id,Last Seen",
      "7,2024-03-01T01:00:00.000Z,2024-03-01T03:00:00.000Z,12,Bo,GN,Com,7200,100,2500,123456789012345,dev1,Fri Mar 01 04:05:06 UTC 2024"
    ).mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "t.csv"), csv)
    val df = Sources.pdsTripsCsv(spark, dir)
    val r = df.head()
    assert(r.getAs[Int]("Trip") == 7)
    assert(r.getAs[java.sql.Timestamp]("Last Seen").toInstant.toString
      == "2024-03-01T04:05:06Z")
    assert(r.getAs[Double]("Distance (Meters)") == 2500.0)
  }

  test("TSV sink writes a single tab-separated file with header (S13)") {
    val dir = tmp() + "/out"
    Sources.writeTsv(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "id\tv" && lines.length == 3)
  }

  test("JSON-lines sink emits one document per row (S14)") {
    val dir = tmp() + "/json"
    Sources.writeJsonLines(Seq((1, "a")).toDF("id", "v"), dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".txt"))
    val line = scala.io.Source.fromFile(files.head).getLines().next()
    assert(line == """{"id":1,"v":"a"}""")
  }

  test("zip bundle packs exported files (S16)") {
    val dir = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.csv"), "x")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "b.csv"), "y")
    val zip = dir + "/bundle.zip"
    Sources.zipDirectory(dir, zip)
    val zf = new java.util.zip.ZipFile(zip)
    try assert(zf.size() == 2) finally zf.close()
  }

  test("floorWeekSunday: every output is a Sunday on or before the input") {
    val df = Seq("2024-03-03", "2024-03-04", "2024-03-09", "2024-03-10")
      .toDF("d").select($"d", Dates.floorWeekSunday($"d").as("w"))
    val got = df.as[(String, String)].collect().toMap
    assert(got == Map(
      "2024-03-03" -> "2024-03-03", // Sunday maps to itself
      "2024-03-04" -> "2024-03-03",
      "2024-03-09" -> "2024-03-03",
      "2024-03-10" -> "2024-03-10"))
  }

  test("uniteCodes skips nulls with '-' separator (alert codes)") {
    val df = Seq((Some(4), None: Option[Int], Some(17)), (None, None, None))
      .toDF("a", "b", "c")
    val got = df.select(Dates.uniteCodes(Seq($"a", $"b", $"c")).as("u"))
      .as[String].collect().toSeq
    assert(got == Seq("4-17", ""))
  }

  test("fetcher: paginates a fake endpoint to the landing zone, HWM resume lands only new ids") {
    import graft.sources.{Fetcher, FilePagedEndpoint}
    val root = java.nio.file.Files.createTempDirectory("fetcher").toString
    val pagesDir = s"$root/pages"; val landing = s"$root/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pagesDir))
    def writePage(n: Int, ids: Seq[Long]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(pagesDir, f"page_$n%05d.jsonl"),
        ids.map(i => s"""{"id": $i, "v": "r$i"}""").mkString("", "\n", "\n").getBytes)
    val idOf = (line: String) => """"id":\s*(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong

    writePage(0, Seq(1L, 2L)); writePage(1, Seq(3L)); writePage(2, Seq(4L, 5L))
    val r1 = Fetcher.fetchToLandingZone(spark, new FilePagedEndpoint(pagesDir), landing, "run1", idOf)
    assert(r1.pages == 3 && r1.landed == 5 && r1.highWaterMark.contains(5L))

    // second generation: page 0 repeats old ids (an endpoint ignoring
    // since_id), later pages add new ones
    writePage(0, Seq(4L, 5L, 6L)); writePage(1, Seq(7L)); writePage(2, Seq.empty)
    val r2 = Fetcher.fetchToLandingZone(spark, new FilePagedEndpoint(pagesDir), landing, "run2", idOf)
    assert(r2.landed == 2 && r2.highWaterMark.contains(7L), s"resume must land only ids above 5: $r2")

    // the landing zone is the Spark-readable contract: ids unique, all present
    val landed = spark.read.json(landing)
    assert(landed.count() == 7)
    assert(landed.select("id").distinct().count() == 7)
    assert(Fetcher.landedHighWaterMark(spark, landing, idOf).contains(7L))
    assert(Fetcher.landedHighWaterMark(spark, s"$root/nope", idOf).isEmpty)
  }

  test("retrying endpoint: exponential backoff with cap, failure after max tries") {
    import graft.sources.{Page, PagedEndpoint, RetryingEndpoint}
    class Flaky(failures: Int) extends PagedEndpoint {
      var calls = 0
      override def fetch(c: Option[String], s: Option[Long]): Page = {
        calls += 1
        if (calls <= failures) throw new java.io.IOException(s"boom $calls")
        Page(Seq("ok"), None)
      }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new Flaky(failures = 4)
    val out = new RetryingEndpoint(flaky, maxTries = 10, pauseBaseMs = 1000,
      pauseCapMs = 4000, sleep = sleeps += _).fetch(None, None)
    assert(out.records == Seq("ok") && flaky.calls == 5)
    // 1s, 2s, 4s, then capped at 4s
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L, 4000L))

    val dead = new Flaky(failures = 99)
    val e = intercept[java.io.IOException] {
      new RetryingEndpoint(dead, maxTries = 3, sleep = _ => ()).fetch(None, None)
    }
    assert(e.getMessage == "boom 3" && dead.calls == 3)
  }

  test("throttled endpoint: enforces the minimum gap between fetches") {
    import graft.sources.{Page, PagedEndpoint, ThrottledEndpoint}
    val inner = new PagedEndpoint {
      override def fetch(c: Option[String], s: Option[Long]) = Page(Seq("r"), None)
    }
    var clock = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t = new ThrottledEndpoint(inner, minGapMs = 250,
      nowMs = () => clock, sleep = d => { sleeps += d; clock += d })
    t.fetch(None, None)          // first call: no gap to honor
    clock += 100                 // 100 ms later
    t.fetch(None, None)          // must sleep the remaining 150 ms
    clock += 300                 // beyond the gap
    t.fetch(None, None)          // no sleep
    assert(sleeps.toSeq == Seq(150L))
  }

  test("kobo page parser: results as raw records, next as cursor, null next ends") {
    import graft.sources.Connectors
    val p1 = Connectors.parseKoboPage(
      """{"count": 3, "next": "https://x/api?start=2", "results": [{"_id": 1}, {"_id": 2}]}""")
    assert(p1.records == Seq("""{"_id":1}""", """{"_id":2}"""))
    assert(p1.nextCursor.contains("https://x/api?start=2"))
    val p2 = Connectors.parseKoboPage("""{"count": 3, "next": null, "results": [{"_id": 3}]}""")
    assert(p2.records == Seq("""{"_id":3}""") && p2.nextCursor.isEmpty)
  }
}
