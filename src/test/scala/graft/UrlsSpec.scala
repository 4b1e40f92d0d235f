package graft

import graft.text.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(url).toDF("u")
      .select(Urls.canonicalize($"u").as("c")).as[Option[String]].head()
    r.orNull
  }

  test("canonicalize: case, www, default ports, fragments, trailing slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/?b=2&a=1#frag")
      == "https://example.com/Path?a=1&b=2")
    assert(canon("http://example.com:80/") == "http://example.com")
    assert(canon("http://example.com:8080/x") == "http://example.com:8080/x")
    // the path keeps its case — only scheme/host are case-insensitive
    assert(canon("https://A.B/CasedPath") == "https://a.b/CasedPath")
  }

  test("canonicalize: tracking params dropped, survivors sorted, empty query elided") {
    assert(canon("https://e.com/p?utm_source=x&utm_campaign=y&fbclid=1&gclid=2")
      == "https://e.com/p")
    assert(canon("https://e.com/p?z=1&a=2&utm_medium=m") == "https://e.com/p?a=2&z=1")
    // `ref` is tracking; `refresh` is not (the class is anchored on '=')
    assert(canon("https://e.com/p?ref=feed&refresh=1") == "https://e.com/p?refresh=1")
  }

  test("canonicalize: http vs https stay distinct; malformed rows go NULL") {
    assert(canon("http://e.com/p") != canon("https://e.com/p"))
    assert(canon("not a url") == null)
    assert(canon("mailto:a@b.c") == null)
  }

  test("keepLatest keeps the newest crawl per canonical group, ties to min id") {
    val crawls = Seq(
      (1L, "https://www.e.com/p?utm_source=a", 100L),
      (2L, "https://e.com/p", 300L),
      (3L, "HTTPS://E.COM:443/p/", 200L),
      (4L, "https://e.com/q", 50L),
      (5L, "https://e.com/p", 300L) // tie on ts with id 2 → 2 wins
    ).toDF("id", "url", "ts")
    val kept = Urls.keepLatest(crawls, "url", "ts", "id")
      .select($"id", $"canonical_url", $"n_crawls")
      .as[(Long, String, Long)].collect().toSet
    assert(kept == Set(
      (2L, "https://e.com/p", 4L),
      (4L, "https://e.com/q", 1L)))
  }

  test("keepLatest: malformed URLs are quarantined, never merged") {
    val crawls = Seq(
      (1L, "garbage", 10L),
      (2L, "garbage", 20L),
      (3L, "https://e.com/x", 5L)
    ).toDF("id", "url", "ts")
    val kept = Urls.keepLatest(crawls, "url", "ts", "id")
    assert(kept.count() == 3) // both malformed rows kept as their own groups
    assert(kept.filter($"canonical_url".isNull).count() == 2)
  }

  test("host extracts the domain key: lowercase, www and any port stripped") {
    val h = Seq(
      "HTTPS://WWW.Example.COM:443/x",
      "http://sub.example.com:8080/y",
      "https://example.com",
      "garbage"
    ).toDF("u").select(Urls.host($"u")).as[Option[String]].collect().toSeq
    assert(h == Seq(Some("example.com"), Some("sub.example.com"),
      Some("example.com"), None))
  }

  test("incrementalKeepLatest: new lands, newer displaces, stale and batch losers drop") {
    val landed = Seq(
      ("https://e.com/a", 100L, 1L),
      ("https://e.com/b", 200L, 2L)
    ).toDF("canonical_url", "ts", "id")
    val batch = Seq(
      (10L, "https://www.e.com/a", 150L),  // newer than landed 100 → displaces
      (11L, "https://e.com/b/", 50L),      // loses its batch group to 14 → drops
      (12L, "https://e.com/c", 10L),       // new canonical → lands
      (13L, "https://e.com/c", 20L),       // batch winner over 12 (newer)
      (14L, "https://e.com/b", 200L)       // ts tie with landed id 2; 14 > 2 → drops
    ).toDF("id", "url", "ts")
    val out = Urls.incrementalKeepLatest(batch, landed, "url", "ts", "id")
      .select($"id", $"batch_winner", $"kept", $"landed_ts")
      .as[(Long, Boolean, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) == ((true, true, Some(100L))))
    assert(out(11L) == ((false, false, Some(200L))))
    assert(out(12L) == ((false, false, None)))
    assert(out(13L) == ((true, true, None)))
    assert(out(14L) == ((true, false, Some(200L))))
  }

  test("keepLatest is deterministic under repartitioning") {
    val crawls = (1L to 200L).map(i =>
      (i, s"https://www.site-${i % 17}.com/p/${i % 7}?utm_source=$i", i)).toDF("id", "url", "ts")
    val a = Urls.keepLatest(crawls, "url", "ts", "id")
      .select($"id").as[Long].collect().sorted.toSeq
    val b = Urls.keepLatest(crawls.repartition(13), "url", "ts", "id")
      .select($"id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.size == 17 * 7)
  }
}
