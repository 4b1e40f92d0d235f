package graft

import graft.text.PrefixSharing

/** The sorted-neighbor LCP scan: hand-checked chains, seam behavior
  * under adversarial partitioning (the two-pass carry must equal a
  * sequential walk), and the all-pairs-max property the census rests
  * on. */
class PrefixSharingSpec extends SparkSpec {
  import spark.implicits._

  test("neighbor LCPs match a hand walk; first row is null") {
    val docs = Seq((1L, "abcx"), (2L, "abcy"), (3L, "abd"), (4L, "zz"))
      .toDF("id", "k")
    val out = PrefixSharing.neighborLcp(docs, "id", "k")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // sorted: abcx, abcy, abd, zz
    assert(out(1L) === -1L)
    assert(out(2L) === 3L) // abcx vs abcy
    assert(out(3L) === 2L) // abcy vs abd
    assert(out(4L) === 0L) // abd vs zz
  }

  test("partitioning never changes the result (seam carries)") {
    val rows = (1L to 97L).map(i => (i, s"p${i % 7}-${"x" * (i % 5).toInt}-$i"))
    val one = PrefixSharing.neighborLcp(
      rows.toDF("id", "k").coalesce(1), "id", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val many = PrefixSharing.neighborLcp(
      rows.toDF("id", "k").repartition(13), "id", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(one === many)
  }

  test("reusable prefix is the max over BOTH neighbors") {
    val docs = Seq((1L, "aaaa"), (2L, "aabb"), (3L, "aabc")).toDF("id", "k")
    val out = PrefixSharing.reusablePrefix(docs, "id", "k")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 2L) // next neighbor aabb shares "aa"
    assert(out(2L) === 3L) // next neighbor aabc shares "aab" > prev's 2
    assert(out(3L) === 3L)
  }

  test("identical keys reuse their full length; singleton reuses 0") {
    val docs = Seq((1L, "same"), (2L, "same"), (9L, "loner")).toDF("id", "k")
    val out = PrefixSharing.reusablePrefix(docs, "id", "k")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 4L && out(2L) === 4L)
    assert(out(9L) === 0L)
  }
}
