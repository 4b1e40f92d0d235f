package graft

import graft.similarity.GridDbscan

/** Hand-built DBSCAN geometries: two separated blobs → two clusters,
  * border adoption, noise isolation, an isolated core singleton, and
  * the ε-boundary (distance exactly ε is a neighbor; one unit past is
  * not). Coordinates are already scaled longs; ε = 100, minPts = 3. */
@org.scalatest.tags.Slow
class GridDbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Long)]): Map[Long, (String, Option[Long])] =
    GridDbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
        epsScaled = 100L, minPts = 3)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("two blobs cluster separately; far point is noise") {
    val blobA = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 0L, 50L))
    val blobB = Seq((10L, 5000L, 5000L), (11L, 5050L, 5000L), (12L, 5000L, 5050L))
    val lone = Seq((99L, 100000L, 100000L))
    val out = run(blobA ++ blobB ++ lone)
    assert(out(1L) === ("core", Some(1L)))
    assert(out(2L) === ("core", Some(1L)))
    assert(out(10L)._1 === "core" && out(10L)._2 === Some(10L))
    assert(out(99L) === ("noise", None))
    assert(out.values.flatMap(_._2).toSet === Set(1L, 10L))
  }

  test("border point adopts its core neighbor's cluster without being core") {
    // 1,2,3 mutually within ε (core at minPts=3); 4 reaches only point 3
    val pts = Seq((1L, 0L, 0L), (2L, 60L, 0L), (3L, 0L, 60L), (4L, 0L, 150L))
    val out = run(pts)
    assert(out(3L)._1 === "core")
    assert(out(4L) === ("border", Some(1L)))
  }

  test("distance exactly ε counts; ε+1 does not") {
    // chain: 1-(100)-2-(100)-3 → all three core (each has self + 1 + ...)
    // point 2 sees 1,2,3 → core; 1 sees 1,2 → not core (minPts=3)
    val out = run(Seq((1L, 0L, 0L), (2L, 100L, 0L), (3L, 200L, 0L)))
    assert(out(2L)._1 === "core")
    assert(out(1L) === ("border", Some(2L)))
    val out2 = run(Seq((1L, 0L, 0L), (2L, 101L, 0L), (3L, 202L, 0L)))
    assert(out2.values.forall(_._1 === "noise"))
  }

  test("dense single blob with no core neighbors elsewhere: one cluster id") {
    val pts = (0L until 5L).map(i => (i + 1, i * 10, 0L))
    val out = run(pts)
    assert(out.values.forall { case (role, c) => role == "core" && c == Some(1L) })
  }

  test("cell-boundary pairs are still found (3×3 neighborhood)") {
    // ids straddle a grid boundary: cells differ but distance < ε
    val out = run(Seq((1L, 99L, 0L), (2L, 101L, 0L), (3L, 105L, 0L)))
    assert(out.values.forall(_._1 === "core"))
    assert(out.values.map(_._2).toSet === Set(Some(1L)))
  }

  private def rebuildVsExtend(base: Seq[(Long, Long, Long)],
                              delta: Seq[(Long, Long, Long)]): Unit = {
    val idx = GridDbscan.index(base.toDF("id", "x", "y"), "id", "x", "y",
      epsScaled = 100L, minPts = 3)
    val ext = GridDbscan.labels(
        GridDbscan.extend(idx, delta.toDF("id", "x", "y"), "id", "x", "y"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val reb = GridDbscan.cluster((base ++ delta).toDF("id", "x", "y"),
        "id", "x", "y", epsScaled = 100L, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(ext === reb)
  }

  test("extend ≡ rebuild: delta bridges two clusters (cascading merge)") {
    rebuildVsExtend(
      base = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 100L, 0L),
        (10L, 400L, 0L), (11L, 450L, 0L), (12L, 500L, 0L)),
      delta = Seq((20L, 225L, 0L), (21L, 275L, 0L), (22L, 175L, 0L),
        (23L, 325L, 0L)))
  }

  test("extend ≡ rebuild: delta promotes a border point to core") {
    // base: 1,2,3 core chain; 4 border off point 3
    rebuildVsExtend(
      base = Seq((1L, 0L, 0L), (2L, 60L, 0L), (3L, 0L, 60L), (4L, 0L, 150L)),
      delta = Seq((30L, 0L, 210L), (31L, 60L, 150L)))
  }

  test("extend ≡ rebuild: delta lands in a fresh empty region") {
    rebuildVsExtend(
      base = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 0L, 50L)),
      delta = Seq((40L, 90000L, 90000L), (41L, 90050L, 90000L),
        (42L, 90000L, 90050L)))
  }

  test("extend ≡ rebuild: empty delta is the identity") {
    rebuildVsExtend(
      base = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 0L, 50L), (9L, 9999L, 9999L)),
      delta = Seq.empty)
  }
}
