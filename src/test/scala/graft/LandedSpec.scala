package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.core.Landed

/** Session-scoped landed-artifact registry: producer/consumer
  * composition, dir-keyed isolation, land-always-rebuilds vs
  * probe-reuses, and the clear() hook. */
class LandedSpec extends SparkSpec {
  import spark.implicits._

  test("probeOrBuild reuses a landing; land always rebuilds") {
    Landed.clear(spark)
    val builds = new AtomicInteger(0)
    def build() = {
      builds.incrementAndGet()
      Seq(1, 2, 3).toDF("v")
    }
    val a = Landed.land(spark, "spec:x")(build())
    assert(builds.get() == 1)
    val b = Landed.probeOrBuild(spark, "spec:x")(build())
    assert(builds.get() == 1, "probe must not rebuild a landed frame")
    assert(b.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    Landed.land(spark, "spec:x")(build())
    assert(builds.get() == 2, "land is the producer call - always builds")
    assert(a.count() == 3)
  }

  test("keys isolate: different dirs never serve each other's frames") {
    Landed.clear(spark)
    Landed.land(spark, "spec:t:/dirA")(Seq(1).toDF("v"))
    val other = Landed.probeOrBuild(spark, "spec:t:/dirB")(Seq(7, 8).toDF("v"))
    assert(other.count() == 2)
    assert(Landed.probeOrBuild(spark, "spec:t:/dirA")(Seq(9).toDF("v"))
      .collect()(0).getInt(0) == 1)
  }

  test("a probed frame is pinned: source mutation does not leak through") {
    Landed.clear(spark)
    var source = Seq(1, 2).toDF("v")
    Landed.land(spark, "spec:pin")(source.select(sum($"v").as("s")))
    // first action materializes the lazy checkpoint
    assert(Landed.probeOrBuild(spark, "spec:pin")(sys.error("no rebuild"))
      .collect()(0).getLong(0) == 3L)
    source = Seq(100).toDF("v") // producer-side drift is invisible
    assert(Landed.probeOrBuild(spark, "spec:pin")(sys.error("no rebuild"))
      .collect()(0).getLong(0) == 3L)
  }

  test("clear drops this session's landings only") {
    Landed.clear(spark)
    Landed.land(spark, "spec:c")(Seq(1).toDF("v"))
    Landed.clear(spark)
    val builds = new AtomicInteger(0)
    Landed.probeOrBuild(spark, "spec:c") {
      builds.incrementAndGet(); Seq(2).toDF("v")
    }
    assert(builds.get() == 1, "cleared key must rebuild")
  }
}
