package graft

import graft.core.ArtifactStore

class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  test("versioned write/read with latest resolution (reference §1.4 convention)") {
    val root = java.nio.file.Files.createTempDirectory("graft-store").toString
    val store = new ArtifactStore(spark, root)
    val v1 = store.versionString(
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0), "abcdef1234")
    val v2 = store.versionString(
      java.time.LocalDateTime.of(2026, 2, 1, 0, 0, 0), "1234567abcd")
    assert(v1 == "20260101000000_abcdef1")
    store.write(Seq(1).toDF("x"), "landings", v1)
    store.write(Seq(2).toDF("x"), "landings", v2)
    assert(store.versions("landings") == Seq(v1, v2))
    assert(store.read("landings").as[Int].head() == 2)          // latest
    assert(store.read("landings", Some(v1)).as[Int].head() == 1) // exact
    intercept[RuntimeException](store.read("nope"))
  }

  test("retention drops oldest versions, keeps the latest k, latest survives") {
    val root = java.nio.file.Files.createTempDirectory("graft-retain").toString
    val store = new ArtifactStore(spark, root)
    val vs = (1 to 4).map { m =>
      val v = store.versionString(
        java.time.LocalDateTime.of(2026, m, 1, 0, 0, 0), s"sha$m" + "0000")
      store.write(Seq(m).toDF("x"), "t", v)
      v
    }
    val deleted = store.retain("t", keep = 2)
    assert(deleted == vs.take(2), "oldest two deleted, oldest first")
    assert(store.versions("t") == vs.drop(2))
    assert(store.read("t").as[Int].head() == 4, "latest unchanged")
    assert(store.retain("t", keep = 5).isEmpty, "keep > count is a no-op")
    intercept[IllegalArgumentException](store.retain("t", keep = 0))
  }
}
