package graft

import org.apache.spark.sql.functions._

/** `k_min_hashes` — the bounded KMV state aggregate. */
class KMinHashesSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k smallest DISTINCT hashes, ascending, dedup inside the buffer") {
    graft.functions.KMinHashes.register(spark)
    val df = Seq("c", "a", "b", "a", "a", "d", "b").toDF("h")
    val out = df.agg(call_function("k_min_hashes", $"h", lit(3)).as("tops"))
      .select($"tops").as[Seq[String]].head()
    assert(out == Seq("a", "b", "c")) // duplicates collapse, "d" evicted
  }

  test("nulls ignored; groups smaller than k return all distinct values") {
    graft.functions.KMinHashes.register(spark)
    val df = Seq(Some("b"), None, Some("a"), Some("b")).toDF("h")
    val out = df.agg(call_function("k_min_hashes", $"h", lit(10)).as("tops"))
      .select($"tops").as[Seq[String]].head()
    assert(out == Seq("a", "b"))
  }

  test("q67 plan is sketch-shaped: no window sort, no distinct pre-exchange of full keys") {
    val plan = graft.queries.Registry.byName("q67_kmv_distinct")
      .run(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q67 must not window-sort full key sets:\n$plan")
  }

  test("matches the unbounded sort on random-ish data (property)") {
    graft.functions.KMinHashes.register(spark)
    val hashes = (1 to 500).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString)
    val dup = hashes ++ hashes.take(100) // duplicates must not shift the order stats
    val got = dup.toDF("h").repartition(7)
      .agg(call_function("k_min_hashes", $"h", lit(16)).as("tops"))
      .select($"tops").as[Seq[String]].head()
    assert(got == hashes.distinct.sorted.take(16))
  }

  test("long arm: k smallest distinct int64 hashes, brute-force parity, partition-invariant") {
    graft.functions.KMinHashes.register(spark)
    val keys = (0 until 4000).map(i => s"key-${i % 1777}")
    def minima(parts: Int): Seq[Long] =
      keys.toDF("x").repartition(parts)
        .select(call_function("hash60", $"x", lit("")).as("h"))
        .agg(call_function("k_min_hashes_long", $"h", lit(32)).as("tops"))
        .select($"tops").as[Seq[Long]].head()
    // brute force with the same empty-prefix md5-derived 60-bit hash
    val bruteEmpty = keys.distinct.map { x =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }.distinct.sorted.take(32)
    assert(minima(1) == bruteEmpty)
    assert(minima(16) == bruteEmpty)
  }

  test("long arm nulls ignored, short groups return all values") {
    graft.functions.KMinHashes.register(spark)
    val out = Seq(Some(5L), None, Some(2L), Some(5L)).toDF("h")
      .agg(call_function("k_min_hashes_long", $"h", lit(10)).as("tops"))
      .select($"tops").as[Seq[Long]].head()
    assert(out == Seq(2L, 5L))
  }

  test("kmv_merge law: merged per-group states == direct build over the union") {
    graft.functions.KMinHashes.register(spark)
    val rows = (0 until 500).map(i => (s"g${i % 7}", s"h${i % 131}%03d"))
    val merged = rows.toDF("g", "h").groupBy($"g")
      .agg(call_function("k_min_hashes", $"h", lit(16)).as("tops"))
      .agg(call_function("kmv_merge", $"tops", lit(16)).as("tops"))
      .select($"tops").as[Seq[String]].head()
    val direct = rows.map(_._2).distinct.sorted.take(16)
    assert(merged == direct)
  }

  test("kmv_merge dedups across states and keeps partial states under k") {
    graft.functions.KMinHashes.register(spark)
    // two overlapping 2-element states, 3 distinct values, k=10
    val merged = Seq(Seq("a", "b"), Seq("b", "c")).toDF("tops")
      .agg(call_function("kmv_merge", $"tops", lit(10)).as("tops"))
      .select($"tops").as[Seq[String]].head()
    assert(merged == Seq("a", "b", "c"))
  }
}
