package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale-probe data generator: writes a 10x replica of
  * `/root/testdata/sf0.1` to `testdata-sf1/` so the bench can measure
  * whether wall time stays ~linear when rows grow 10x (the r9 verdict's
  * scale-probe mandate — every "survives 100 TB" argument is a
  * plan-shape argument until growth is measured).
  *
  * Replica design (r = 0..9, r=0 is the original bytes):
  *   - `region`/`nation` are dimensions — copied once, never replicated
  *     (at 100 TB dims stay broadcast-sized; inflating them would
  *     change every broadcast decision the bench is supposed to probe).
  *   - every fact key shifts by r * keyRange so replicas join ONLY
  *     within themselves: referential integrity, join fan-outs, and
  *     group cardinalities per replica are byte-identical to sf0.1,
  *     so aggregate work scales exactly 10x.
  *   - `events.event_id` shifts by multiples of the 50-event thread
  *     stride the graph fixtures derive structure from, so thread
  *     shapes (chains/trees) are preserved, just 10x as many.
  *   - `documents.text` gets a per-replica alphabet rotation
  *     (a Caesar cipher via `translate`): lengths, word boundaries,
  *     within-replica duplicate/shingle structure are EXACTLY
  *     preserved (so dedup/SA work per replica is unchanged), while
  *     cross-replica token overlap drops to ~digits-only — duplicate
  *     candidate pairs grow 10x, not 100x. `n_chars` stays valid.
  *   - `embeddings.embedding` rotates its elements by r positions:
  *     norms and within-replica distances exact-preserved; replicas
  *     decorrelate so ANN candidate sets scale linearly.
  */
object ScaleUp {
  /** Replica count — 10 for the sf1 probe (default), 100 for the
    * second scale decade (SPARK_GRAFT_SCALE_REPLICAS=100 →
    * testdata-sf10). Replicas 0..9 are byte-identical to the sf1
    * generator's, so the decades nest. */
  private val Replicas =
    sys.env.getOrElse("SPARK_GRAFT_SCALE_REPLICAS", "10").toInt

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "testdata-sf1")
    val spark = graft.core.GraftSession.configure(
        SparkSession.builder().master("local[32]").appName("graft-scaleup")
          .config("spark.ui.enabled", "false"),
        parallelism = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // replica expansion: one source scan, explode over replica ids —
    // the shift arithmetic stays in whole-stage codegen
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("__r", explode(array((0 until Replicas).map(lit): _*)))

    def shifted(c: String, range: Long) = col(c) + col("__r") * range

    // key ranges: max+1 of each key space at sf0.1 (stable generator)
    val C = 15000L; val S = 1000L; val P = 20000L; val O = 150000L
    val E = 100000L; val D = 5000L; val V = 2000L; val U = 1500L

    // per-replica Caesar rotation over both alphabet cases — applied to
    // every NAME-LIKE string (and the document text below): replicating
    // names verbatim would give every entity 10 byte-identical copies,
    // so name-blocked operators (q214's 6-char-prefix linkage blocks)
    // would see 10x-deep blocks -> 100x candidate pairs — an artifact
    // of the generator, not a property of 10x-bigger real catalogs.
    // Rotation keeps per-replica name structure byte-identical and
    // makes cross-replica names disjoint: blocks multiply, not deepen.
    // Enumerated vocab columns (p_type/p_brand/mktsegment/event_type)
    // stay verbatim — real catalogs grow rows, not type vocabularies.
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    // per-replica alphabet permutation: AFFINE cipher i → (a·i + b) mod
    // 26 with a coprime to 26. For r < 26 this degenerates to the
    // Caesar rotation (a = 1, b = r) the sf1 probe used — bytes
    // identical — while r ≥ 26 (the 100-replica sf10 decade) takes a
    // fresh multiplier per 26-block, so all replicas stay pairwise
    // text-disjoint: with plain Caesar, replicas 26 apart would be
    // byte-identical modulo keys and the dedup/SA probes would measure
    // a generator artifact (cross-replica duplicate structure), not
    // 100x-bigger data.
    val coprimes = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    def permStr(s: String, r: Int): String = {
      val a = coprimes((r / 26) % coprimes.length)
      val b = r % 26
      s.indices.map(i => s((a * i + b) % 26)).mkString
    }
    def rot(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (1 until Replicas).foldLeft(c) { (acc, r) =>
        when(col("__r") === r,
          translate(c, lower + upper, permStr(lower, r) + permStr(upper, r)))
          .otherwise(acc)
      }

    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    wr(replicate(rd("customer"))
      .select(shifted("c_custkey", C).as("c_custkey"),
        rot(col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")

    wr(replicate(rd("supplier"))
      .select(shifted("s_suppkey", S).as("s_suppkey"),
        rot(col("s_name")).as("s_name"),
        col("s_nationkey"), col("s_acctbal")),
      "supplier")

    wr(replicate(rd("part"))
      .select(shifted("p_partkey", P).as("p_partkey"),
        rot(col("p_name")).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part")

    wr(replicate(rd("orders"))
      .select(shifted("o_orderkey", O).as("o_orderkey"),
        shifted("o_custkey", C).as("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders")

    wr(replicate(rd("lineitem"))
      .select(shifted("l_orderkey", O).as("l_orderkey"),
        shifted("l_partkey", P).as("l_partkey"),
        shifted("l_suppkey", S).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    wr(replicate(rd("events"))
      .select(shifted("event_id", E).as("event_id"), col("ts"),
        shifted("user_id", U).as("user_id"), col("event_type"),
        col("value"), col("props")),
      "events")

    val docs = replicate(rd("documents"))
    val rotated = rot(col("text"))
    wr(docs.select(shifted("doc_id", D).as("doc_id"), rotated.as("text"),
        col("lang"), col("source"), length(rotated).cast("long").as("n_chars")),
      "documents")

    // rotate embedding elements by r mod dim: slice/concat keeps float
    // bytes (the mod matters once replicas exceed the embedding dim —
    // the 100-replica decade; norms/within-replica distances stay
    // exact-preserved either way)
    val emb = replicate(rd("embeddings"))
      .withColumn("__n", size(col("embedding")))
      .withColumn("__rr", col("__r") % col("__n"))
    val rolled = when(col("__rr") === 0, col("embedding")).otherwise(concat(
      slice(col("embedding"), col("__rr") + 1, col("__n") - col("__rr")),
      slice(col("embedding"), lit(1), col("__rr"))))
    wr(emb.select(shifted("vec_id", V).as("vec_id"),
        rolled.as("embedding"), col("label")),
      "embeddings")

    spark.stop()
  }
}
