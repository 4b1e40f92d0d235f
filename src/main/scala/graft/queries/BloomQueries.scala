package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Exact._
import graft.core.Tables._
import graft.dedup.Dedup
import graft.functions.BloomBits

/** Bloom-filter membership dedup — the FIXED-memory incremental arm
  * of the dedup suite (q88/q142/q151 probe exact landed indexes whose
  * size tracks the corpus; the Bloom filter answers the same
  * "possibly landed already?" question from `m` bits regardless of
  * corpus size, at a measured false-positive rate — the
  * trillion-token shape, where the filter broadcasts to every
  * executor and the landed corpus is never rescanned).
  */
object BloomQueries {

  private val M = 262144 // bits (4096 packed longs, 32 KiB broadcast)
  private val K = 4      // hash functions

  private def posSql(rel: String): String =
    s"""SELECT $rel.*,
       |    ((CAST(('0x' || substr(md5('bf1-sh' || gram), 1, 7)) AS BIGINT) % $M)
       |     + s.i * (CAST(('0x' || substr(md5('bf2-sh' || gram), 1, 7)) AS BIGINT) % $M))
       |    % $M AS pos
       |  FROM $rel, UNNEST(generate_series(0, ${K - 1})) AS s(i)""".stripMargin

  /** q154: landed 8-gram shingles (docs with `doc_id % 3 != 0`) build
    * a [[graft.functions.BloomBitsAgg]] bitset; the batch's distinct
    * (source, gram) keys probe it with built-in `forall`/bit-ops over
    * the broadcast 1-row filter. The exact landed join exists ONLY to
    * audit the filter: per source, bloom positives split into true
    * duplicates and measured false positives (no false negatives by
    * construction — BloomBitsSpec asserts it). The oracle re-derives
    * the identical bit positions, so the filter's exact false-positive
    * behavior sits under the hash gate. */
  val q154 = GQuery(
    "q154_bloom_shingle_filter",
    (s, d) => {
      BloomBits.register(s)
      // one tokenize+shingle pass shared by the three consumers (landed
      // bloom build, landed audit join, batch probe) — the CPU-dense
      // stage would otherwise run once per subtree, and an eager
      // checkpoint is required: a lazy one races when AQE submits the
      // independent consumer stages concurrently, and each then
      // materializes the pass itself (measured at sf0.1: 3 heavy
      // stages lazy vs 1 eager)
      val g = Dedup.shingleIndex(documents(s, d), "doc_id", "text", k = 8)
        .localCheckpoint(eager = true)
      val landed = g.filter(col("doc") % 3 =!= 0).select(col("shingle")).distinct()
      val bits = landed
        .select(explode(BloomBits.positions(col("shingle"), K, M, "sh")).as("pos"))
        .agg(expr(s"bloom_bits(pos, $M)").as("bits"))
      val srcOf = documents(s, d).select(col("doc_id").as("doc"), col("source"))
      val batch = g.filter(col("doc") % 3 === 0)
        .join(broadcast(srcOf), Seq("doc"))
        .select(col("source"), col("shingle")).distinct()
      batch
        .withColumn("pos_arr", BloomBits.positions(col("shingle"), K, M, "sh"))
        .crossJoin(broadcast(bits))
        .withColumn("maybe", BloomBits.mightContain("bits", "pos_arr"))
        .join(landed.withColumn("__in", lit(1)), Seq("shingle"), "left")
        .groupBy(col("source"))
        .agg(
          lcount(lit(1)).as("n_grams"),
          sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
          sum(when(col("__in") === 1, 1L).otherwise(0L)).as("n_true_dup"),
          sum(when(col("maybe") && col("__in").isNull, 1L).otherwise(0L))
            .as("n_false_pos"))
    },
    Some(s"""WITH t AS (
      |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source, array_to_string(ws[u.i:u.i+7], ' ') AS gram
      |  FROM t, UNNEST(generate_series(1, len(ws) - 7)) AS u(i)),
      |landed AS (SELECT DISTINCT gram FROM g WHERE doc_id % 3 != 0),
      |lpos AS (SELECT DISTINCT pos FROM (${posSql("landed")})),
      |batch AS (SELECT DISTINCT source, gram FROM g WHERE doc_id % 3 = 0),
      |bpos AS (${posSql("batch")}),
      |mb AS (
      |  SELECT b.source, b.gram,
      |    MIN(CASE WHEN l.pos IS NULL THEN 0 ELSE 1 END) AS allhit
      |  FROM bpos b LEFT JOIN lpos l ON b.pos = l.pos
      |  GROUP BY b.source, b.gram),
      |fin AS (
      |  SELECT m.source, m.allhit,
      |    CASE WHEN ld.gram IS NULL THEN 0 ELSE 1 END AS tru
      |  FROM mb m LEFT JOIN landed ld ON m.gram = ld.gram)
      |SELECT source, COUNT(*) AS n_grams,
      |  CAST(SUM(allhit) AS BIGINT) AS n_maybe,
      |  CAST(SUM(tru) AS BIGINT) AS n_true_dup,
      |  CAST(SUM(CASE WHEN allhit = 1 AND tru = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_false_pos
      |FROM fin GROUP BY source""".stripMargin))

  /** q156: the sharded streaming Bloom filter
    * ([[graft.streaming.StreamBloom.dedup]]) run in its batch mode over
    * a deterministic key stream (`'k' || doc_id % 211`, ts = doc_id) —
    * the SAME code path a stream executes per micro-batch, so the
    * state-machine semantics (per-shard filter, (ts, key) processing
    * order, probe-then-insert) sit under the hash gate. The oracle
    * replays the filter declaratively: an occurrence is "maybe seen"
    * iff each of its bit positions was set by SOME strictly-earlier
    * occurrence in its shard. True duplicates (an earlier occurrence
    * of the same key anywhere) split the positives into real hits and
    * audited false positives, as in q154. */
  val q156 = GQuery(
    "q156_bloom_stream_parity",
    (s, d) => {
      val Sh = 4; val M2 = 2048; val K2 = 3; val Tag = "st"
      val keys = documents(s, d).select(
        col("doc_id").as("ts"),
        concat(lit("k"), col("doc_id") % 211).as("key"),
        col("source"))
      val verdicts = graft.streaming.StreamBloom.dedup(
        keys, "key", "ts", Sh, M2, K2, Tag)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("ts"))
      val withTrue = verdicts
        .withColumn("is_dup", row_number().over(w) > 1)
        .join(keys.select(col("ts"), col("source")), Seq("ts"))
      withTrue.groupBy(col("source"))
        .agg(
          lcount(lit(1)).as("n_keys"),
          sum(when(col("maybe_seen"), 1L).otherwise(0L)).as("n_maybe"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_true_dup"),
          sum(when(col("maybe_seen") && !col("is_dup"), 1L).otherwise(0L))
            .as("n_false_pos"))
    },
    Some(s"""WITH keys AS (
      |  SELECT doc_id AS ts, 'k' || (doc_id % 211) AS key, source FROM documents),
      |sh AS (
      |  SELECT ts, key, source,
      |    CAST(('0x' || substr(md5('bs-st' || key), 1, 7)) AS BIGINT) % 4 AS shard
      |  FROM keys),
      |kp AS (
      |  SELECT key,
      |    ((CAST(('0x' || substr(md5('bf1-st' || key), 1, 7)) AS BIGINT) % 2048)
      |     + s.i * (CAST(('0x' || substr(md5('bf2-st' || key), 1, 7)) AS BIGINT) % 2048))
      |    % 2048 AS pos
      |  FROM (SELECT DISTINCT key FROM keys) k, UNNEST(generate_series(0, 2)) AS s(i)),
      |cov AS (
      |  SELECT o.ts, o.source, o.key,
      |    MIN(CASE WHEN EXISTS (
      |      SELECT 1 FROM sh r JOIN kp rp ON rp.key = r.key
      |      WHERE r.shard = o.shard AND rp.pos = p.pos
      |        AND (r.ts < o.ts OR (r.ts = o.ts AND r.key < o.key))
      |    ) THEN 1 ELSE 0 END) AS maybe
      |  FROM sh o JOIN kp p ON p.key = o.key
      |  GROUP BY o.ts, o.source, o.key),
      |fin AS (
      |  SELECT c.source, c.maybe,
      |    CASE WHEN EXISTS (
      |      SELECT 1 FROM sh r WHERE r.key = c.key AND r.ts < c.ts
      |    ) THEN 1 ELSE 0 END AS tru
      |  FROM cov c)
      |SELECT source, COUNT(*) AS n_keys,
      |  CAST(SUM(maybe) AS BIGINT) AS n_maybe,
      |  CAST(SUM(tru) AS BIGINT) AS n_true_dup,
      |  CAST(SUM(CASE WHEN maybe = 1 AND tru = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_false_pos
      |FROM fin GROUP BY source""".stripMargin))

  /** HLL precision for q208: 2^9 = 512 registers, ~4.6 % expected
    * relative error — small enough that the sf0.01 fixture exercises
    * BOTH the raw harmonic regime and the linear-counting small-range
    * correction across groups. */
  private val HllP = 9

  /** q208: HyperLogLog distinct-order census per (returnflag,
    * linestatus) ([[graft.functions.HllRegistersAgg]]) — the
    * constant-memory COUNT DISTINCT the 100 TB path uses where exact
    * distinct would shuffle the key set. The md5-derived 60-bit hash,
    * every register, the dyadic-exact indicator sum and the
    * small-range branch all replay in the oracle (GROUP BY bucket +
    * MAX), so the sketch's exact estimates — and their measured error
    * vs the exact count — sit under the hash gate. */
  val q208 = {
    import graft.functions.HllSketch
    val m = 1 << HllP
    val wBits = 60 - HllP
    GQuery(
      "q208_hll_cardinality",
      (s, d) => {
        HllSketch.register(s)
        // the two arms aggregate SEPARATELY and join on the group-count
        // frame: a distinct aggregate beside the typed-imperative sketch
        // would plan one Expand + combined ObjectHashAggregate over
        // 2x the rows (measured 2.5 s -> the split is the cheap shape;
        // at 100 TB you would only ever run the sketch arm anyway — the
        // exact arm exists to audit it)
        val src = lineitem(s, d).select(
          col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          col("l_orderkey"))
        val sketch = src
          .select(col("rf"), col("ls"),
            HllSketch.hash60(col("l_orderkey").cast("string"), "odk").as("h"))
          .groupBy(col("rf"), col("ls"))
          .agg(expr(s"hll_registers(h, $HllP)").as("__regs"))
        val exact = src.groupBy(col("rf"), col("ls"))
          .agg(countDistinct(col("l_orderkey")).as("n_exact"))
        sketch.join(exact, Seq("rf", "ls"))
          .withColumn("zeros", HllSketch.zerosCol(col("__regs")))
          .withColumn("sumexp_s52", HllSketch.sumExpS52Col(col("__regs")))
          .withColumn("estimate_e6",
            floor(HllSketch.estimateCol(col("zeros"), col("sumexp_s52"),
              HllP) * 1e6 + 0.5).cast("long"))
          .select(col("rf"), col("ls"), col("n_exact"), col("zeros"),
            col("sumexp_s52"), col("estimate_e6"))
      },
      Some(s"""WITH src AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls, l_orderkey,
        |    CAST(('0x' || substr(md5('hll-odk' || CAST(l_orderkey AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |br AS (
        |  SELECT rf, ls, h // ${1L << wBits} AS bucket,
        |    CASE WHEN h % ${1L << wBits} = 0 THEN ${wBits + 1}
        |         ELSE $wBits - length(bin(h % ${1L << wBits})) + 1 END AS rho
        |  FROM src),
        |regs AS (
        |  SELECT rf, ls, bucket, CAST(MAX(rho) AS BIGINT) AS reg
        |  FROM br GROUP BY rf, ls, bucket),
        |folds AS (
        |  SELECT rf, ls,
        |    CAST($m - COUNT(*) AS BIGINT) AS zeros,
        |    CAST(SUM(CAST(1 AS BIGINT) << (52 - reg)) +
        |         ($m - COUNT(*)) * ${1L << 52} AS BIGINT) AS sumexp_s52
        |  FROM regs GROUP BY rf, ls),
        |ex AS (
        |  SELECT rf, ls, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact
        |  FROM src GROUP BY rf, ls),
        |est AS (
        |  SELECT f.*, ex.n_exact,
        |    CAST(${HllSketch.alpha(1 << HllP)} AS DOUBLE) * $m.0 * $m.0 *
        |      ${math.pow(2.0, 52)} / f.sumexp_s52 AS raw
        |  FROM folds f JOIN ex ON f.rf = ex.rf AND f.ls = ex.ls)
        |SELECT rf, ls, n_exact, zeros, sumexp_s52,
        |  CAST(FLOOR((CASE WHEN zeros > 0 AND raw <= ${2.5 * (1 << HllP)}
        |    THEN $m.0 * ln($m.0 / zeros) ELSE raw END) * 1e6 + 0.5)
        |    AS BIGINT) AS estimate_e6
        |FROM est""".stripMargin))
  }

  /** q222: HLL register ROLLUP ([[graft.functions.HllMergeAgg]]) —
    * the sketch-algebra pattern that makes sketches the 100 TB
    * distinct-count shape: ONE register build at the fine grain
    * (rf × ls), then every coarser grain (rf, grand total) by
    * elementwise-max MERGE of the fine registers — no rescan of the
    * data. Max-merge of registers equals the registers of the union,
    * so every merged estimate is bit-identical to a direct build at
    * that grain; the oracle proves exactly that by REBUILDING each
    * grain's registers from the raw elements. */
  val q222 = {
    import graft.functions.HllSketch
    val m = 1 << HllP
    val wBits = 60 - HllP
    GQuery(
      "q222_hll_rollup",
      (s, d) => {
        HllSketch.register(s)
        val fine = lineitem(s, d)
          .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
            HllSketch.hash60(col("l_orderkey").cast("string"), "odk").as("h"))
          .groupBy(col("rf"), col("ls"))
          .agg(expr(s"hll_registers(h, $HllP)").as("__regs"))
          // three consumers (own grain + two merges); the frame is a
          // handful of register rows
          .localCheckpoint(eager = false)
        val byRf = fine.groupBy(col("rf"))
          .agg(expr(s"hll_merge(__regs, $HllP)").as("__regs"))
          .select(lit("rf").as("grain"), col("rf"),
            lit(null).cast("string").as("ls"), col("__regs"))
        val all = fine.agg(expr(s"hll_merge(__regs, $HllP)").as("__regs"))
          .select(lit("all").as("grain"), lit(null).cast("string").as("rf"),
            lit(null).cast("string").as("ls"), col("__regs"))
        fine.select(lit("rf_ls").as("grain"), col("rf"), col("ls"), col("__regs"))
          .unionByName(byRf).unionByName(all)
          .withColumn("zeros", HllSketch.zerosCol(col("__regs")))
          .withColumn("sumexp_s52", HllSketch.sumExpS52Col(col("__regs")))
          .withColumn("estimate_e6",
            floor(HllSketch.estimateCol(col("zeros"), col("sumexp_s52"),
              HllP) * 1e6 + 0.5).cast("long"))
          .select(col("grain"), col("rf"), col("ls"), col("zeros"),
            col("sumexp_s52"), col("estimate_e6"))
      },
      Some(s"""WITH src AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(('0x' || substr(md5('hll-odk' || CAST(l_orderkey AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |br AS (
        |  SELECT rf, ls, h // ${1L << wBits} AS bucket,
        |    CASE WHEN h % ${1L << wBits} = 0 THEN ${wBits + 1}
        |         ELSE $wBits - length(bin(h % ${1L << wBits})) + 1 END AS rho
        |  FROM src),
        |g AS (
        |  SELECT 'rf_ls' AS grain, rf, ls, bucket, MAX(rho) AS reg
        |  FROM br GROUP BY rf, ls, bucket
        |  UNION ALL
        |  SELECT 'rf', rf, NULL, bucket, MAX(rho)
        |  FROM br GROUP BY rf, bucket
        |  UNION ALL
        |  SELECT 'all', NULL, NULL, bucket, MAX(rho)
        |  FROM br GROUP BY bucket),
        |folds AS (
        |  SELECT grain, rf, ls,
        |    CAST($m - COUNT(*) AS BIGINT) AS zeros,
        |    CAST(SUM(CAST(1 AS BIGINT) << (52 - reg)) +
        |         ($m - COUNT(*)) * ${1L << 52} AS BIGINT) AS sumexp_s52
        |  FROM g GROUP BY grain, rf, ls),
        |est AS (
        |  SELECT folds.*,
        |    CAST(${HllSketch.alpha(1 << HllP)} AS DOUBLE) * $m.0 * $m.0 *
        |      ${math.pow(2.0, 52)} / sumexp_s52 AS raw
        |  FROM folds)
        |SELECT grain, rf, ls, zeros, sumexp_s52,
        |  CAST(FLOOR((CASE WHEN zeros > 0 AND raw <= ${2.5 * (1 << HllP)}
        |    THEN $m.0 * ln($m.0 / zeros) ELSE raw END) * 1e6 + 0.5)
        |    AS BIGINT) AS estimate_e6
        |FROM est""".stripMargin))
  }

  /** q227: Count-Min register ROLLUP ([[graft.functions.CmMergeAgg]]) —
    * the second sketch-algebra rollup beside q222's HLL: CM is a LINEAR
    * transform of the frequency vector, so element-wise ADDITION of
    * per-event-type sketches yields bit-for-bit the sketch of the whole
    * log — one counter build at the fine grain, the coarse grain
    * without rescanning. Probes are estimated at both grains from the
    * rolled-up counters; the oracle proves the merge law by counting
    * each probe's cell collisions directly from the raw rows at each
    * grain (the q163 shape) and joining the exact counts alongside. */
  val q227 = {
    val (d, wdt) = (3, 64)
    val probes = Seq("1", "7", "13")
    GQuery(
      "q227_cm_rollup",
      (s, dir) => {
        graft.functions.CountMin.register(s)
        // "__all__" is an internal sentinel: a NULL grouping key would
        // never equi-join against the exact-count arm
        val ev = events(s, dir)
          .select(col("event_type"), col("user_id").cast("string").as("u"))
        val fine = ev.groupBy(col("event_type"))
          .agg(call_function("count_min", col("u"), lit(d), lit(wdt)).as("sk"))
          // two consumers (own grain + the merge)
          .localCheckpoint(eager = false)
        val all = fine.agg(expr(s"cm_merge(sk, $d, $wdt)").as("sk"))
          .select(lit("all").as("grain"), lit("__all__").as("event_type"),
            col("sk"))
        val grains = fine
          .select(lit("type").as("grain"), col("event_type"), col("sk"))
          .unionByName(all)
        def cellOf(dd: Int, item: org.apache.spark.sql.Column) =
          conv(substring(md5(concat(lit(s"$dd:"), item)), 1, 7), 16, 10)
            .cast("long") % wdt
        val probeDf = grains.crossJoin(broadcast(
          s.createDataset(probes)(org.apache.spark.sql.Encoders.STRING)
            .toDF("probe")))
        val est = (0 until d).map(dd =>
          element_at(col("sk"), (lit(dd * wdt) + cellOf(dd, col("probe")) + 1)
            .cast("int"))).reduce(least(_, _))
        val exactTyped = ev.filter(col("u").isin(probes: _*))
          .groupBy(col("event_type"), col("u").as("probe"))
          .agg(count(lit(1)).as("exact_n"))
          .select(lit("type").as("grain"), col("event_type"), col("probe"),
            col("exact_n"))
        val exactAll = ev.filter(col("u").isin(probes: _*))
          .groupBy(col("u").as("probe"))
          .agg(count(lit(1)).as("exact_n"))
          .select(lit("all").as("grain"), lit("__all__").as("event_type"),
            col("probe"), col("exact_n"))
        probeDf
          .withColumn("cms_n", est)
          .join(exactTyped.unionByName(exactAll),
            Seq("grain", "event_type", "probe"), "left")
          .select(col("grain"),
            when(col("event_type") === "__all__", lit(null).cast("string"))
              .otherwise(col("event_type")).as("event_type"),
            col("probe"), col("cms_n"),
            coalesce(col("exact_n"), lit(0L)).as("exact_n"))
      },
      Some(s"""WITH ev AS (
        |  SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events),
        |gr AS (
        |  SELECT 'type' AS grain, event_type, u FROM ev
        |  UNION ALL
        |  SELECT 'all', NULL, u FROM ev),
        |dep AS (SELECT * FROM (VALUES (0),(1),(2)) AS t(d)),
        |pr AS (SELECT * FROM (VALUES ('1'),('7'),('13')) AS t(probe)),
        |cells AS (
        |  SELECT g.grain, g.event_type, dep.d,
        |    CAST(('0x' || substr(md5(CAST(dep.d AS VARCHAR) || ':' || g.u), 1, 7))
        |      AS BIGINT) % $wdt AS c,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM gr g CROSS JOIN dep GROUP BY 1, 2, 3, 4),
        |pcell AS (
        |  SELECT dep.d, pr.probe,
        |    CAST(('0x' || substr(md5(CAST(dep.d AS VARCHAR) || ':' || pr.probe), 1, 7))
        |      AS BIGINT) % $wdt AS c
        |  FROM pr CROSS JOIN dep),
        |gframe AS (
        |  SELECT DISTINCT grain, event_type FROM gr),
        |est AS (
        |  SELECT gf.grain, gf.event_type, pc.probe,
        |    MIN(COALESCE(cl.n, 0)) AS cms_n
        |  FROM gframe gf CROSS JOIN pcell pc
        |  LEFT JOIN cells cl ON cl.grain = gf.grain
        |    AND (cl.event_type = gf.event_type
        |         OR (cl.event_type IS NULL AND gf.event_type IS NULL))
        |    AND cl.d = pc.d AND cl.c = pc.c
        |  GROUP BY 1, 2, 3),
        |ex AS (
        |  SELECT grain, event_type, u AS probe, CAST(COUNT(*) AS BIGINT) AS exact_n
        |  FROM gr WHERE u IN ('1', '7', '13') GROUP BY 1, 2, 3)
        |SELECT e.grain, e.event_type, e.probe, e.cms_n,
        |  COALESCE(ex.exact_n, 0) AS exact_n
        |FROM est e
        |LEFT JOIN ex ON ex.grain = e.grain AND ex.probe = e.probe
        |  AND (ex.event_type = e.event_type
        |       OR (ex.event_type IS NULL AND e.event_type IS NULL))""".stripMargin))
  }

  /** q228: KMV state ROLLUP ([[graft.functions.KmvMergeAgg]]) — the
    * third sketch-algebra rollup: the k smallest distinct hashes of a
    * union are all contained in the union of each part's k smallest,
    * so re-capping merged states at k reproduces the direct union
    * build bit-for-bit. One bounded-buffer build per event type, the
    * whole-log cardinality estimate from merged states only; the
    * oracle rebuilds each grain's k-minima from the raw rows. */
  val q228 = {
    val k = 64
    GQuery(
      "q228_kmv_rollup",
      (s, dir) => {
        graft.functions.KMinHashes.register(s)
        val ev = events(s, dir)
          .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
        val fine = ev.groupBy(col("event_type"))
          .agg(call_function("k_min_hashes", col("h"), lit(k)).as("tops"))
          .localCheckpoint(eager = false)
        val all = fine.agg(expr(s"kmv_merge(tops, $k)").as("tops"))
          .select(lit("all").as("grain"),
            lit(null).cast("string").as("event_type"), col("tops"))
        fine.select(lit("type").as("grain"), col("event_type"), col("tops"))
          .unionByName(all)
          .select(col("grain"), col("event_type"),
            size(col("tops")).cast("long").as("n_in_state"),
            when(size(col("tops")) >= k, element_at(col("tops"), k))
              .otherwise(lit(null).cast("string")).as("kth"))
      },
      Some(s"""WITH ev AS (
        |  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
        |gr AS (
        |  SELECT 'type' AS grain, event_type, h FROM ev
        |  UNION ALL
        |  SELECT 'all', NULL, h FROM ev),
        |dh AS (SELECT DISTINCT grain, event_type, h FROM gr),
        |rk AS (
        |  SELECT grain, event_type, h,
        |    row_number() OVER (PARTITION BY grain, event_type ORDER BY h) AS rn
        |  FROM dh)
        |SELECT grain, event_type,
        |  CAST(LEAST(COUNT(*), $k) AS BIGINT) AS n_in_state,
        |  MAX(CASE WHEN rn = $k THEN h END) AS kth
        |FROM rk GROUP BY grain, event_type""".stripMargin))
  }

  /** q239: KMV set-operation estimates — the payoff of sketch algebra:
    * pairwise Jaccard and intersection cardinality between event types
    * estimated from the KMV STATES ALONE (Beyer et al. SIGMOD'07): the
    * k smallest of the union of two sketches are exactly the union's
    * k-minima, and a minimum belongs to the intersection iff it sits
    * in BOTH sketches — so J ≈ |m ∩ ta ∩ tb| / |m| and |A∩B| ≈ J·(k−1)/h₍ₖ₎,
    * all deterministic given the md5 hashes. Exact values ride along
    * for the accuracy story; estimates and exacts both sit under the
    * hash. All pair math is bounded array expressions over a 10-row
    * self-join of 5 states. */
  val q239 = {
    val k = 64
    GQuery(
      "q239_kmv_set_ops",
      (s, dir) => {
        graft.functions.KMinHashes.register(s)
        val ev = events(s, dir)
          .select(col("event_type"), md5(col("user_id").cast("string")).as("h"))
        val st = ev.groupBy(col("event_type"))
          .agg(call_function("k_min_hashes", col("h"), lit(k)).as("tops"),
            countDistinct(col("h")).as("nd"))
          .localCheckpoint(eager = false)
        val pairs = st.select(col("event_type").as("ta"), col("tops").as("xa"),
            col("nd").as("na"))
          .join(st.select(col("event_type").as("tb"), col("tops").as("xb"),
            col("nd").as("nb")), col("ta") < col("tb"))
        val m = slice(array_sort(array_union(col("xa"), col("xb"))), 1, k)
        val inBoth = array_intersect(array_intersect(col("m"), col("xa")), col("xb"))
        val frac = conv(substring(element_at(col("m"), k), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0)
        val unionEst = when(size(col("m")) >= k, lit(k - 1.0) / frac)
          .otherwise(size(col("m")).cast("double"))
        val jEst = col("n_both").cast("double") / size(col("m")).cast("double")
        // exact common hashes per pair, from the raw rows
        val dh = ev.distinct()
        val commonExact = dh.select(col("event_type").as("ta"), col("h"))
          .join(dh.select(col("event_type").as("tb"), col("h")), Seq("h"))
          .filter(col("ta") < col("tb"))
          .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_common"))
        pairs
          .withColumn("m", m)
          .withColumn("n_both", size(inBoth).cast("long"))
          .withColumn("j_est_e6",
            floor(jEst * 1e6 + 0.5).cast("long"))
          .withColumn("inter_est_e6",
            floor(jEst * unionEst * 1e6 + 0.5).cast("long"))
          .join(commonExact, Seq("ta", "tb"), "left")
          .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
          .select(col("ta"), col("tb"), size(col("m")).cast("long").as("k_used"),
            col("n_both"), col("j_est_e6"), col("inter_est_e6"),
            col("n_common"),
            floor(col("n_common").cast("double") /
              (col("na") + col("nb") - col("n_common")).cast("double") * 1e6
              + 0.5).cast("long").as("j_exact_e6"))
      },
      Some(s"""WITH ev AS (
        |  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM events),
        |st AS (
        |  SELECT event_type,
        |    list_slice(list_sort(list(h)), 1, $k) AS tops,
        |    CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM ev GROUP BY event_type),
        |pr AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    a.tops AS xa, b.tops AS xb, a.nd AS na, b.nd AS nb,
        |    list_slice(list_sort(list_distinct(list_concat(a.tops, b.tops))),
        |      1, $k) AS m
        |  FROM st a JOIN st b ON a.event_type < b.event_type),
        |est AS (
        |  SELECT ta, tb, na, nb, CAST(len(m) AS BIGINT) AS k_used,
        |    CAST(len(list_filter(m, x -> list_contains(xa, x)
        |      AND list_contains(xb, x))) AS BIGINT) AS n_both,
        |    CASE WHEN len(m) >= $k THEN ${k - 1}.0 / (
        |      (strpos('0123456789abcdef', substr(m[$k], 1, 1)) - 1) * 268435456.0 +
        |      (strpos('0123456789abcdef', substr(m[$k], 2, 1)) - 1) * 16777216.0 +
        |      (strpos('0123456789abcdef', substr(m[$k], 3, 1)) - 1) * 1048576.0 +
        |      (strpos('0123456789abcdef', substr(m[$k], 4, 1)) - 1) * 65536.0 +
        |      (strpos('0123456789abcdef', substr(m[$k], 5, 1)) - 1) * 4096.0 +
        |      (strpos('0123456789abcdef', substr(m[$k], 6, 1)) - 1) * 256.0 +
        |      (strpos('0123456789abcdef', substr(m[$k], 7, 1)) - 1) * 16.0 +
        |      (strpos('0123456789abcdef', substr(m[$k], 8, 1)) - 1) * 1.0
        |    ) * 4294967296.0 ELSE CAST(len(m) AS DOUBLE) END AS union_est
        |  FROM pr),
        |cx AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM ev a JOIN ev b ON a.h = b.h AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT e.ta, e.tb, e.k_used, e.n_both,
        |  CAST(floor(CAST(e.n_both AS DOUBLE) / CAST(e.k_used AS DOUBLE) * 1e6
        |    + 0.5) AS BIGINT) AS j_est_e6,
        |  CAST(floor(CAST(e.n_both AS DOUBLE) / CAST(e.k_used AS DOUBLE)
        |    * e.union_est * 1e6 + 0.5) AS BIGINT) AS inter_est_e6,
        |  COALESCE(c.n_common, 0) AS n_common,
        |  CAST(floor(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
        |    / CAST(e.na + e.nb - COALESCE(c.n_common, 0) AS DOUBLE) * 1e6 + 0.5)
        |    AS BIGINT) AS j_exact_e6
        |FROM est e LEFT JOIN cx c ON e.ta = c.ta AND e.tb = c.tb""".stripMargin))
  }

  /** q245: one-pass table profiler (ANALYZE TABLE, sketch-shaped) —
    * per-column null counts and HLL distinct estimates for six
    * lineitem columns in ONE scan with ONE aggregation: the exact
    * multi-column n_distinct plans an Expand over 6× the rows (the
    * q208 trap at table width), while six constant-memory register
    * sets ride one map-side-combined pass. Doubles enter the hash
    * e6-floored (string formatting differs across engines; scaled
    * integers do not). The oracle rebuilds every column's registers
    * from raw rows — all six estimates bit-exact. */
  val q245 = {
    import graft.functions.HllSketch
    val m = 1 << HllP
    val wBits = 60 - HllP
    // (name, Spark key expr, SQL key expr) — canonical key bytes per column
    def intish(n: String) = (n, col(n).cast("string"), s"CAST($n AS VARCHAR)")
    val cols: Seq[(String, org.apache.spark.sql.Column, String)] = Seq(
      intish("l_orderkey"), intish("l_suppkey"), intish("l_linenumber"),
      ("l_returnflag", col("l_returnflag"), "l_returnflag"),
      ("l_linestatus", col("l_linestatus"), "l_linestatus"),
      ("l_quantity",
        floor(col("l_quantity") * 1e6 + 0.5).cast("long").cast("string"),
        "CAST(CAST(floor(l_quantity * 1e6 + 0.5) AS BIGINT) AS VARCHAR)"))
    GQuery(
      "q245_table_profile",
      (s, d) =>
        graft.core.Profile.sketchProfile(lineitem(s, d),
          cols.map { case (n, k, _) => (n, k) }, HllP)
          .select(col("n_rows"), col("col_name"), col("n_nulls"),
            col("zeros"), col("sumexp_s52"), col("est_distinct_e6")),
      Some {
        val blocks = cols.map { case (n, _, keySql) =>
          s"""src_$n AS (
             |  SELECT CAST(('0x' || substr(md5('hll-$n' || $keySql), 1, 15))
             |    AS BIGINT) AS h
             |  FROM lineitem WHERE $n IS NOT NULL),
             |regs_$n AS (
             |  SELECT h // ${1L << wBits} AS bucket,
             |    CAST(MAX(CASE WHEN h % ${1L << wBits} = 0 THEN ${wBits + 1}
             |      ELSE $wBits - length(bin(h % ${1L << wBits})) + 1 END)
             |      AS BIGINT) AS reg
             |  FROM src_$n GROUP BY 1),
             |f_$n AS (
             |  SELECT CAST($m - COUNT(*) AS BIGINT) AS zeros,
             |    CAST(SUM(CAST(1 AS BIGINT) << (52 - reg)) +
             |         ($m - COUNT(*)) * ${1L << 52} AS BIGINT) AS sumexp_s52
             |  FROM regs_$n)""".stripMargin
        }.mkString(",\n")
        val arms = cols.map { case (n, _, _) =>
          s"""SELECT '$n' AS col_name, nn.n_rows,
             |  nn.nn_$n AS n_nulls, f.zeros, f.sumexp_s52,
             |  CAST(FLOOR((CASE WHEN f.zeros > 0 AND
             |      CAST(${HllSketch.alpha(1 << HllP)} AS DOUBLE) * $m.0 * $m.0
             |        * ${math.pow(2.0, 52)} / f.sumexp_s52 <= ${2.5 * (1 << HllP)}
             |    THEN $m.0 * ln($m.0 / f.zeros)
             |    ELSE CAST(${HllSketch.alpha(1 << HllP)} AS DOUBLE) * $m.0 * $m.0
             |      * ${math.pow(2.0, 52)} / f.sumexp_s52 END) * 1e6 + 0.5)
             |    AS BIGINT) AS est_distinct_e6
             |FROM nn, f_$n f""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH $blocks,
           |nn AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    ${cols.map { case (n, _, _) =>
                 s"CAST(SUM(CASE WHEN $n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$n"
               }.mkString(", ")}
           |  FROM lineitem)
           |$arms""".stripMargin
      })
  }

  /** q246: categorical dependency discovery (the profiler's second
    * face beside q245): pairwise Cramér's V over three column pairs,
    * all contingency tables from ONE stacked pass (pair-keyed explode
    * → one groupBy — never a scan per pair). χ² enters through the
    * identity χ² = n·(Σ O²⁄(rᵢ·cⱼ)) − n: every O²⁄(rᵢcⱼ) term is a
    * ratio of exact-in-double integers and the Σ rides the scaled-long
    * exact path, so the statistic is order-independent and the oracle
    * replays it bit-for-bit; V = √(χ²⁄(n·(min(r,c)−1))) with the
    * correctly-rounded sqrt. */
  val q246 = GQuery(
    "q246_column_dependence",
    (s, d) => {
      val qb = floor(col("l_quantity") / 10).cast("long").cast("string")
      graft.core.Profile.dependence(lineitem(s, d), Seq(
        ("rf_ls", col("l_returnflag"), col("l_linestatus")),
        ("rf_qb", col("l_returnflag"), qb),
        ("ls_ln", col("l_linestatus"), col("l_linenumber").cast("string"))))
    },
    Some(s"""WITH st AS (
      |  SELECT 'rf_ls' AS pair, l_returnflag AS a, l_linestatus AS b
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'rf_qb', l_returnflag,
      |    CAST(CAST(floor(l_quantity / 10) AS BIGINT) AS VARCHAR)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'ls_ln', l_linestatus, CAST(l_linenumber AS VARCHAR)
      |  FROM lineitem),
      |cont AS (
      |  SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM st GROUP BY 1, 2, 3),
      |ra AS (SELECT pair, a, CAST(SUM(o) AS BIGINT) AS ra
      |       FROM cont GROUP BY 1, 2),
      |cb AS (SELECT pair, b, CAST(SUM(o) AS BIGINT) AS cb
      |       FROM cont GROUP BY 1, 2),
      |nn AS (SELECT pair, CAST(SUM(o) AS BIGINT) AS n,
      |         CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
      |         CAST(COUNT(DISTINCT b) AS BIGINT) AS c
      |       FROM cont GROUP BY 1),
      |sS AS (
      |  SELECT cont.pair,
      |    ${graft.core.Exact.sqlLsumAt(
           "CAST(cont.o * cont.o AS DOUBLE) / CAST(ra.ra * cb.cb AS DOUBLE)",
           "1000000000000.0")} AS s
      |  FROM cont
      |  JOIN ra ON cont.pair = ra.pair AND cont.a = ra.a
      |  JOIN cb ON cont.pair = cb.pair AND cont.b = cb.b
      |  GROUP BY cont.pair)
      |SELECT nn.pair, nn.n, nn.r, nn.c,
      |  CAST(FLOOR((CAST(nn.n AS DOUBLE) * sS.s - CAST(nn.n AS DOUBLE)) * 1e6
      |    + 0.5) AS BIGINT) AS chi2_e6,
      |  CAST(FLOOR(sqrt((CAST(nn.n AS DOUBLE) * sS.s - CAST(nn.n AS DOUBLE))
      |    / CAST(nn.n * (LEAST(nn.r, nn.c) - 1) AS DOUBLE)) * 1e6 + 0.5)
      |    AS BIGINT) AS cramers_v_e6
      |FROM nn JOIN sS ON nn.pair = sS.pair""".stripMargin))

  /** q247: inclusion-dependency (foreign-key) discovery from KMV
    * states — the cross-TABLE face of q239 and the profiler's third
    * face: containment(child ⊆ parent) estimated from two bounded
    * sketches as |m ∩ t_c ∩ t_p| / |m ∩ t_c| (within the union's
    * k-minima, the fraction of child-side minima that also sit in the
    * parent's sketch — the conditional-probability estimator of the
    * SINDY/Spider profiling line). One sketch per column, ONE pass per
    * table; candidate FK pairs then cost array expressions on a
    * bounded frame, never a cross-table join of raw keys. Exact
    * containments ride along, so estimator accuracy is hash-gated:
    * the true FKs score 1.0, the negative control does not. */
  val q247 = {
    val k = 64
    GQuery(
      "q247_fk_discovery",
      (s, dir) => {
        graft.functions.KMinHashes.register(s)
        // the long KMV arm (r10): hash60 kernel + int64 minima — no
        // 32-hex-char md5 string per row, 8-byte keys through the
        // distinct shuffles; minima ORDER identically to the hex arm
        def st(name: String, df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) =
          df.select(call_function("hash60", c.cast("string"), lit("")).as("h"))
            .agg(call_function("k_min_hashes_long", col("h"), lit(k)).as("tops"),
              countDistinct(col("h")).as("nd"))
            .select(lit(name).as("cid"), col("tops"), col("nd"))
        val states = st("li_ok", lineitem(s, dir), col("l_orderkey"))
          .unionByName(st("ord_ok", orders(s, dir), col("o_orderkey")))
          .unionByName(st("ord_ck", orders(s, dir), col("o_custkey")))
          .unionByName(st("cust_ck", customer(s, dir), col("c_custkey")))
          // the mis-hypothesized FK: an id whose range outgrows the
          // parent (dense keys -> exactly half contained)
          .unionByName(st("ord_ok2", orders(s, dir), col("o_orderkey") * 2))
          .localCheckpoint(eager = false)
        val pairsDf = s.createDataFrame(Seq(
          ("li_ok", "ord_ok"), ("ord_ck", "cust_ck"), ("ord_ok2", "ord_ok")))
          .toDF("child", "parent")
        val joined = pairsDf
          .join(states.select(col("cid").as("child"), col("tops").as("tc"),
            col("nd").as("ndc")), Seq("child"))
          .join(states.select(col("cid").as("parent"), col("tops").as("tp")),
            Seq("parent"))
          .withColumn("m", slice(array_sort(array_union(col("tc"), col("tp"))), 1, k))
        val inC = size(array_intersect(col("m"), col("tc")))
        val inBoth = size(array_intersect(array_intersect(col("m"), col("tc")),
          col("tp")))
        // exact containment per pair, from raw distinct keys
        def exact(childDf: org.apache.spark.sql.DataFrame,
                  cc: org.apache.spark.sql.Column,
                  parentDf: org.apache.spark.sql.DataFrame, pc: String,
                  name: (String, String)) = {
          val cd = childDf.select(cc.as("v")).distinct()
          val pd = parentDf.select(col(pc).as("v")).distinct()
          cd.join(pd, Seq("v"), "left_semi").agg(count(lit(1)).as("n_in"))
            .crossJoin(cd.agg(count(lit(1)).as("n_child")))
            .select(lit(name._1).as("child"), lit(name._2).as("parent"),
              col("n_in"), col("n_child"))
        }
        val exacts = exact(lineitem(s, dir), col("l_orderkey"), orders(s, dir),
            "o_orderkey", ("li_ok", "ord_ok"))
          .unionByName(exact(orders(s, dir), col("o_custkey"), customer(s, dir),
            "c_custkey", ("ord_ck", "cust_ck")))
          .unionByName(exact(orders(s, dir), col("o_orderkey") * 2, orders(s, dir),
            "o_orderkey", ("ord_ok2", "ord_ok")))
        joined
          .select(col("child"), col("parent"),
            inC.cast("long").as("n_child_minima"),
            // a tiny child vs a huge parent can leave zero child-side
            // minima in the union's top-k: the sketch is then honest
            // about indeterminacy (null), never divides by zero
            when(inC > 0,
              floor(inBoth.cast("double") / inC.cast("double") * 1e6 + 0.5)
                .cast("long")).otherwise(lit(null).cast("long"))
              .as("containment_est_e6"))
          .join(exacts, Seq("child", "parent"))
          .withColumn("containment_exact_e6",
            floor(col("n_in").cast("double") / col("n_child").cast("double")
              * 1e6 + 0.5).cast("long"))
          .drop("n_in", "n_child")
      },
      Some(s"""WITH cols AS (
        |  SELECT 'li_ok' AS cid, CAST(('0x' || substr(md5(CAST(l_orderkey
        |    AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM lineitem
        |  UNION ALL
        |  SELECT 'ord_ok', CAST(('0x' || substr(md5(CAST(o_orderkey
        |    AS VARCHAR)), 1, 15)) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'ord_ck', CAST(('0x' || substr(md5(CAST(o_custkey
        |    AS VARCHAR)), 1, 15)) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'cust_ck', CAST(('0x' || substr(md5(CAST(c_custkey
        |    AS VARCHAR)), 1, 15)) AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT 'ord_ok2', CAST(('0x' || substr(md5(CAST(o_orderkey * 2
        |    AS VARCHAR)), 1, 15)) AS BIGINT) FROM orders),
        |dh AS (SELECT DISTINCT cid, h FROM cols),
        |st AS (
        |  SELECT cid, list_slice(list_sort(list(h)), 1, $k) AS tops
        |  FROM dh GROUP BY cid),
        |pr AS (
        |  SELECT * FROM (VALUES ('li_ok', 'ord_ok'), ('ord_ck', 'cust_ck'),
        |    ('ord_ok2', 'ord_ok')) AS t(child, parent)),
        |est AS (
        |  SELECT pr.child, pr.parent,
        |    list_slice(list_sort(list_distinct(list_concat(c.tops, p.tops))),
        |      1, $k) AS m, c.tops AS tc, p.tops AS tp
        |  FROM pr JOIN st c ON pr.child = c.cid JOIN st p ON pr.parent = p.cid),
        |ev AS (
        |  SELECT child, parent,
        |    CAST(len(list_filter(m, x -> list_contains(tc, x))) AS BIGINT)
        |      AS n_child_minima,
        |    CAST(len(list_filter(m, x -> list_contains(tc, x)
        |      AND list_contains(tp, x))) AS BIGINT) AS n_both
        |  FROM est),
        |exv AS (
        |  SELECT 'li_ok' AS child, 'ord_ok' AS parent,
        |    (SELECT COUNT(DISTINCT l.l_orderkey) FROM lineitem l
        |     WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders)) AS n_in,
        |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_child
        |  UNION ALL
        |  SELECT 'ord_ck', 'cust_ck',
        |    (SELECT COUNT(DISTINCT o.o_custkey) FROM orders o
        |     WHERE o.o_custkey IN (SELECT c_custkey FROM customer)),
        |    (SELECT COUNT(DISTINCT o_custkey) FROM orders)
        |  UNION ALL
        |  SELECT 'ord_ok2', 'ord_ok',
        |    (SELECT COUNT(DISTINCT o.o_orderkey * 2) FROM orders o
        |     WHERE o.o_orderkey * 2 IN (SELECT o_orderkey FROM orders)),
        |    (SELECT COUNT(DISTINCT o_orderkey * 2) FROM orders))
        |SELECT ev.child, ev.parent, ev.n_child_minima,
        |  CASE WHEN ev.n_child_minima > 0 THEN
        |    CAST(FLOOR(CAST(ev.n_both AS DOUBLE)
        |      / CAST(ev.n_child_minima AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |  END AS containment_est_e6,
        |  CAST(FLOOR(CAST(exv.n_in AS DOUBLE) / CAST(exv.n_child AS DOUBLE)
        |    * 1e6 + 0.5) AS BIGINT) AS containment_exact_e6
        |FROM ev JOIN exv ON ev.child = exv.child AND ev.parent = exv.parent""".stripMargin))
  }

  /** q250: numeric quantile profile — the profiler's quantile face
    * ([[graft.core.Profile.quantiles]], the r9 verdict's KLL-wiring
    * handoff): count/nulls/min/max/p50/p95 for four lineitem measures
    * in one stacked pass. Capacity 65536 exceeds the sf0.01 row count,
    * so every sketch sits in its EXACT regime and the answers are
    * type-7 quantiles the oracle replays with `quantile_cont` (the
    * q113 mirror); above capacity the same plan degrades to bounded-
    * memory KLL. `l_discount_nz` NULLIFs zeros so the null-accounting
    * arm is load-bearing, not vacuously zero. */
  val q250 = {
    val cols = Seq(
      ("l_quantity", col("l_quantity")),
      ("l_extendedprice", col("l_extendedprice")),
      ("l_tax", col("l_tax")),
      ("l_discount_nz", nullif(col("l_discount"), lit(0.0))))
    GQuery(
      "q250_profile_quantiles",
      (s, d) => graft.core.Profile.quantiles(lineitem(s, d), cols),
      Some {
        val arms = Seq(
          ("l_quantity", "l_quantity"),
          ("l_extendedprice", "l_extendedprice"),
          ("l_tax", "l_tax"),
          ("l_discount_nz", "NULLIF(l_discount, 0)")).map { case (n, sql) =>
          s"""SELECT '$n' AS col_name,
             |  CAST(COUNT(v) AS BIGINT) AS n,
             |  CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_nulls,
             |  MIN(v) AS min_v, MAX(v) AS max_v,
             |  round(quantile_cont(v, 0.5), 6) AS p50,
             |  round(quantile_cont(v, 0.95), 6) AS p95
             |FROM (SELECT CAST($sql AS DOUBLE) AS v FROM lineitem)""".stripMargin
        }.mkString("\nUNION ALL\n")
        arms
      })
  }

  /** q249: frequent-value census (the profiler's fourth face): top-3
    * most frequent values per column with counts and share — the
    * histogram head every stats collector publishes. All columns ride
    * ONE stacked pass into one census groupBy; the per-column rank is
    * the row_number spelling, so the TopKPerKey rewrite plans the
    * bounded per-key heap (the q235 discipline), never a full
    * per-column sort of the value census. */
  val q249 = GQuery(
    "q249_frequent_values",
    (s, d) => {
      val qb = floor(col("l_quantity") / 10).cast("long")
      graft.core.Profile.frequentValues(lineitem(s, d), Seq(
        ("l_returnflag", col("l_returnflag")),
        ("l_linestatus", col("l_linestatus")),
        ("l_linenumber", col("l_linenumber")),
        ("l_quantity_bucket", qb)), k = 3)
    },
    Some("""WITH st AS (
      |  SELECT 'l_returnflag' AS col_name, l_returnflag AS value FROM lineitem
      |  UNION ALL
      |  SELECT 'l_linestatus', l_linestatus FROM lineitem
      |  UNION ALL
      |  SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity_bucket',
      |    CAST(CAST(floor(l_quantity / 10) AS BIGINT) AS VARCHAR)
      |  FROM lineitem),
      |cen AS (
      |  SELECT col_name, value, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM st GROUP BY 1, 2),
      |tot AS (SELECT col_name, CAST(SUM(n) AS BIGINT) AS tot
      |        FROM cen GROUP BY 1),
      |rk AS (
      |  SELECT col_name, value, n,
      |    CAST(row_number() OVER (PARTITION BY col_name
      |      ORDER BY n DESC, value ASC) AS BIGINT) AS rank
      |  FROM cen)
      |SELECT rk.col_name, rk.rank, rk.value, rk.n,
      |  CAST(FLOOR(CAST(rk.n AS DOUBLE) / CAST(t.tot AS DOUBLE) * 1e6 + 0.5)
      |    AS BIGINT) AS share_e6
      |FROM rk JOIN tot t ON rk.col_name = t.col_name
      |WHERE rk.rank <= 3""".stripMargin))

  /** q260: KLL quantile-sketch state rollup — closes the sketch-merge
    * algebra beside q222 (HLL), q227 (Count-Min) and q228 (KMV):
    * per-language `kll_state` over n_chars is built in ONE documents
    * scan, and the corpus-level grain is answered by `kll_merge` over
    * those states — never a rescan. Capacity 16384 exceeds the sf0.01
    * corpus, so no compaction fires and every estimate IS the exact
    * R-type-7 quantile — the oracle replays all grains with
    * `quantile_cont`, putting the state build + merge + eval path
    * itself under the hash gate (the q222 discipline). Beyond
    * capacity the same path degrades to the KLL rank bound, which
    * QuantileSketchSpec property-tests (merge ≡ direct within bound,
    * adversarial orders). */
  val q260 = {
    import graft.functions.KllAlgebra
    GQuery(
      "q260_kll_rollup",
      (s, d) => {
        KllAlgebra.register(s)
        val fine = documents(s, d)
          .select(col("lang"), col("n_chars").cast("double").as("v"))
          .groupBy(col("lang"))
          .agg(expr("kll_state(v, 16384)").as("__st"))
          // two consumers (own grain + the all-grain merge)
          .localCheckpoint(eager = false)
        val byLang = fine.select(lit("lang").as("grain"), col("lang"), col("__st"))
        val all = fine.agg(expr("kll_merge(__st, 16384)").as("__st"))
          .select(lit("all").as("grain"), lit(null).cast("string").as("lang"),
            col("__st"))
        byLang.unionByName(all)
          .select(col("grain"), col("lang"),
            expr("kll_n(__st)").as("n"),
            round(expr("kll_value(__st, 0.5)"), 6).as("p50"),
            round(expr("kll_value(__st, 0.95)"), 6).as("p95"))
      },
      Some("""SELECT 'lang' AS grain, lang, COUNT(*) AS n,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 6) AS p95
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT 'all', NULL, COUNT(*),
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6),
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 6)
        |FROM documents""".stripMargin))
  }

  /** q289: equi-width histogram face of the profiler (beside q245's
    * type/null/HLL census and q250's quantile face): for each numeric
    * column, min/max plus 16 bucket counts — the distribution sketch a
    * data catalog renders as the little bar chart per column. ENTIRELY
    * integer under the hash: values quantize to e2 longs, the bucket
    * index is `(x−min)·16 div (max−min+1)` (truncating ÷, never a
    * float bin edge), and the columns stack through ONE map-side
    * explode so the scan reads each row once (the q245 one-scan
    * discipline). Bucket rows absent from the data are genuinely empty
    * (not zero-filled) — the catalog's sparse census. */
  val q289 = GQuery(
    "q289_histogram_profile",
    (s, d) => {
      // deliberately NOT landed: the stack is 3 rows per fact row, and
      // materializing 3N rows costs more than the second PRUNED
      // columnar scan it would save (measured at sf1: the landed
      // variant spent 12.3 s, mostly writing the 18M-row stack; the
      // min/max pass is a map-side agg over 3 pruned columns)
      def stacked = lineitem(s, d).select(explode(map(
        lit("l_quantity"), floor(col("l_quantity") * 100 + 0.5).cast("long"),
        lit("l_extendedprice"), floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
        lit("l_discount"), floor(col("l_discount") * 100 + 0.5).cast("long")
      )).as(Seq("col_name", "x_e2")))
      val mm = stacked.groupBy(col("col_name"))
        .agg(min(col("x_e2")).as("min_e2"), max(col("x_e2")).as("max_e2"))
      stacked.join(broadcast(mm), Seq("col_name"))
        .groupBy(col("col_name"), col("min_e2"), col("max_e2"),
          expr("((x_e2 - min_e2) * 16) div (max_e2 - min_e2 + 1)").as("bucket"))
        .agg(lcount(lit(1)).as("n"))
        .orderBy(col("col_name"), col("bucket"))
    },
    Some("""WITH stacked AS MATERIALIZED (
      |  SELECT u.col_name, u.x_e2 FROM lineitem,
      |    UNNEST([
      |      {'col_name': 'l_quantity',
      |       'x_e2': CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)},
      |      {'col_name': 'l_extendedprice',
      |       'x_e2': CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)},
      |      {'col_name': 'l_discount',
      |       'x_e2': CAST(floor(l_discount * 100 + 0.5) AS BIGINT)}]) AS t(u)),
      |mm AS (
      |  SELECT col_name, MIN(x_e2) AS min_e2, MAX(x_e2) AS max_e2
      |  FROM stacked GROUP BY col_name)
      |SELECT s.col_name, mm.min_e2, mm.max_e2,
      |  ((s.x_e2 - mm.min_e2) * 16) // (mm.max_e2 - mm.min_e2 + 1) AS bucket,
      |  COUNT(*) AS n
      |FROM stacked s JOIN mm USING (col_name)
      |GROUP BY 1, 2, 3, 4 ORDER BY col_name, bucket""".stripMargin))

  /** q316: sketch-based join-size estimation — the AGMS/CM inner
    * product an optimizer consults BEFORE committing to a shuffle
    * (Alon–Matias–Szegedy 1996; Cormode–Muthukrishnan 2005 §4.2):
    * |A ⋈ B| ≤ min_d Σ_w a[d][w]·b[d][w], never an underestimate.
    * Two arms over the l_partkey sketches: the self-join size
    * (Σ c_k² — the skew statistic AQE wants) and the size of the join
    * against the 'R'-flag subset. Counters are built RELATIONALLY
    * (per-(depth, md5-cell) counts — the q163/q227 cell discipline,
    * so the oracle replays every counter), inner products and exact
    * answers are DECIMAL-exact, and the overestimate ships as ppm
    * (truncating ÷ of nonnegatives). One scan + one bounded
    * (d·width)-row frame at any fact size. */
  val q316 = {
    val (dep, wdt) = (3, 64)
    GQuery(
      "q316_join_size_estimate",
      (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        // ONE fact scan: the per-key census feeds the exact answer AND
        // the sketch (counters sum the census's counts — a CM sketch of
        // keyed data never needs to hash the fact rows; hashing 200k
        // distinct keys beats hashing 6M rows, measured 14 s → the
        // row-grain md5 was the scan cost)
        val perKey = lineitem(s, dir)
          .groupBy(col("l_partkey").cast("string").as("k"))
          .agg(count(lit(1)).as("ck"),
            coalesce(sum(when(col("l_returnflag") === "R", 1L)), lit(0L))
              .as("cr"))
          .localCheckpoint(eager = false) // sketch build + exact arm
        // depth d reads hex chars [7d, 7d+7) of one digest per key
        val cells = perKey
          .withColumn("h", md5(col("k")))
          .withColumn("d", explode(array((0 until dep).map(lit): _*)))
          .groupBy(col("d"),
            (expr("CAST(conv(substring(h, CAST(d * 7 + 1 AS INT), 7), 16, 10) AS BIGINT)")
              % wdt).as("c"))
          .agg(sum(col("ck")).cast(dec).as("n_all"),
            sum(col("cr")).cast(dec).as("n_r"))
        val perDepth = cells.groupBy(col("d"))
          .agg(sum(col("n_all") * col("n_all")).as("est_self"),
            sum(col("n_all") * col("n_r")).as("est_rf"))
        val est = perDepth.agg(min(col("est_self")).as("cm_self"),
          min(col("est_rf")).as("cm_rf"))
        val exact = perKey
          .agg(sum(col("ck").cast(dec) * col("ck")).as("ex_self"),
            sum(col("ck").cast(dec) * col("cr")).as("ex_rf"))
        est.crossJoin(exact) // 1-row x 1-row
          .selectExpr(
            "stack(2, 'self_join', CAST(ex_self AS BIGINT), CAST(cm_self AS BIGINT), " +
              "'filtered_join', CAST(ex_rf AS BIGINT), CAST(cm_rf AS BIGINT)) " +
              "AS (arm, exact_pairs, cm_estimate)")
          .select(col("arm"), col("exact_pairs"), col("cm_estimate"),
            expr("""CASE WHEN exact_pairs > 0 THEN
              |((CAST(cm_estimate AS DECIMAL(38,0)) - exact_pairs) * 1000000)
              |  div exact_pairs
              |END""".stripMargin).as("over_ppm"))
          .orderBy(col("arm"))
      },
      Some(s"""WITH per_key AS MATERIALIZED (
        |  SELECT CAST(l_partkey AS VARCHAR) AS k,
        |    CAST(COUNT(*) AS BIGINT) AS ck,
        |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN 1 END), 0)
        |      AS BIGINT) AS cr
        |  FROM lineitem GROUP BY 1),
        |dep AS (SELECT * FROM (VALUES (0),(1),(2)) AS t(d)),
        |cells AS (
        |  SELECT dep.d,
        |    CAST(('0x' || substr(md5(p.k), dep.d * 7 + 1, 7))
        |      AS BIGINT) % $wdt AS c,
        |    CAST(SUM(p.ck) AS HUGEINT) AS n_all,
        |    CAST(SUM(p.cr) AS HUGEINT) AS n_r
        |  FROM per_key p CROSS JOIN dep GROUP BY 1, 2),
        |per_depth AS (
        |  SELECT d, SUM(n_all * n_all) AS est_self, SUM(n_all * n_r) AS est_rf
        |  FROM cells GROUP BY d),
        |est AS (
        |  SELECT MIN(est_self) AS cm_self, MIN(est_rf) AS cm_rf FROM per_depth),
        |exact AS (
        |  SELECT SUM(CAST(ck AS HUGEINT) * ck) AS ex_self,
        |    SUM(CAST(ck AS HUGEINT) * cr) AS ex_rf
        |  FROM per_key),
        |arms AS (
        |  SELECT 'self_join' AS arm, CAST(ex_self AS BIGINT) AS exact_pairs,
        |    CAST(cm_self AS BIGINT) AS cm_estimate
        |  FROM est, exact
        |  UNION ALL
        |  SELECT 'filtered_join', CAST(ex_rf AS BIGINT), CAST(cm_rf AS BIGINT)
        |  FROM est, exact)
        |SELECT arm, exact_pairs, cm_estimate,
        |  CAST(CASE WHEN exact_pairs > 0 THEN
        |    ((CAST(cm_estimate AS HUGEINT) - exact_pairs) * 1000000)
        |      // exact_pairs
        |  END AS BIGINT) AS over_ppm
        |FROM arms ORDER BY arm""".stripMargin))
  }

  /** q383: AMS F₂ (second frequency moment) sketch with its merge law
    * (Alon–Matias–Szegedy 1996) — the sketch-family member beside
    * KMV/HLL (F₀), CM (point/inner), MG (heavy hitters) and KLL
    * (quantiles): F₂ = Σ f_k² is the self-join size, and the AMS state
    * is 64 signed counters C_j = Σ_k s(k,j)·f_k with md5-derived ±1
    * signs — pure INTEGER arithmetic end to end, so the sketch, the
    * median-of-8-group-means estimator, and the exact F₂ all sit
    * under the hash. The merge law is demonstrated, not asserted:
    * per-source-slice states sum element-wise into exactly the
    * direct state (linearity), so `f2_ams_merged == f2_ams` in the
    * output. Counter updates run on the KEY frame (the f_k
    * histogram), never on raw facts — the 64× blowup applies to
    * distinct keys. */
  val q383 = GQuery(
    "q383_ams_f2_sketch",
    (s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
      val fk = lineitem(s, d)
        .groupBy(col("l_partkey").as("k"), (col("l_orderkey") % 3).as("src"))
        .agg(lcount(lit(1)).as("f"))
        .localCheckpoint(eager = false) // per-slice + per-key consumers
      val fa = fk.groupBy(col("k")).agg(sum(col("f")).as("fa"))
        .localCheckpoint(eager = false) // exact F2 + the direct state
      val exact = fa.agg(sum((col("fa").cast(dec0) * col("fa"))).as("f2_exact"))
      // r11: the ±1 sign depends on (k, j) ONLY — build the md5 sign
      // grid once on the distinct keys (|K|·64 rows) instead of
      // re-hashing per (k, src, j) row in two diverged `signed`
      // copies (was 2 × |K|·3·64 md5 evaluations; guide §1.2/§2.3).
      // r12: frequencies attach by plain equi-join on k — fk/fa grow
      // with distinct keys, so a forced broadcast would hit the 8 GB
      // cap at scale; AQE converts to broadcast at runtime while the
      // frames are actually small (guide §3.1).
      val kj = fa.select(col("k"), explode(sequence(lit(0), lit(63))).as("j"))
        .withColumn("sgn",
          when(conv(substring(md5(concat_ws("-", lit("ams"),
            col("k").cast("string"), col("j").cast("string"))), 1, 7),
            16, 10).cast("long") % 2 === 0, 1L).otherwise(-1L))
        .localCheckpoint(eager = false) // slice + direct states probe it
      // per-slice states, then the MERGE (element-wise sum) — and the
      // direct state is the same sum taken without the slice grain
      val sliceState = kj.join(fk, Seq("k"))
        .groupBy(col("src"), col("j"))
        .agg(sum(col("sgn") * col("f")).as("c"))
      val merged = sliceState.groupBy(col("j")).agg(sum(col("c")).as("c"))
      def estimate(state: org.apache.spark.sql.DataFrame) = {
        val gm = state.groupBy((col("j") % 8).as("g"))
          .agg((sum((col("c").cast(dec0) * col("c"))).cast("double") / 8)
            .as("m"))
        gm.withColumn("rn", row_number().over(W.orderBy(col("m"), col("g"))))
          .agg((dsum(when(col("rn") === 4 || col("rn") === 5, col("m")))
            / 2).as("est"))
      }
      val direct = kj.join(fa, Seq("k"))
        .groupBy(col("j"))
        .agg(sum(col("sgn") * col("fa")).as("c"))
      estimate(direct).select(col("est").as("f2_ams"))
        .crossJoin(broadcast(estimate(merged)
          .select(col("est").as("f2_ams_merged"))))
        .crossJoin(broadcast(exact))
        .select(col("f2_exact").cast("double").as("f2_exact"),
          round(col("f2_ams"), 6).as("f2_ams"),
          round(col("f2_ams_merged"), 6).as("f2_ams_merged"),
          round(abs(col("f2_ams") - col("f2_exact").cast("double"))
            / col("f2_exact").cast("double"), 6).as("rel_err"))
    },
    Some("""WITH fk AS (
      |  SELECT l_partkey AS k, l_orderkey % 3 AS src,
      |    CAST(COUNT(*) AS BIGINT) AS f
      |  FROM lineitem GROUP BY 1, 2),
      |exact AS (
      |  SELECT SUM(CAST(fa AS HUGEINT) * fa) AS f2_exact
      |  FROM (SELECT k, CAST(SUM(f) AS BIGINT) AS fa FROM fk GROUP BY k)),
      |signed AS (
      |  SELECT k, src, f, u.j,
      |    CASE WHEN CAST(('0x' || substr(md5('ams' || '-'
      |      || CAST(k AS VARCHAR) || '-' || CAST(u.j AS VARCHAR)), 1, 7))
      |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      |  FROM fk, UNNEST(generate_series(0, 63)) AS u(j)),
      |slice_state AS (
      |  SELECT src, j, CAST(SUM(sgn * f) AS BIGINT) AS c
      |  FROM signed GROUP BY src, j),
      |merged AS (
      |  SELECT j, CAST(SUM(c) AS BIGINT) AS c FROM slice_state GROUP BY j),
      |direct AS (
      |  SELECT j, CAST(SUM(sgn * f) AS BIGINT) AS c FROM signed GROUP BY j),
      |est_d AS (
      |  SELECT CAST(SUM(CAST(
      |      (CASE WHEN rn IN (4, 5) THEN m END) AS DECIMAL(38,6)))
      |    AS DOUBLE) / 2 AS est
      |  FROM (SELECT m, g, row_number() OVER (ORDER BY m, g) AS rn
      |        FROM (SELECT j % 8 AS g,
      |                CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) / 8 AS m
      |              FROM direct GROUP BY j % 8))),
      |est_m AS (
      |  SELECT CAST(SUM(CAST(
      |      (CASE WHEN rn IN (4, 5) THEN m END) AS DECIMAL(38,6)))
      |    AS DOUBLE) / 2 AS est
      |  FROM (SELECT m, g, row_number() OVER (ORDER BY m, g) AS rn
      |        FROM (SELECT j % 8 AS g,
      |                CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) / 8 AS m
      |              FROM merged GROUP BY j % 8)))
      |SELECT CAST(e.f2_exact AS DOUBLE) AS f2_exact,
      |  round(d.est, 6) AS f2_ams, round(m.est, 6) AS f2_ams_merged,
      |  round(abs(d.est - CAST(e.f2_exact AS DOUBLE))
      |    / CAST(e.f2_exact AS DOUBLE), 6) AS rel_err
      |FROM est_d d CROSS JOIN est_m m CROSS JOIN exact e""".stripMargin))

  def queries: Seq[GQuery] =
    Seq(q154, q156, q208, q222, q227, q228, q239, q245, q246, q247, q249,
      q250, q260, q289, q316, q383)
}
