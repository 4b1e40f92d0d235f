package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointer jumping over a parent forest (Wyllie's list-ranking, JACM
  * '79) — thread reconstruction for conversational data: forum/chat
  * corpora arrive as reply-to edges, and turning them into training
  * sequences needs every node's root (thread id), depth, and the full
  * root-ward path. A sequential walk is O(depth) joins; pointer
  * doubling halves every remaining distance per round, so ⌈log₂ d⌉
  * rounds of one self-equi-join each resolve ANY forest — a 10⁶-deep
  * pathological chain costs 20 rounds, not 10⁶.
  *
  * State per node: (anc = 2^r-th ancestor or the root if nearer,
  * d = hops covered, seg = the id chain from the node to anc
  * EXCLUSIVE, done). A jump composes segments in walk order
  * (seg(n→y)‖seg(y→z) = seg(n→z)), so the final path replays in a
  * recursive-CTE oracle byte-for-byte. Per-round eager checkpoints
  * with fresh stats (the BradleyTerry/SuffixArray discipline) keep
  * lineage and planning O(1) per round; the only driver action is the
  * not-done count that terminates the loop. */
object PointerJump {

  /** Resolve a (node, parent) forest — parent NULL marks roots — to
    * (node, root, depth, path): depth in hops, path the comma-joined
    * id chain node→root inclusive. Nodes whose parent chain leaves
    * the frame (dangling parent) are dropped — a forest contract, not
    * silent repair.
    *
    * `depthHint`: when the caller knows an upper bound on tree depth,
    * the first ⌈log₂ hint⌉ rounds run WITHOUT the per-round not-done
    * count — each count is a driver action (two scheduled jobs through
    * the pinned state), and on shallow forests those actions dominate
    * wall time. Correctness does not ride the hint: the counted loop
    * still runs afterwards and finishes any remaining work, so a
    * too-small hint only costs the skipped savings. */
  def linearize(edges: DataFrame, nodeCol: String, parentCol: String,
                maxRounds: Int = 64, depthHint: Option[Int] = None): DataFrame = {
    val spark = edges.sparkSession
    var st = edges.select(
        col(nodeCol).cast("long").as("node"),
        coalesce(col(parentCol).cast("long"), col(nodeCol).cast("long")).as("anc"),
        when(col(parentCol).isNull, lit(0L)).otherwise(lit(1L)).as("d"),
        when(col(parentCol).isNull, lit(""))
          .otherwise(col(nodeCol).cast("string")).as("seg"),
        col(parentCol).isNull.as("done"))
      .localCheckpoint(eager = true)
    st = spark.createDataFrame(st.rdd, st.schema)
    def jump(): Unit = {
      val ancSide = st.select(col("node").as("anc"), col("anc").as("anc2"),
        col("d").as("d2"), col("seg").as("seg2"), col("done").as("done2"))
      val next = st.join(ancSide, Seq("anc"), "inner")
        .select(
          col("node"),
          when(col("done"), col("anc")).otherwise(col("anc2")).as("anc"),
          when(col("done"), col("d")).otherwise(col("d") + col("d2")).as("d"),
          when(col("done"), col("seg"))
            .otherwise(when(col("seg2") === "", col("seg"))
              .otherwise(concat(col("seg"), lit(","), col("seg2")))).as("seg"),
          (col("done") || col("done2")).as("done"))
        .localCheckpoint(eager = true)
      st = spark.createDataFrame(next.rdd, next.schema)
    }
    var round = 0
    depthHint.foreach { h =>
      // after r rounds every chain of depth ≤ 2^r is resolved
      val hinted = math.max(1,
        math.ceil(math.log(math.max(h, 2).toDouble) / math.log(2.0)).toInt)
      while (round < math.min(hinted, maxRounds)) { jump(); round += 1 }
    }
    while (round < maxRounds && st.filter(!col("done")).limit(1).count() > 0) {
      jump()
      round += 1
    }
    // exhaustion is an input contract violation, not a best-effort
    // result: 64 doubling rounds resolve any chain of depth < 2^64, so
    // surviving not-done rows mean the "forest" contains a CYCLE
    // (reply-to loops do occur in scraped data). Fail fast — emitting
    // the partial paths would hash-gate green on row counts while
    // carrying silently truncated contexts downstream.
    if (round == maxRounds && st.filter(!col("done")).limit(1).count() > 0)
      throw new IllegalArgumentException(
        s"PointerJump.linearize: unresolved nodes after $maxRounds rounds — " +
          "the parent relation contains a cycle (not a forest)")
    st.select(col("node"),
      col("anc").as("root"),
      col("d").as("depth"),
      when(col("seg") === "", col("node").cast("string"))
        .otherwise(concat(col("seg"), lit(","), col("anc").cast("string")))
        .as("path"))
  }
}
