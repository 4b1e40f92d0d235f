package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the DeepWalk /
  * node2vec preprocessing step (Perozzi KDD'14): graph-embedding
  * trainers consume walk sequences, not edges, so the pipeline must
  * turn a 100 TB edge list into walks WITHOUT a driver-side graph. One
  * walk starts at every node; each step joins the frontier against the
  * neighbor index (equi-join on the current node) and picks the next
  * hop by an md5 draw over the SORTED neighbor list — so every walk
  * replays bit-for-bit on any engine (ST8 discipline), unlike
  * RNG-seeded walkers. Dead ends hold their position (the lazy
  * self-loop convention).
  *
  * Scale shape: the neighbor index builds once (one groupBy) and is
  * eagerly pinned; each of the `steps` rounds is one equi-join +
  * projection over the walk frontier (|nodes| rows), checkpointed with
  * fresh stats per round (the iterative-fit discipline). */
object RandomWalks {

  /** One walk per graph node, `steps` hops. Output: (walk = start
    * node, end_node, path — comma-joined node sequence incl. start). */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
            steps: Int, salt: String): DataFrame = {
    val spark = edges.sparkSession
    val ed = edges.select(col(srcCol).as("cur"), col(dstCol).as("d")).distinct()
    val nbr0 = ed.groupBy(col("cur"))
      .agg(sort_array(collect_list(col("d"))).as("nbrs"))
      .localCheckpoint(eager = true)
    val nbr = spark.createDataFrame(nbr0.rdd, nbr0.schema)
    val nodes = ed.select(col("cur")).unionByName(ed.select(col("d").as("cur")))
      .distinct()
    var st = nodes.select(col("cur").as("walk"), col("cur"),
        col("cur").cast("string").as("path"))
      .localCheckpoint(eager = true)
    st = spark.createDataFrame(st.rdd, st.schema)
    for (i <- 1 to steps) {
      val r = conv(substring(md5(concat_ws("-", lit(salt), col("walk"),
        lit(i.toString))), 1, 7), 16, 10).cast("long")
      val next = st.join(nbr, Seq("cur"), "left")
        .withColumn("__next",
          when(col("nbrs").isNotNull,
            element_at(col("nbrs"), (r % size(col("nbrs")) + 1).cast("int")))
            .otherwise(col("cur")))
        .select(col("walk"), col("__next").as("cur"),
          concat(col("path"), lit(","), col("__next")).as("path"))
        .localCheckpoint(eager = true)
      st = spark.createDataFrame(next.rdd, next.schema)
    }
    st.select(col("walk"), col("cur").as("end_node"), col("path"))
  }
}
