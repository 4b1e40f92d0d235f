package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss peeling over an undirected graph — the cohesion filter one
  * notch above triangle counting: an edge survives the k-truss iff it
  * participates in ≥ k−2 triangles among surviving edges (Cohen 2008,
  * "Trusses: cohesive subgraphs for social network analysis"). Where
  * PageRank ranks nodes and k-core (q259) peels by degree, the truss
  * peels by TRIANGLE support, which is what separates a link farm's
  * near-clique from an organic hub's star — stars have degree but no
  * triangles.
  *
  * Scale shape: edges are oriented ONCE by (initial degree, id) — any
  * fixed strict order enumerates each triangle exactly once as a wedge
  * at its minimum corner, and initial-degree orientation bounds wedge
  * fan-out by the original graph's degeneracy (the
  * [[Triangles.perNode]] argument; peeling only shrinks neighborhoods,
  * so the bound keeps holding in later rounds). Each round is three
  * equi-joins (wedge build, closure probe, support join-back) and one
  * map-side-combined count — no collect, no cartesian; per-round
  * `localCheckpoint` cuts the iteration lineage exactly like
  * [[PageRank]]. A fixed round count keeps the dynamics deterministic
  * and oracle-unrollable (the q153 discipline); rounds beyond the
  * fixpoint are no-ops.
  */
object KTruss {

  /** `rounds` support-peel rounds toward the k-truss of `edges`
    * (columns `srcCol`, `dstCol`; self-loops and duplicate/reversed
    * pairs canonicalized away).
    *
    * @return surviving edges as (u, v, support) with u < v by id and
    *         `support` the edge's triangle count over the PREVIOUS
    *         round's edge set (the value the final peel filtered on,
    *         ≥ k−2 by construction)
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String,
           k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && rounds >= 1)
    val minSup = (k - 2).toLong
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("d"))
    // fixed orientation from the ORIGINAL degrees: lo ≺ hi in (d, id)
    val oriented0 = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"),
        // the orientation key of the HI endpoint, carried for the
        // wedge-dedup comparison (dv, v) ≺ (dw, w)
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("db"))
          .otherwise(col("da")).as("dhi"))
      .localCheckpoint(eager = false)

    var cur = oriented0
    var lastSup: DataFrame = null
    (1 to rounds).foreach { _ =>
      // wedges at the low corner: two out-edges of `u`, ordered by the
      // orientation key so each unordered {v, w} appears once
      val e1 = cur.select(col("lo").as("u"), col("hi").as("v"), col("dhi").as("dv"))
      val e2 = cur.select(col("lo").as("u"), col("hi").as("w"), col("dhi").as("dw"))
      val wedges = e1.join(e2, Seq("u"))
        .filter(col("dv") < col("dw") ||
          (col("dv") === col("dw") && col("v") < col("w")))
      // closure probe: the oriented edge (v, w) exists iff {v, w} ∈ E
      val tri = wedges.join(
        cur.select(col("lo").as("v"), col("hi").as("w")), Seq("v", "w"))
        .select(col("u"), col("v"), col("w"))
      val sup = tri.select(col("u").as("slo"), col("v").as("shi"))
        .unionAll(tri.select(col("u").as("slo"), col("w").as("shi")))
        .unionAll(tri.select(col("v").as("slo"), col("w").as("shi")))
        .groupBy(col("slo"), col("shi"))
        .agg(count(lit(1)).cast("long").as("support"))
      lastSup = sup
      cur = cur.join(sup,
          col("lo") === col("slo") && col("hi") === col("shi"))
        .filter(col("support") >= minSup)
        .select(col("lo"), col("hi"), col("dhi"))
        .localCheckpoint(eager = false)
    }
    cur.join(lastSup,
        col("lo") === col("slo") && col("hi") === col("shi"))
      .select(least(col("lo"), col("hi")).as("u"),
        greatest(col("lo"), col("hi")).as("v"),
        col("support"))
  }
}
