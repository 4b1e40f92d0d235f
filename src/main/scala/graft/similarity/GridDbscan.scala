package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Components

/** Grid-accelerated DBSCAN (Ester et al., KDD'96) over 2-D points —
  * the density clustering a curation pipeline runs on a 2-D embedding
  * projection (post-PCA/UMAP) to find topical islands and flag the
  * sparse in-between as noise, complementing the centroid family
  * (q53 k-means steps assign EVERY point; DBSCAN lets low-density
  * points stay unlabeled). The reference clusters nothing spatially;
  * its grid-binning vocabulary (`R/validate-pds-tracks.R` haversine
  * grids, ported as q46/q49) is the same cell trick used here.
  *
  * Scale shape: coordinates arrive as e6-scaled longs; each point is
  * hashed to an ⌊eps⌋ grid cell and candidate pairs come from a
  * 9-cell equi-join (explode the 3×3 neighborhood on ONE side → a
  * plain shuffle join on the cell key — never an all-pairs product).
  * The exact ε-test is integer arithmetic (diffs ≤ ~2ε·10⁶, squares
  * sum < 2⁶³). Core points (≥ minPts neighbors, self included) link
  * through large-star/small-star connected components
  * ([[Components.connected]]); border points adopt the minimum
  * cluster among their core neighbors; everything else is noise.
  * Pair volume grows with local density per point — ε is a workload
  * parameter, exactly as in any spatial DBSCAN.
  *
  * Determinism: cluster ids are the component-minimum core point id;
  * all arithmetic is integer; grid cells use an explicit positive
  * offset so truncating and flooring division agree on every engine.
  */
object GridDbscan {

  /** Cluster `(idCol, xCol, yCol)` rows (x/y integral, e.g. e6-scaled
    * doubles). Returns one row per point: (id, role, cluster) with
    * role ∈ {core, border, noise} and cluster NULL for noise. */
  def cluster(pts: DataFrame, idCol: String, xCol: String, yCol: String,
              epsScaled: Long, minPts: Int): DataFrame = {
    require(epsScaled > 0, "epsScaled must be positive")
    // positive offset makes truncating div == floor div (engine-agnostic);
    // callers' coordinates must satisfy |x|,|y| < 10^9
    val off = 1000000000L
    val p = pts.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", expr(s"(x + ${off}L) div ${epsScaled}L"))
      .withColumn("cy", expr(s"(y + ${off}L) div ${epsScaled}L"))
    // 3×3 neighborhood exploded on the left side only
    val offsets = Seq(-1L, 0L, 1L)
    val probe = p.withColumn("dxy",
        explode(array(offsets.flatMap(dx => offsets.map(dy =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)))
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("dxy.dx")).as("kx"),
        (col("cy") + col("dxy.dy")).as("ky"))
    val pairs = probe.join(
        p.select(col("id").as("idb"), col("x").as("xb"), col("y").as("yb"),
          col("cx").as("kx"), col("cy").as("ky")),
        Seq("kx", "ky"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb"))
        + (col("ya") - col("yb")) * (col("ya") - col("yb"))
        <= lit(epsScaled) * lit(epsScaled))
      .select(col("ida"), col("idb"))
    val deg = pairs.groupBy(col("ida")).agg(count(lit(1)).as("deg"))
    val core = deg.filter(col("deg") >= minPts).select(col("ida").as("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("ida")), Seq("ida"))
      .join(core.select(col("id").as("idb")), Seq("idb"))
      .filter(col("ida") < col("idb"))
    val comp = Components.connected(coreEdges, "ida", "idb")
      .select(col("node").as("id"), col("component").as("cluster"))
    // isolated cores (no core neighbor) form their own singleton cluster
    val coreComp = core.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val borderComp = pairs
      .join(coreComp.select(col("id").as("idb"), col("cluster")), Seq("idb"))
      .join(core.withColumnRenamed("id", "ida"), Seq("ida"), "left_anti")
      .groupBy(col("ida")).agg(min(col("cluster")).as("cluster"))
      .select(col("ida").as("id"), col("cluster"))
    p.select(col("id"))
      .join(coreComp.withColumnRenamed("cluster", "c_core"), Seq("id"), "left")
      .join(borderComp.withColumnRenamed("cluster", "c_border"), Seq("id"), "left")
      .select(col("id"),
        when(col("c_core").isNotNull, lit("core"))
          .when(col("c_border").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("c_core"), col("c_border")).as("cluster"))
  }
}
