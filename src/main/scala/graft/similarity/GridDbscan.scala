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
  * The clustering is factored as a maintainable INDEX — per-point
  * degrees, core–core edges, border→core adjacency — plus a labeling
  * pass, so a delta batch extends the landed index by recomputing
  * only the grid cells the new points can influence ([[extend]]):
  * degrees change within ±1 cell of a new point, border adjacency
  * within ±2 (a promoted neighbor), so the recompute region is the
  * delta's cells dilated twice, with pair candidates drawn from ±3.
  * Component labels are then re-derived globally (cluster MERGES can
  * cascade arbitrarily far — only the cheap edge-level step is
  * global, never the pair work). extend(base, delta) ≡ index(base ∪
  * delta) row-for-row, which is exactly what the q338 oracle gate
  * proves by rebuilding from the union.
  *
  * Determinism: cluster ids are the component-minimum core point id;
  * all arithmetic is integer; grid cells use an explicit positive
  * offset so truncating and flooring division agree on every engine.
  */
object GridDbscan {

  /** The maintainable clustering index: points with cells, per-point
    * neighbor degrees, canonical core–core edges, border→core
    * adjacency. All frames keyed by point id. */
  final case class DbscanIndex(points: DataFrame, deg: DataFrame,
                               coreEdges: DataFrame, borderEdges: DataFrame,
                               epsScaled: Long, minPts: Int)

  // positive offset makes truncating div == floor div (engine-agnostic);
  // callers' coordinates must satisfy |x|,|y| < 10^9
  private val Off = 1000000000L

  private def withCells(pts: DataFrame, idCol: String, xCol: String,
                        yCol: String, epsScaled: Long): DataFrame =
    pts.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", expr(s"(x + ${Off}L) div ${epsScaled}L"))
      .withColumn("cy", expr(s"(y + ${Off}L) div ${epsScaled}L"))

  /** ε-neighbor pairs (ida, idb) with probe's 3×3 neighborhood
    * exploded on the probe side only; includes the self pair. */
  private def pairsOf(probe: DataFrame, build: DataFrame,
                      epsScaled: Long): DataFrame = {
    val offsets = Seq(-1L, 0L, 1L)
    val probed = probe.withColumn("dxy",
        explode(array(offsets.flatMap(dx => offsets.map(dy =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)))
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("dxy.dx")).as("kx"),
        (col("cy") + col("dxy.dy")).as("ky"))
    probed.join(
        build.select(col("id").as("idb"), col("x").as("xb"), col("y").as("yb"),
          col("cx").as("kx"), col("cy").as("ky")),
        Seq("kx", "ky"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb"))
        + (col("ya") - col("yb")) * (col("ya") - col("yb"))
        <= lit(epsScaled) * lit(epsScaled))
      .select(col("ida"), col("idb"))
  }

  /** Degrees, core–core edges and border adjacency from a pair set
    * covering every probe-side point's full neighborhood.
    *
    * r11: `pairs` must arrive PINNED (lazy localCheckpoint) and the
    * degrees are pinned here, mirroring extend(): pairs has three
    * consumers (degrees + both edge kinds) and the core set — derived
    * from degrees — four; without the pins each pushdown-diverged
    * copy re-ran the 9-cell explode join over the full point set
    * (guide §2.4: share one exchange instead of recomputing it). */
  private def artifacts(pairs: DataFrame, minPts: Int)
  : (DataFrame, DataFrame, DataFrame) = {
    val deg = pairs.groupBy(col("ida").as("id"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .localCheckpoint(eager = false)
    val core = deg.filter(col("deg") >= minPts).select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("ida")), Seq("ida"))
      .join(core.select(col("id").as("idb")), Seq("idb"))
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("u"),
        greatest(col("ida"), col("idb")).as("v"))
      .distinct()
    val borderEdges = pairs
      .join(core.select(col("id").as("idb")), Seq("idb"))
      .join(core.select(col("id").as("ida")), Seq("ida"), "left_anti")
      .filter(col("ida") =!= col("idb"))
      .select(col("ida").as("id"), col("idb").as("core_nbr"))
    (deg, coreEdges, borderEdges)
  }

  /** Build the index from scratch. */
  def index(pts: DataFrame, idCol: String, xCol: String, yCol: String,
            epsScaled: Long, minPts: Int): DbscanIndex = {
    require(epsScaled > 0, "epsScaled must be positive")
    val p = withCells(pts, idCol, xCol, yCol, epsScaled)
    val pairs = pairsOf(p, p, epsScaled).localCheckpoint(eager = false)
    val (deg, ce, be) = artifacts(pairs, minPts)
    DbscanIndex(p, deg, ce, be, epsScaled, minPts)
  }

  /** Extend a landed index with a delta batch: pair work is confined
    * to the delta's grid cells dilated by 2 (probe) / 3 (build); the
    * untouched remainder of each artifact is kept as-is; only the
    * edge-level component labeling is global. */
  def extend(idx: DbscanIndex, newPts: DataFrame, idCol: String,
             xCol: String, yCol: String): DbscanIndex = {
    val np = withCells(newPts, idCol, xCol, yCol, idx.epsScaled)
    val all = idx.points.unionByName(np)
    // delta cells dilated: ±2 covers every point whose degree or
    // border adjacency can change; ±3 supplies their pair candidates
    def dilate(cells: DataFrame, r: Int): DataFrame = {
      val ds = (-r.toLong to r.toLong).toSeq
      cells.withColumn("dxy", explode(array(ds.flatMap(dx => ds.map(dy =>
          struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)))
        .select((col("cx") + col("dxy.dx")).as("cx"),
          (col("cy") + col("dxy.dy")).as("cy"))
        .distinct()
    }
    val deltaCells = np.select(col("cx"), col("cy")).distinct()
      .localCheckpoint(eager = false)
    val probeCells = dilate(deltaCells, 2)
    val buildCells = dilate(deltaCells, 3)
    val probe = all.join(probeCells, Seq("cx", "cy"), "left_semi")
      .localCheckpoint(eager = false) // ids reused in three anti-joins
    val build = all.join(buildCells, Seq("cx", "cy"), "left_semi")
    val pairsIn = pairsOf(probe, build, idx.epsScaled)
      .localCheckpoint(eager = false) // degrees + both edge kinds probe it
    val probeIds = probe.select(col("id"))
    val degIn = pairsIn.groupBy(col("ida").as("id"))
      .agg(count(lit(1)).cast("long").as("deg"))
    val deg = idx.deg.join(probeIds, Seq("id"), "left_anti")
      .unionByName(degIn)
      .localCheckpoint(eager = false) // core status probed twice below
    // core status for edge endpoints comes from the MERGED degrees: a
    // pair's build-side endpoint can sit in the ±1 ring outside the
    // probe region, where the OLD degree is still the truth (only
    // delta±1 degrees change; the ring is delta±3 \ delta±2)
    val coreAll = deg.filter(col("deg") >= idx.minPts).select(col("id"))
    val ceIn = pairsIn
      .join(coreAll.select(col("id").as("ida")), Seq("ida"))
      .join(coreAll.select(col("id").as("idb")), Seq("idb"))
      .filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("u"),
        greatest(col("ida"), col("idb")).as("v"))
      .distinct()
    val beIn = pairsIn
      .join(coreAll.select(col("id").as("idb")), Seq("idb"))
      .join(coreAll.select(col("id").as("ida")), Seq("ida"), "left_anti")
      .filter(col("ida") =!= col("idb"))
      .select(col("ida").as("id"), col("idb").as("core_nbr"))
    // an edge is recomputed when EITHER endpoint sits in the probe
    // region; recomputed edges with an out-of-probe endpoint come from
    // the recompute side (build covers the ±1 ring around probe)
    val ceKeep = idx.coreEdges
      .join(probeIds.select(col("id").as("u")), Seq("u"), "left_anti")
      .join(probeIds.select(col("id").as("v")), Seq("v"), "left_anti")
      .select(col("u"), col("v"))
    val coreEdges = ceKeep.unionByName(ceIn).distinct()
    val beKeep = idx.borderEdges.join(probeIds, Seq("id"), "left_anti")
    val borderEdges = beKeep.unionByName(beIn)
    DbscanIndex(all, deg, coreEdges, borderEdges, idx.epsScaled, idx.minPts)
  }

  /** Label every indexed point: (id, role, cluster), cluster NULL for
    * noise, cluster id = component-minimum core id. */
  def labels(idx: DbscanIndex): DataFrame = {
    val core = idx.deg.filter(col("deg") >= idx.minPts).select(col("id"))
    val comp = Components.connected(idx.coreEdges, "u", "v")
      .select(col("node").as("id"), col("component").as("cluster"))
    // isolated cores (no core neighbor) form their own singleton cluster
    val coreComp = core.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    val borderComp = idx.borderEdges
      .join(coreComp.select(col("id").as("core_nbr"), col("cluster")),
        Seq("core_nbr"))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
    idx.points.select(col("id"))
      .join(coreComp.withColumnRenamed("cluster", "c_core"), Seq("id"), "left")
      .join(borderComp.withColumnRenamed("cluster", "c_border"), Seq("id"), "left")
      .select(col("id"),
        when(col("c_core").isNotNull, lit("core"))
          .when(col("c_border").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("c_core"), col("c_border")).as("cluster"))
  }

  /** Cluster `(idCol, xCol, yCol)` rows (x/y integral, e.g. e6-scaled
    * doubles). Returns one row per point: (id, role, cluster) with
    * role ∈ {core, border, noise} and cluster NULL for noise. */
  def cluster(pts: DataFrame, idCol: String, xCol: String, yCol: String,
              epsScaled: Long, minPts: Int): DataFrame =
    labels(index(pts, idCol, xCol, yCol, epsScaled, minPts))
}
