package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-polygon spatial join — points against a TABLE of zones
  * (the reference classifies GPS points into named Timor fishing zones,
  * `/root/reference/R/ingest-pds-data.R:742-747`; [[graft.functions.PointInRing]]
  * is the single-zone scalar, this joins against many).
  *
  * Scalable shape, same philosophy as [[RangeJoin]]: a raw
  * `ON point_in_ring(x, y, ring)` join has no equi-key and planning
  * degenerates to a nested loop over |points|·|zones|. Instead each
  * zone explodes to the fixed-size grid cells covered by its bounding
  * box, each point computes its single cell, the join runs on the cell
  * key, and the exact ray-cast trims bbox false positives. Zone tables
  * are small (hundreds), so the exploded side broadcasts; the point
  * side never shuffles at all.
  */
object SpatialJoin {

  private def even(ring: Column): Column =
    filter(ring, (_, i) => i % 2 === 0) // x coordinates of [x0,y0,x1,y1,…]
  private def odd(ring: Column): Column =
    filter(ring, (_, i) => i % 2 === 1)

  /** All (point, zone) pairs with the point strictly inside the zone's
    * ring. `polys` must carry `ringCol` as the flattened
    * `array<double>` vertex list; every polygon appears once per
    * covered bbox cell but each point matches it at most once (a point
    * has exactly one cell). Pick `cellSize` near the typical zone
    * diameter. */
  def pointInPolygonJoin(points: DataFrame, polys: DataFrame,
                         xCol: String, yCol: String, ringCol: String,
                         cellSize: Double): DataFrame = {
    graft.functions.PointInRing.register(points.sparkSession)
    val cells = polys
      .withColumn("__cx", explode(sequence(
        floor(array_min(even(col(ringCol))) / cellSize).cast("long"),
        floor(array_max(even(col(ringCol))) / cellSize).cast("long"))))
      .withColumn("__cy", explode(sequence(
        floor(array_min(odd(col(ringCol))) / cellSize).cast("long"),
        floor(array_max(odd(col(ringCol))) / cellSize).cast("long"))))
    val pts = points
      .withColumn("__cx", floor(col(xCol) / cellSize).cast("long"))
      .withColumn("__cy", floor(col(yCol) / cellSize).cast("long"))
    pts.join(broadcast(cells), Seq("__cx", "__cy"))
      .filter(call_function("point_in_ring", col(xCol), col(yCol), col(ringCol)))
      .drop("__cx", "__cy")
  }
}
