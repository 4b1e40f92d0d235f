package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic helpers — the reference computes start↔end great-circle
  * distances per GPS track (`geosphere::distGeo`,
  * `/root/reference/R/preprocess-pds-trips.R:127-131`) and grid bins
  * (`findInterval`, `R/ingest-pds-data.R:389-400`).
  *
  * Haversine is composed entirely from built-in column functions, so it
  * stays inside whole-stage codegen — no UDF, no codegen fallback. (It
  * differs from distGeo's ellipsoid by ≲0.3%; the reference's
  * validators tolerance-check km-scale thresholds, so the spherical
  * model is documented as the engine's semantics.)
  */
object Geo {
  /** Mean-earth radius, km (IUGG). */
  val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between (lat1,lng1) and (lat2,lng2),
    * degrees in, haversine formula. */
  def haversineKm(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val dLat = radians(lat2 - lat1) / lit(2.0)
    val dLng = radians(lng2 - lng1) / lit(2.0)
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLng) * sin(dLng)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** `findInterval`-style regular grid bin: 1-based index of x in
    * [origin, origin+step, ...) (`R/ingest-pds-data.R:389-400`). */
  def gridBin(x: Column, origin: Double, step: Double): Column =
    floor((x - lit(origin)) / lit(step)).cast("long") + lit(1L)

  /** Degrees → integer grid cell in [0, 2^bits): floor-scaled over
    * [lo, hi), clamped at both edges. */
  def gridCell(x: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1L << bits
    least(greatest(
      floor((x - lit(lo)) / lit(hi - lo) * lit(n.toDouble)).cast("long"),
      lit(0L)), lit(n - 1))
  }

  /** Z-order (Morton) key: interleaves the low `bits` bits of gx (odd
    * positions) and gy (even positions). Sorting/partitioning data by
    * this key clusters 2-D-adjacent rows into contiguous key ranges, so
    * parquet min/max zone maps prune 2-D range predicates — the write-
    * layout lever for 100 TB geo scans. Composed from shift/and/sum
    * column arithmetic: stays in whole-stage codegen, no UDF. */
  def zorderKey(gx: Column, gy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(gx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
        (shiftright(gy, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)
}
