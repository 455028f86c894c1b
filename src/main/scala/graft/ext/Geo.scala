package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar proximity join over coordinate columns — the geo workhorse
  * (store-to-customer assignment, POI matching, spatial dedup) expressed
  * without a spatial index AND without trigonometry in the plan.
  *
  * Coordinates quantize to integer micro-degrees; the candidate stage is
  * the classic uniform-grid join (cell width = radius: each RIGHT point
  * replicates into its 3×3 cell neighborhood, each LEFT point sits in
  * exactly ONE cell, so every candidate pair arises exactly once — no
  * distinct pass). Pass the SMALLER frame as `right`: the 9× replication
  * belongs on the small side, the big side flows through unexpanded.
  * The verify stage is the exact integer squared distance
  * Δlat² + Δlon² ≤ r² in micro-degrees. That is the flat-earth (small
  * radius) metric — the honest contract for sub-degree radii; for
  * longitude-compressed accuracy scale `lonCol` by cos(lat₀) UPSTREAM
  * with a driver constant, keeping the plan transcendental-free.
  *
  * Scale shape: keyed equi-join on the cell pair; fan-out is a fixed 9
  * cells per left row; candidates per cell scale with point density, not
  * table size — the [[RangeJoin.pointInInterval]] story in 2-D.
  */
object Geo {

  private def q(c: org.apache.spark.sql.Column) =
    round(c.cast("double") * 1e6, 0).cast("long")

  def proximityJoin(
      left: DataFrame, right: DataFrame,
      latL: String, lonL: String, latR: String, lonR: String,
      radiusMicroDeg: Long
  ): DataFrame = {
    require(radiusMicroDeg > 0, "radius must be positive")
    val w = radiusMicroDeg
    val l = left
      .withColumn("_qlat_l", q(col(latL)))
      .withColumn("_qlon_l", q(col(lonL)))
      .withColumn("_cell_lat", RangeJoin.floorDiv(col("_qlat_l"), w))
      .withColumn("_cell_lon", RangeJoin.floorDiv(col("_qlon_l"), w))
    val r = right
      .withColumn("_qlat_r", q(col(latR)))
      .withColumn("_qlon_r", q(col(lonR)))
      .withColumn("_dc", explode(lit(Array(-1, 0, 1))))
      .withColumn("_dr", explode(lit(Array(-1, 0, 1))))
      .withColumn("_cell_lat",
        RangeJoin.floorDiv(col("_qlat_r"), w) + col("_dc"))
      .withColumn("_cell_lon",
        RangeJoin.floorDiv(col("_qlon_r"), w) + col("_dr"))
      .drop("_dc", "_dr")
    val dLat = col("_qlat_l") - col("_qlat_r")
    val dLon = col("_qlon_l") - col("_qlon_r")
    l.join(r, Seq("_cell_lat", "_cell_lon"))
      .where(dLat * dLat + dLon * dLon <= w * w)
      .withColumn("dist_q", dLat * dLat + dLon * dLon)
      .drop("_cell_lat", "_cell_lon", "_qlat_l", "_qlon_l", "_qlat_r", "_qlon_r")
  }
}
