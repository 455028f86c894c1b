package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested loop.
  *
  * A raw `p BETWEEN s AND e` join has no equi-key and degrades to
  * broadcast-nested-loop. The scale path buckets the numeric axis with a
  * fixed width: every interval explodes to the buckets it covers (bounded
  * fan-out ≈ maxIntervalWidth / bucketWidth + 1), every point maps to
  * exactly ONE bucket, and the join becomes a keyed equi-join on
  * (bucket [, extra keys]) with the BETWEEN predicate as a residual filter.
  * A (point, interval) pair can only meet in the point's own bucket, so no
  * dedup is needed.
  *
  * Pick `bucketWidth` ≈ the typical interval width: too small multiplies
  * the interval fan-out, too large widens the candidate set per bucket.
  */
object RangeJoin {

  /** `points` (with numeric `ptCol`) ⋈ `intervals` (numeric `startCol`,
    * `endCol`, inclusive ends): all pairs with start <= pt <= end, matching
    * on `extraKeys` first when given.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      extraKeys: Seq[String] = Nil
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(ptCol).cast("double") / bucketWidth).cast("bigint"))
    val iv = intervals.withColumn("__bucket", explode(sequence(
      floor(col(startCol).cast("double") / bucketWidth).cast("bigint"),
      floor(col(endCol).cast("double") / bucketWidth).cast("bigint"))))
    p.join(iv, Seq("__bucket") ++ extraKeys)
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}
