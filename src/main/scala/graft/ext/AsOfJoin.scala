package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the latest right row with the
  * same key whose timestamp is <= the left timestamp (direction "backward";
  * "forward" = earliest right row >= left). Ties at equal timestamps match
  * in both directions.
  *
  * Spark-first realization: NOT a range join (an inequality join degrades to
  * broadcast-nested-loop or a skew-prone range partitioning). Instead the
  * classic union + ordered forward-fill:
  *   1. tag both sides, union on the key + timestamp columns;
  *   2. one window per key, ordered by ts (asc for backward, desc for
  *      forward) with right rows sorting before left at equal ts, carries
  *      the most recent right payload forward (`last(_, ignoreNulls)`);
  *   3. keep left rows, attach the carried payload.
  * One shuffle on the key — the same cost as a plain equi-join — and the
  * within-key sort is what any as-of must pay. Hot keys behave like any
  * windowed aggregation (AQE/salting apply).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      tolerance: Option[Long] = None // max |left.ts - right.ts| (epoch units)
  ): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"direction must be backward|forward, got '$direction'")
    val rightPayload = right.columns.filterNot(c => keyCols.contains(c) || c == rightTs)
    require(rightPayload.intersect(left.columns).isEmpty,
      s"right payload columns collide with left: ${rightPayload.intersect(left.columns).mkString(",")}")
    val reserved = Seq("_ts", "_side", "_rts") ++ rightPayload.map(c => s"__f_$c")
    val clash = (left.columns ++ right.columns).distinct.intersect(reserved)
    require(clash.isEmpty,
      s"inputs must not contain the reserved working columns: ${clash.mkString(",")}")

    // _side: right = 0 sorts before left = 1 at equal ts (equal-ts rows match)
    val l = left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .withColumn("_rts", lit(null).cast("long"))
    // equi-join semantics: NULL keys never match — but a window PARTITION BY
    // groups nulls together, so null-keyed right rows must be dropped here
    // (null-keyed left rows then sit in their own partition → null payload)
    val rightNonNullKeys = keyCols.map(col(_).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val r = right.where(rightNonNullKeys)
      .select((keyCols.map(col) :+ col(rightTs).as("_ts")) ++
        rightPayload.map(col): _*)
      .withColumn("_side", lit(0))
      .withColumn("_rts", col("_ts").cast("long"))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val tsOrd = if (direction == "backward") col("_ts").asc else col("_ts").desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrd, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val fillCols = rightPayload :+ "_rts"
    val filled = fillCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(w))
    }
    val leftOnly = filled.where(col("_side") === 1)
    val withTol = tolerance match {
      case Some(tol) =>
        val ok = col("__f__rts").isNotNull &&
          abs(col("_ts").cast("long") - col("__f__rts")) <= tol
        rightPayload.foldLeft(leftOnly) { (d, c) =>
          d.withColumn(s"__f_$c", when(ok, col(s"__f_$c")))
        }
      case None => leftOnly
    }
    withTol.select(left.columns.map(col) ++
      rightPayload.map(c => col(s"__f_$c").as(c)): _*)
  }
}
