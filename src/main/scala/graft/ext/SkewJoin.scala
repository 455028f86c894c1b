package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's skew
  * handling isn't available (e.g. a deliberately partitioned write, or a
  * stateful stage AQE can't re-plan).
  *
  * The hot side gets a random salt in [0, saltFactor); the other side is
  * replicated once per salt value; the join key becomes (key, salt), so one
  * hot key spreads over `saltFactor` reducers. Replication cost is
  * `saltFactor ×` the small side — use only when a profile shows a hot key,
  * and keep the replicated side the smaller one.
  */
object SkewJoin {

  /** Join `skewed` (large, hot-keyed) with `other` (replicated) on `keys`.
    * Join types where unmatched REPLICATED-side rows survive (right/full
    * outer) are rejected: each unmatched row would appear saltFactor times.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left-side joins only: unmatched replicated " +
        s"rows would be duplicated saltFactor times under '$joinType'")
    val saltCol = "__graft_salt"
    require(!skewed.columns.contains(saltCol) && !other.columns.contains(saltCol),
      s"inputs must not already contain a '$saltCol' column")
    val salted = skewed.withColumn(saltCol,
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = other.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Top key frequencies — the profiling step that decides whether salting
    * is warranted (and what factor to use).
    */
  def keySkew(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc +: keys.map(col(_).asc): _*) // tie-break: stable topN
      .limit(topN)
}
