package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Join `skewed` (large, hot-keyed) with `other` (replicated) on `keys`. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = skewed.withColumn("_salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Top key frequencies — the profiling step that decides whether salting
    * is warranted (and what factor to use).
    */
  def keySkew(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
