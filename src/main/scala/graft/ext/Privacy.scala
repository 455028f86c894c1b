package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk profiling — the governance gate a dataset passes before
  * release/training (Sweeney 2002 k-anonymity, Machanavajjhala 2007
  * l-diversity). Everything here is exact integer counting over one
  * equivalence-class aggregate: no sampling, no noise, engine-replicable.
  */
object Privacy {

  /** k-anonymity / l-diversity profile over the quasi-identifier columns:
    * group rows into equivalence classes (identical quasi-identifier
    * tuples) and report the re-identification surface —
    *
    *   - `n_classes`, `n_rows`, `min_class_size` (worst-case k),
    *   - `n_rows_below_k` / `pct_rows_below_k`: mass in classes smaller
    *     than `k` (the rows a k-anonymity release would suppress),
    *   - `min_l_diversity`: the smallest number of distinct sensitive
    *     values in any class (attribute-disclosure worst case).
    *
    * Scale shape: ONE keyed aggregate over the quasi-identifier (count +
    * one distinct count per class — the distinct runs inside the same
    * shuffle), then a tiny class-table rollup. The class table is
    * #classes rows — inspect it directly via `classes = true`.
    */
  def kAnonymityProfile(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be positive")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_sz"),
        count_distinct(col(sensitiveCol)).as("_l"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("_sz")).as("n_rows"),
      min(col("_sz")).as("min_class_size"),
      coalesce(sum(when(col("_sz") < k, col("_sz"))), lit(0L))
        .as("n_rows_below_k"),
      min(col("_l")).as("min_l_diversity"))
      .select(col("n_classes"), col("n_rows"), col("min_class_size"),
        col("n_rows_below_k"),
        round(col("n_rows_below_k").cast("double") / col("n_rows"), 4)
          .as("pct_rows_below_k"),
        col("min_l_diversity"))
  }

  /** Differentially-private histogram release: per-key counts with Laplace
    * noise at sensitivity 1 (each row contributes to ONE key), scale
    * b = 10/epsilonX10 — i.e. `epsilonX10 = 10` is ε = 1. The "randomness"
    * is the house md5-uniform (48 bits of `md5(salt:key)` → u ∈ [0,1)), so
    * the release is reproducible and engine-replicable while keeping the
    * DP shape: noise = −b·sgn(u−½)·ln(1−2|u−½|) (inverse-CDF Laplace).
    * For a real adversarial release swap the seed for entropy; the
    * pipeline mechanics (one keyed count, per-key constant-time noise, no
    * true count in the output) are exactly these.
    *
    * Scale shape: one map-side-combinable count per key + a narrow per-key
    * expression. Output: key, noisy_n (rounded to a long, floored at 0).
    */
  def dpNoisyCounts(df: DataFrame, keyCol: String, epsilonX10: Int,
      salt: String = "dp"): DataFrame = {
    require(epsilonX10 >= 1, "epsilonX10 must be >= 1")
    val b = 10.0 / epsilonX10
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val u = conv(substring(md5(concat_ws(":", lit(salt), col("key"))), 1, 12),
      16, 10).cast("double") / lit(281474976710656.0) // 2^48
    val centered = u - lit(0.5)
    val lnArg = greatest(lit(1.0) - lit(2.0) * abs(centered),
      lit(3.552713678800501e-15)) // 2^-48: ln stays finite at u = 0.5
    val noise = -lit(b) * signum(centered) * log(lnArg)
    counts.select(col("key").as(keyCol),
      greatest(round(col("n") + noise, 0).cast("long"), lit(0L))
        .as("noisy_n"))
  }

  /** DuckDB replay of [[dpNoisyCounts]]. */
  def dpNoisyCountsOracleSql(table: String, keyCol: String,
      epsilonX10: Int, salt: String = "dp"): String = {
    val b = s"(10.0 / $epsilonX10)"
    s"""WITH c AS (SELECT $keyCol AS key, count(*)::BIGINT AS n
       |  FROM $table GROUP BY 1),
       |u AS (SELECT key, n,
       |    CAST(concat('0x', substring(md5(concat('$salt', ':', key)), 1, 12))
       |      AS BIGINT)::DOUBLE / 281474976710656.0 - 0.5 AS ctr
       |  FROM c)
       |SELECT key AS $keyCol,
       |  greatest(CAST(round(n + (-$b * sign(ctr) *
       |    ln(greatest(1.0 - 2.0 * abs(ctr), 3.552713678800501e-15))), 0)
       |    AS BIGINT), 0) AS noisy_n
       |FROM u ORDER BY 1""".stripMargin
  }
}
