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
}
