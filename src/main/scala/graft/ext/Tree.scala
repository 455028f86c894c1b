package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram-based decision-split finding — the inner kernel of every
  * distributed gradient-boosting / decision-tree trainer (XGBoost
  * `hist`, LightGBM): bin each feature into equi-width histograms of
  * (count, positives), then score every bin boundary as a candidate
  * split by weighted Gini impurity and keep the argmin per feature.
  *
  * Everything after the one melt pass is exact integers: bin counts are
  * longs, the cumulative left/right class counts come from ONE keyed
  * window over ≤ nBins rows per feature, and each candidate's weighted
  * impurity quantizes to micro-units (one fixed-shape double expression
  * over six exact integers) BEFORE the struct-min argmin — so any engine
  * replays the chosen splits bit-for-bit.
  *
  * Scale shape: one melt scan (rows × n_features long format — the
  * histogram method's standard cost), a tiny per-feature stats aggregate
  * broadcast back, one map-side-combinable (feature, bin) count, and
  * windows/argmins over n_features × nBins rows. No per-candidate data
  * passes — the histogram IS the sufficient statistic, which is the
  * whole point of the method.
  */
object Tree {

  def bestSplits(df: DataFrame, featureCols: Seq[String], labelExpr: Column,
      nBins: Int = 16): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(nBins >= 2, "need at least two bins")
    val melted = df.select(
      labelExpr.cast("long").as("_y"),
      explode(array(featureCols.map(c =>
        struct(lit(c).as("f"), col(c).cast("double").as("v"))): _*)).as("_fv"))
      .select(col("_y"), col("_fv.f").as("_f"), col("_fv.v").as("_v"))
      .where(col("_v").isNotNull && col("_y").isNotNull)
    val stats = melted.groupBy("_f")
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
    val w = (col("_mx") - col("_mn")) / nBins
    val bin = when(col("_mx") === col("_mn"), 0L)
      .otherwise(least(floor((col("_v") - col("_mn")) / w), lit(nBins - 1L)))
    val hist = melted.join(broadcast(stats), Seq("_f"))
      .withColumn("_bin", bin.cast("int"))
      .groupBy("_f", "_bin")
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_pos"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_f")).orderBy(col("_bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("_f"))
    val cum = hist
      .withColumn("_nl", sum(col("_n")).over(win))
      .withColumn("_pl", sum(col("_pos")).over(win))
      .withColumn("_nt", sum(col("_n")).over(tot))
      .withColumn("_pt", sum(col("_pos")).over(tot))
      // a split AFTER the last bin sends everything left — not a split
      .where(col("_nl") < col("_nt"))
    // weighted Gini of the (left, right) partition, micro-unit quantized:
    // G = nl/n·(1 − (pl/nl)² − (ql/nl)²) + nr/n·(…)
    def gini(n: Column, p: Column) = {
      val q = n - p
      lit(1.0) - (p.cast("double") / n) * (p.cast("double") / n) -
        (q.cast("double") / n) * (q.cast("double") / n)
    }
    val nr = col("_nt") - col("_nl")
    val pr = col("_pt") - col("_pl")
    val weighted =
      (col("_nl").cast("double") / col("_nt")) * gini(col("_nl"), col("_pl")) +
        (nr.cast("double") / col("_nt")) * gini(nr, pr)
    val scored = cum.withColumn("_g_q", round(weighted * 1e6, 0).cast("long"))
    scored
      .groupBy(col("_f"))
      .agg(min(struct(col("_g_q").as("g"), col("_bin").as("b"))).as("_best"),
        first(col("_nt")).as("n_rows"))
      .join(broadcast(stats), Seq("_f"))
      .select(col("_f").as("feature"),
        col("_best.b").as("split_bin"),
        round(col("_mn") + (col("_best.b") + 1).cast("double") *
          ((col("_mx") - col("_mn")) / nBins), 4).as("split_value"),
        round(col("_best.g").cast("double") / 1e6, 4).as("weighted_gini"),
        col("n_rows"))
  }
}
