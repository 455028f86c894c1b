package graft.infer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dependency discovery over raw tables — the profiling substrate under the
  * reference's relational schema inference (graflo/db/postgres/
  * schema_inference.py:25-400 infers keys/FKs from live catalogs; these
  * operators MEASURE the same structures from the data itself, for sources
  * with no catalog: parquet drops, CSV dumps, API pulls).
  *
  * Both operators are exact and deterministic:
  *
  *  - [[functionalDeps]]: does column A determine column B? Reported with
  *    the g3 error measure (minimum number of rows to delete for the FD to
  *    hold exactly — Kivinen & Mannila 1995), so "almost-FDs" (entry bugs,
  *    CDC stragglers) are distinguishable from structural non-FDs.
  *  - [[inclusionDep]]: is child column ⊆ parent column (the FK candidate
  *    signal)? Reported as exact distinct containment.
  *
  * Scale shape: every step is a keyed aggregate or keyed anti-join with
  * map-side partials — per-pair cost is O(distinct pairs), never O(rows²),
  * and nothing is collected to the driver. At 100 TB the FD scan's shuffle
  * carries one row per distinct (A,B) combination; the IND scan one row per
  * distinct value per side.
  */
object Dependencies {

  /** Exact FD check for each candidate (determinant → dependent) pair over
    * one table. Output per pair: distinct LHS values, distinct (LHS, RHS)
    * combinations, total rows, the g3 violation count (rows outside each
    * LHS group's majority RHS), and whether the FD holds exactly.
    *
    * NULL is treated as an ordinary value on both sides (groupBy
    * semantics) — matching the oracle's GROUP BY, not COUNT(DISTINCT).
    */
  def functionalDeps(df: DataFrame, candidates: Seq[(String, String)]): DataFrame =
    candidates.map { case (det, dep) =>
      // (A,B)-keyed counts: partial-agg friendly, one shuffle on the pair
      val pairCounts = df.groupBy(col(det).as("_lhs"), col(dep).as("_rhs"))
        .agg(count(lit(1)).as("_n"))
      // per-LHS rollup: how many RHS variants, how many rows, majority size
      val perLhs = pairCounts.groupBy("_lhs")
        .agg(count(lit(1)).as("_ndep"), sum("_n").as("_rows"), max("_n").as("_keep"))
      perLhs.agg(
        count(lit(1)).as("distinct_lhs"),
        sum("_ndep").as("distinct_pairs"),
        sum("_rows").as("n_rows"),
        sum(col("_rows") - col("_keep")).as("g3_violations"))
        .select(
          lit(det).as("determinant"), lit(dep).as("dependent"),
          col("distinct_lhs"), col("distinct_pairs"), col("n_rows"),
          col("g3_violations"),
          (col("distinct_pairs") === col("distinct_lhs")).as("holds"))
    }.reduce(_ unionByName _)

  /** Exact inclusion dependency (FK candidate) check: what fraction of the
    * child column's distinct values appear in the parent column? Values are
    * compared as longs (integral key columns of mixed physical widths);
    * NULLs are excluded on both sides (a NULL FK is absent, not violating).
    * `containment` is exact integers to one final divide.
    */
  def inclusionDep(child: DataFrame, childCol: String, childName: String,
      parent: DataFrame, parentCol: String, parentName: String): DataFrame = {
    val c = child.select(col(childCol).cast("long").as("_v"))
      .where(col("_v").isNotNull).distinct()
    val p = parent.select(col(parentCol).cast("long").as("_v"))
      .where(col("_v").isNotNull).distinct()
    val missing = c.join(p, Seq("_v"), "left_anti")
    c.agg(count(lit(1)).as("child_distinct"))
      .crossJoin(missing.agg(count(lit(1)).as("_missing")))
      .select(
        lit(s"$childName.$childCol").as("child"),
        lit(s"$parentName.$parentCol").as("parent"),
        col("child_distinct"),
        (col("child_distinct") - col("_missing")).as("contained"),
        round((col("child_distinct") - col("_missing")) /
          col("child_distinct"), 6).as("containment"))
  }

  /** Batch IND check over labelled (childDf, childCol, childName, parentDf,
    * parentCol, parentName) candidates — one output row each.
    */
  def inclusionDeps(candidates: Seq[(DataFrame, String, String, DataFrame, String, String)]): DataFrame =
    candidates.map { case (cdf, cc, cn, pdf, pc, pn) =>
      inclusionDep(cdf, cc, cn, pdf, pc, pn)
    }.reduce(_ unionByName _)
}
