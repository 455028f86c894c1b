package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-sensitive document merge — the reference's `merge_doc_basis`
  * (graflo/architecture/graph_types/merge.py:30-158):
  *
  *  - group docs by identity-key tuple; later docs' present fields overwrite
  *    earlier ones (absent fields keep the earlier value);
  *  - keyless docs fold into the nearest *preceding* keyed doc.
  *
  * Spark realization: "present" = non-null, "later" = larger `orderCol`.
  * Last-non-null-wins per column is `max(when(col.isNotNull,
  * struct(order, col)))["v"]` — a lexicographic struct max, fully inside
  * whole-stage codegen (no UDAF, unlike a literal Aggregator port which
  * would break codegen and force per-row serialization at 100 TB).
  */
object MergeOps {

  /** Fold keyless rows into the nearest preceding keyed row within a scope
    * (reference merge.py:96-158): forward-fill the key columns over
    * `orderCol` within `scopeCol` (the source row / document id).
    */
  def attachKeyless(
      df: DataFrame,
      keyCols: Seq[String],
      scopeCol: String,
      orderCol: String
  ): DataFrame = {
    val w = Window.partitionBy(scopeCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyCols.foldLeft(df) { (d, k) =>
      d.withColumn(k, last(col(k), ignoreNulls = true).over(w))
    }
  }

  /** Merge rows sharing the identity tuple, later-wins per field.
    * Rows with an entirely-null key tuple are kept as-is only if
    * `keepUnkeyed`; the reference drops them before write
    * (`_drop_unkeyed_docs`, graflo/hq/db_writer.py:206-238).
    */
  def mergeDocBasis(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      keepUnkeyed: Boolean = false,
      /** when set, the merged row keeps its FIRST occurrence order (the
        * reference's merge preserves first-occurrence list order,
        * merge.py:57-63) under this column name — the writer-plane
        * blank-edge zip (db_writer.py:314-349) needs emission order.
        */
      keepOrderAs: Option[String] = None
  ): DataFrame = {
    val valueCols = df.columns.filterNot(c => keyCols.contains(c) || c == orderCol)
    val keyed = if (keepUnkeyed) df
      else df.where(keyCols.map(col(_).isNotNull).reduceLeft(_ || _))
    // identity-only frames: the order column must not leak into the
    // result (it reached stored documents via GraphStore.write before the
    // actor-parity fixtures caught it)
    if (valueCols.isEmpty) keepOrderAs match {
      case None => keyed.dropDuplicates(keyCols).drop(orderCol)
      case Some(oc) => keyed.groupBy(keyCols.map(col): _*)
        .agg(min(col(orderCol)).as(oc))
    }
    else {
      val aggs = valueCols.map { c =>
        max(when(col(c).isNotNull, struct(col(orderCol).as("o"), col(c).as("v"))))
          .getField("v").as(c)
      } ++ keepOrderAs.map(oc => min(col(orderCol)).as(oc))
      keyed.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Content-hash distinct — the reference's `pick_unique_dict`
    * (graflo/util/transform.py:380-446). Spark's `dropDuplicates` matches the
    * normalized semantics (NaN == NaN in dropDuplicates, mirroring the
    * reference's NaN normalization).
    */
  def pickUnique(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols)
}
