package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native DotProduct expression vs the HOF composition: bit-identical
  * results (same summation order), null semantics, codegen + interpreted
  * paths.
  */
class VectorExprSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches the HOF composition bit-for-bit on random float arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("native", VectorExpr.dotProduct(col("a"), col("b")))
      .withColumn("hof", hofDot(col("a"), col("b")))
    assert(df.where(col("native") =!= col("hof")).count() == 0)
    // also exercise the interpreted path (codegen off)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.where(col("native") =!= col("hof")).count() == 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null on length mismatch, null element, null array; int arrays work") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0), Array(3.0, 4.0, 5.0)),   // length mismatch
      (Array(1.0, 2.0), Array(3.0, 4.0))         // ok → 11.0
    ).toDF("a", "b")
      .withColumn("d", VectorExpr.dotProduct(col("a"), col("b")))
    val got = df.select("d").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, Some(11.0)))

    val withNullElem = Seq(1).toDF("x")
      .select(VectorExpr.dotProduct(
        array(lit(1.0), lit(null).cast("double")), array(lit(2.0), lit(3.0))).as("d"))
    assert(withNullElem.collect().head.isNullAt(0))

    val ints = Seq((Array(1, 2, 3), Array(4L, 5L, 6L))).toDF("a", "b")
      .select(VectorExpr.dotProduct(col("a"), col("b")).as("d"))
    assert(ints.collect().head.getDouble(0) == 32.0)
  }
}
