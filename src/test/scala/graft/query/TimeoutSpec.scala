package graft.query

import graft.SparkSpec
import graft.model._
import graft.expr.FilterExpr

/** Query-timeout cap (reference HARD_CAPS 30 s timeout, caps.py:30-92):
  * an over-budget traversal's Spark jobs are cancelled and surface as
  * [[QueryTimeoutException]]; the session stays usable afterwards.
  */
class TimeoutSpec extends SparkSpec {

  test("over-budget traversal aborts with QueryTimeoutException") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val schema = GraphSchema(
      Seq(VertexDef("a", Nil, Identity.Natural(Seq("id"))),
        VertexDef("b", Nil, Identity.Natural(Seq("id")))),
      Seq(EdgeDef("a", "b", "to")))
    val slow = udf { (x: Long) => Thread.sleep(200L); x }
    val anchors = Seq(1L).toDF("id")
    // an edge frame whose scan crawls: 64 rows × 200 ms on 4 local cores
    // ≈ 3.2 s ≫ the 1 s cap
    val edges = spark.range(64)
      .select(lit(1L).as("src_id"), slow(col("id")).as("dst_id"))
    val reader = new GraphReader(schema,
      n => if (n == "a") anchors else anchors.withColumnRenamed("id", "id"),
      k => Some(edges), QueryCaps(timeoutSeconds = 1))
    intercept[QueryTimeoutException] {
      reader.neighbors(NeighborQuery("a", FilterExpr.eq("id", 1L), hops = 1))
    }
    // session not poisoned: a fresh action on a new job group still works
    assert(spark.range(10).count() == 10L)
  }

  test("timeoutSeconds <= 0 disables enforcement") {
    import spark.implicits._
    val schema = GraphSchema(
      Seq(VertexDef("a", Nil, Identity.Natural(Seq("id")))), Nil)
    val reader = new GraphReader(schema, _ => Seq(1L).toDF("id"), _ => None,
      QueryCaps(timeoutSeconds = 0))
    val out = reader.neighbors(NeighborQuery("a", FilterExpr.eq("id", 1L), hops = 1))
    // the walk completed without a timer — no edges declared, and the
    // anchor itself is never part of the result container
    assert(out.vertices("a").count() == 0)
    assert(out.edges.isEmpty)
  }
}
