package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model._
import graft.pipeline.{PipelineCompiler, ResourceDef, VertexStep}

/** SQL surface over the property graph: registerViews + spark.sql joins. */
class GraphViewsSpec extends SparkSpec {

  test("registerViews exposes vertex and edge collections to spark.sql") {
    import spark.implicits._
    val schema = GraphSchema(
      vertices = Seq(
        VertexDef("person", Seq(FieldDef("name")), Identity.Natural(Seq("pid"))),
        VertexDef("city", Seq(FieldDef("cname")), Identity.Natural(Seq("cid")))),
      edges = Seq(EdgeDef("person", "city", "lives_in")))
    val input = Seq((1L, "ada", 10L, "paris"), (2L, "bo", 10L, "paris"),
      (3L, "cy", 20L, "oslo"))
      .toDF("pid", "name", "cid", "cname")
    val res = ResourceDef("people", Seq(
      VertexStep("person"), VertexStep("city")))
    val g = PipelineCompiler.compile(schema, res, input)
    g.registerViews("t_")
    val out = spark.sql(
      """SELECT c.cname, count(*) AS n FROM t_person p
        |JOIN t_person__lives_in__city e ON e.src_pid = p.pid
        |JOIN t_city c ON c.cid = e.dst_cid
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("oslo", 1L), ("paris", 2L)))
  }
}
