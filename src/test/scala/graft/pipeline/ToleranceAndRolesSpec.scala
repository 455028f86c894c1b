package graft.pipeline

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.functions._

class TolereanceSpec extends SparkSpec {

  test("tolerated transform failures null outputs and land on the error channel") {
    import spark.implicits._
    val df = Seq(("1", "a"), ("oops", "b"), ("3", "c")).toDF("num", "tag")
    val schema = GraphSchema(Seq(VertexDef("v",
      Seq(FieldDef("n"), FieldDef("tag")), Identity.Natural(Seq("tag")))))
    val res = ResourceDef("r", Seq(
      TransformStep(fn = "try_int", input = Seq("num"), output = Seq("n"),
        errorTolerant = true, label = "parse_n"),
      VertexStep("v")))
    val out = PipelineCompiler.compile(schema, res, df)
    // all three rows keep flowing; the bad one has a null output
    assert(out.vertex("v").count() == 3)
    assert(out.vertex("v").where(col("n").isNull).count() == 1)
    val errs = out.errors("r").collect()
    assert(errs.length == 1)
    val e = errs.head
    assert(e.getAs[String]("label") == "parse_n")
    assert(e.getAs[String]("input_value") == "oops")
  }

  test("max_doc_errors budget aborts the resource when exceeded") {
    import spark.implicits._
    val df = Seq(("x", "a"), ("y", "b")).toDF("num", "tag")
    val schema = GraphSchema(Seq(VertexDef("v", Seq(FieldDef("n"), FieldDef("tag")),
      Identity.Natural(Seq("tag")))))
    val res = ResourceDef("r", Seq(
      TransformStep(fn = "try_int", input = Seq("num"), output = Seq("n"),
        errorTolerant = true),
      VertexStep("v")), maxDocErrors = Some(1L))
    intercept[IllegalStateException] {
      PipelineCompiler.compile(schema, res, df)
    }
  }
}

class RolesSpec extends SparkSpec {

  test("role slots: two same-type vertices per row (buyer/seller) + role-routed edge") {
    import spark.implicits._
    // trade rows: buyer and seller are both 'account' vertices
    val df = Seq((1L, 100L, 200L), (2L, 100L, 300L)).toDF("trade_id", "buyer", "seller")
    val schema = GraphSchema(
      vertices = Seq(VertexDef("account", Nil, Identity.Natural(Seq("acct")))),
      edges = Seq(EdgeDef("account", "account", "traded_with")))
    val res = ResourceDef("r", Seq(
      VertexStep("account", from = Map("acct" -> "buyer"),
        extractionScope = "mapped_only", role = Some("buyer")),
      VertexStep("account", from = Map("acct" -> "seller"),
        extractionScope = "mapped_only", role = Some("seller")),
      EdgeStep(sourceRole = Some("buyer"), targetRole = Some("seller"),
        relation = "traded_with")), inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    // merged account vertices: 100, 200, 300
    assert(out.vertex("account").count() == 3)
    val edges = out.edge(EdgeKey("account", "account", "traded_with"))
      .select("src_acct", "dst_acct").as[(Long, Long)].collect().toSet
    assert(edges == Set((100L, 200L), (100L, 300L)))
  }

  test("dynamic edge types from router slots (objects-relations fixture shape)") {
    import spark.implicits._
    val df = Seq(
      ("p1", "person", "c1", "company", "works_at"),
      ("c1", "company", "c2", "company", "owns"))
      .toDF("src_id", "src_type", "dst_id", "dst_type", "rel")
    val schema = GraphSchema(
      vertices = Seq(
        VertexDef("person", Nil, Identity.Natural(Seq("id"))),
        VertexDef("company", Nil, Identity.Natural(Seq("id")))),
      edges = Seq(
        EdgeDef("person", "company", "works_at"),
        EdgeDef("company", "company", "owns")))
    val res = ResourceDef("r", Seq(
      VertexRouterStep(typeField = "src_type", role = Some("src_slot"),
        perTypeFrom = Map("person" -> Map("id" -> "src_id"),
          "company" -> Map("id" -> "src_id"))),
      VertexRouterStep(typeField = "dst_type", role = Some("dst_slot"),
        perTypeFrom = Map("person" -> Map("id" -> "dst_id"),
          "company" -> Map("id" -> "dst_id"))),
      EdgeStep(sourceRole = Some("src_slot"), targetRole = Some("dst_slot"),
        relationField = Some("rel"))), inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.edge(EdgeKey("person", "company", "works_at")).count() == 1)
    assert(out.edge(EdgeKey("company", "company", "owns")).count() == 1)
    // no cross-contamination: p1 never linked via 'owns'
    assert(out.edges.values.map(_.count()).sum == 2)
  }
}
