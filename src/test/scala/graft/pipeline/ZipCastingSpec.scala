package graft.pipeline

import graft.SparkSpec
import graft.model._

/** Positional-zip edge casting (reference db_writer.py:314-349): the i-th
  * source observation pairs with the i-th target observation across
  * PARALLEL sibling arrays, where prefix congruence would render a
  * document-scoped product.
  */
class ZipCastingSpec extends SparkSpec {

  test("zip pairs parallel sibling arrays element-by-element") {
    import spark.implicits._
    val df = Seq(
      (10L, Seq(1L, 2L, 3L), Seq(101L, 102L, 103L)),
      (20L, Seq(4L), Seq(104L))
    ).toDF("doc", "a_ids", "b_ids")
    val schema = GraphSchema(
      vertices = Seq(
        VertexDef("a", Nil, Identity.Natural(Seq("a_id"))),
        VertexDef("b", Nil, Identity.Natural(Seq("b_id")))),
      edges = Seq(EdgeDef("a", "b", "parallel")))
    val res = ResourceDef("r", Seq(
      Descend(Some("a_ids"), steps = Seq(
        VertexStep("a", from = Map("a_id" -> "_value"), lookupOnly = true))),
      Descend(Some("b_ids"), steps = Seq(
        VertexStep("b", from = Map("b_id" -> "_value"), lookupOnly = true))),
      EdgeStep(source = "a", target = "b", relation = "parallel", casting = "zip")
    ), inferEdges = false)
    val g = PipelineCompiler.compile(schema, res, df)
    val got = g.edge(EdgeKey("a", "b", "parallel"))
      .select("src_a_id", "dst_b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L)))
  }

  test("zip with unequal lengths pairs only the common prefix") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L, 3L), Seq(101L))).toDF("doc", "a_ids", "b_ids")
    val schema = GraphSchema(
      vertices = Seq(
        VertexDef("a", Nil, Identity.Natural(Seq("a_id"))),
        VertexDef("b", Nil, Identity.Natural(Seq("b_id")))),
      edges = Seq(EdgeDef("a", "b", "parallel")))
    val res = ResourceDef("r", Seq(
      Descend(Some("a_ids"), steps = Seq(
        VertexStep("a", from = Map("a_id" -> "_value"), lookupOnly = true))),
      Descend(Some("b_ids"), steps = Seq(
        VertexStep("b", from = Map("b_id" -> "_value"), lookupOnly = true))),
      EdgeStep(source = "a", target = "b", relation = "parallel", casting = "zip")
    ), inferEdges = false)
    val g = PipelineCompiler.compile(schema, res, df)
    val got = g.edge(EdgeKey("a", "b", "parallel"))
      .select("src_a_id", "dst_b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 101L)))
  }

  test("default prefix casting on the same shape renders a product") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L), Seq(101L, 102L))).toDF("doc", "a_ids", "b_ids")
    val schema = GraphSchema(
      vertices = Seq(
        VertexDef("a", Nil, Identity.Natural(Seq("a_id"))),
        VertexDef("b", Nil, Identity.Natural(Seq("b_id")))),
      edges = Seq(EdgeDef("a", "b", "parallel")))
    val res = ResourceDef("r", Seq(
      Descend(Some("a_ids"), steps = Seq(
        VertexStep("a", from = Map("a_id" -> "_value"), lookupOnly = true))),
      Descend(Some("b_ids"), steps = Seq(
        VertexStep("b", from = Map("b_id" -> "_value"), lookupOnly = true))),
      EdgeStep(source = "a", target = "b", relation = "parallel")
    ), inferEdges = false)
    val g = PipelineCompiler.compile(schema, res, df)
    assert(g.edge(EdgeKey("a", "b", "parallel")).count() == 4)
  }
}
