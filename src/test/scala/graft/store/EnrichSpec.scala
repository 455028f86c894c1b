package graft.store

import graft.SparkSpec
import graft.model._
import graft.pipeline._

/** Extra-weight enrichment from STORED vertices (reference
  * `_enrich_extra_weights`, graflo/hq/db_writer.py:355-387).
  */
class EnrichSpec extends SparkSpec {

  private def tmpRoot(tag: String) = freshDir(s"target/enrich-spec-$tag")

  test("write() merges stored vertex fields into edge weights (vertex@field)") {
    import spark.implicits._
    val schema = GraphSchema(
      Seq(
        VertexDef("user", Seq(FieldDef("city")), Identity.Natural(Seq("uid"))),
        VertexDef("item", Nil, Identity.Natural(Seq("iid")))),
      Seq(EdgeDef("user", "item", "bought",
        extraWeights = Seq(VertexWeightSpec("user", Seq("city"))))))
    val store = new GraphStore(tmpRoot("vw"), schema, spark)

    val users = Seq((1L, "berlin"), (2L, "paris")).toDF("uid", "city")
    val res = ResourceDef("r", Seq(
      VertexStep("user"),
      VertexStep("item", from = Map("iid" -> "uid"), lookupOnly = true,
        extractionScope = "mapped_only"),
      EdgeStep(source = "user", target = "item", relation = "bought")
    ), inferEdges = false)
    store.write(PipelineCompiler.compile(schema, res, users))

    val e = store.edges(EdgeKey("user", "item", "bought"))
    assert(e.columns.contains("user@city"))
    val got = e.select("src_uid", "user@city").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "berlin"), (2L, "paris")))
  }

  test("keepVertexName=false uses the bare field name; explicit endpoint works") {
    import spark.implicits._
    val schema = GraphSchema(
      Seq(VertexDef("n", Seq(FieldDef("tag")), Identity.Natural(Seq("id")))),
      Seq(EdgeDef("n", "n", "link")))
    val store = new GraphStore(tmpRoot("self"), schema, spark)
    store.upsertVertices("n", Seq((1L, "t1"), (2L, "t2")).toDF("id", "tag"))
    val edges = Seq((1L, 2L)).toDF("src_id", "dst_id")
    val out = store.enrichEdgeWeights(EdgeKey("n", "n", "link"), edges,
      Seq(VertexWeightSpec("n", Seq("tag"), keepVertexName = false,
        endpoint = Some("target"))))
    assert(out.select("tag").as[String].collect().toSeq == Seq("t2"))
  }
}
