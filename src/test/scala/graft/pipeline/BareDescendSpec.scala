package graft.pipeline

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.functions._

/** Bare descend (reference actor/descend.py:154-192 `_expand_document`
  * else-branch): `Descend(None)` iterates the current document when it IS a
  * list — columnar reading: the frame's single array-typed data column.
  */
class BareDescendSpec extends SparkSpec {

  test("bare descend explodes the sole array column (scalars) with lineage") {
    import spark.implicits._
    val df = Seq((10L, Seq("a", "b")), (20L, Seq("c"))).toDF("gid", "members")
    val schema = GraphSchema(
      Seq(VertexDef("grp", Nil, Identity.Natural(Seq("gid"))),
        VertexDef("m", Nil, Identity.Natural(Seq("name")))),
      Seq(EdgeDef("grp", "m", "has")))
    // descend into "members" (keyed, array of scalars) re-roots to a frame
    // whose only data column is _value... but bare descend targets the array
    // itself: transform gid-frame to hold ONLY the array, then iterate bare
    val res = ResourceDef("r", Seq(
      VertexStep("grp", lookupOnly = true),
      Descend(None, steps = Seq(
        VertexStep("m", from = Map("name" -> "_value"),
          extractionScope = "mapped_only"))),
      EdgeStep(source = "grp", target = "m", relation = "has")
    ), inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.vertex("m").count() == 3)
    val edges = out.edge(EdgeKey("grp", "m", "has"))
      .select("src_gid", "dst_name").as[(Long, String)].collect().toSet
    assert(edges == Set((10L, "a"), (10L, "b"), (20L, "c")))
  }

  test("bare descend over array of structs re-roots fields") {
    import spark.implicits._
    val df = Seq((1L, Seq((100L, "x"), (200L, "y")))).toDF("oid", "items")
      .withColumn("items", transform(col("items"),
        x => struct(x.getField("_1").as("pk"), x.getField("_2").as("nm"))))
    val schema = GraphSchema(Seq(VertexDef("p", Seq(FieldDef("nm")),
      Identity.Natural(Seq("pk")))))
    val res = ResourceDef("r", Seq(
      Descend(None, steps = Seq(VertexStep("p")))), inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    val rows = out.vertex("p").select("pk", "nm").as[(Long, String)].collect().toSet
    assert(rows == Set((100L, "x"), (200L, "y")))
  }

  test("bare descend with no array column is a single-item pass-through") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    val schema = GraphSchema(Seq(VertexDef("d", Seq(FieldDef("v")),
      Identity.Natural(Seq("id")))))
    val res = ResourceDef("r", Seq(Descend(None, steps = Seq(VertexStep("d")))))
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.vertex("d").count() == 1)
  }

  test("bare descend with two array columns is rejected") {
    import spark.implicits._
    val df = Seq((1L, Seq("a"), Seq("b"))).toDF("id", "xs", "ys")
    val schema = GraphSchema(Seq(VertexDef("d", Nil, Identity.Natural(Seq("id")))))
    val res = ResourceDef("r", Seq(Descend(None, steps = Seq(VertexStep("d")))))
    intercept[IllegalArgumentException] {
      PipelineCompiler.compile(schema, res, df)
    }
  }
}
