package graft.pipeline

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.functions._

/** SURVEY §7.3 "what is hard": lineage-faithful edge joins for deeply nested
  * documents — two explode levels, PAIR vs PRODUCT selection across branch
  * depths, and sibling-branch pairing.
  */
class DeepNestingSpec extends SparkSpec {

  // documents: publications with authors[] and references[], where each
  // author has affiliations[] (two-level nesting)
  private lazy val pubs = {
    val sparkS = spark
    import sparkS.implicits._
    Seq(
      ("P1",
        Seq(("A1", Seq("U1", "U2")), ("A2", Seq("U3"))),
        Seq("R1", "R2")),
      ("P2",
        Seq(("A3", Seq.empty[String])),
        Seq.empty[String])
    ).toDF("pub_id", "authors", "refs")
      .withColumn("authors", org.apache.spark.sql.functions.transform(col("authors"),
        a => struct(a.getField("_1").as("author_id"), a.getField("_2").as("affils"))))
  }

  private val schema = GraphSchema(
    vertices = Seq(
      VertexDef("pub", Nil, Identity.Natural(Seq("pub_id"))),
      VertexDef("author", Nil, Identity.Natural(Seq("author_id"))),
      VertexDef("org", Nil, Identity.Natural(Seq("org_id"))),
      VertexDef("ref", Nil, Identity.Natural(Seq("ref_id")))),
    edges = Seq(
      EdgeDef("pub", "author", "wrote_by"),
      EdgeDef("author", "org", "affiliated"),
      EdgeDef("pub", "ref", "cites"),
      EdgeDef("author", "ref", "author_ref")))

  private lazy val out = {
    val res = ResourceDef("pubs", Seq(
      VertexStep("pub"),
      Descend(Some("authors"), steps = Seq(
        VertexStep("author"),
        Descend(Some("affils"), steps = Seq(
          VertexStep("org", from = Map("org_id" -> "_value"),
            extractionScope = "mapped_only"))),
        EdgeStep(source = "author", target = "org", relation = "affiliated"))),
      Descend(Some("refs"), steps = Seq(
        VertexStep("ref", from = Map("ref_id" -> "_value"),
          extractionScope = "mapped_only"))),
      EdgeStep(source = "pub", target = "author", relation = "wrote_by"),
      EdgeStep(source = "pub", target = "ref", relation = "cites"),
      // cross-branch: every author × every ref of the same publication
      EdgeStep(source = "author", target = "ref", relation = "author_ref")
    ), inferEdges = false)
    PipelineCompiler.compile(schema, res, pubs)
  }

  test("two-level descend extracts all vertices with merged identities") {
    assert(out.vertex("pub").count() == 2)
    assert(out.vertex("author").count() == 3)
    assert(out.vertex("org").count() == 3)
    assert(out.vertex("ref").count() == 2)
  }

  test("doc-level → level-1 edges (product within document)") {
    val sparkS = spark
    import sparkS.implicits._
    val wroteBy = out.edge(EdgeKey("pub", "author", "wrote_by"))
      .select("src_pub_id", "dst_author_id").as[(String, String)].collect().toSet
    assert(wroteBy == Set(("P1", "A1"), ("P1", "A2"), ("P2", "A3")))
  }

  test("level-1 → level-2 edges stay within the right parent (no cross-author affils)") {
    val sparkS = spark
    import sparkS.implicits._
    val affil = out.edge(EdgeKey("author", "org", "affiliated"))
      .select("src_author_id", "dst_org_id").as[(String, String)].collect().toSet
    // A2 must NOT be affiliated with U1/U2 (they belong to A1's sub-branch)
    assert(affil == Set(("A1", "U1"), ("A1", "U2"), ("A2", "U3")))
  }

  test("sibling-branch edges pair across branches within the same document") {
    val sparkS = spark
    import sparkS.implicits._
    val ar = out.edge(EdgeKey("author", "ref", "author_ref"))
      .select("src_author_id", "dst_ref_id").as[(String, String)].collect().toSet
    assert(ar == Set(("A1", "R1"), ("A1", "R2"), ("A2", "R1"), ("A2", "R2")))
  }
}
