package graft.evolve

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.pipeline._

/** What a merge does to the graph a resource actually emits — the
  * reference's `test/architecture/test_merge_runtime_semantics.py`
  * scenario, asserted behavior-for-behavior: the manifest diff can look
  * right while ingestion silently fuses rows or self-relates an edge, so
  * `merge_vertices` must describe the hazards and refuse until each is
  * affirmed (apply.py:431-489).
  */
class MergeGuardSpec extends SparkSpec {

  import spark.implicits._

  private val doc = Seq(("a1", "b1", "c1")).toDF("a_id", "b_id", "c_id")

  private def schemaWith(edges: Seq[EdgeDef]) = GraphSchema(
    vertices = Seq(
      VertexDef("A", Seq(FieldDef("a_id")), Identity.Natural(Seq("a_id"))),
      VertexDef("B", Seq(FieldDef("b_id")), Identity.Natural(Seq("b_id"))),
      VertexDef("C", Seq(FieldDef("c_id")), Identity.Natural(Seq("c_id")))),
    edges = edges)

  private val joinedEdges = Seq(
    EdgeDef("A", "C", "ac"), EdgeDef("B", "C", "bc"), EdgeDef("A", "B", "ab"))

  private def resource = ResourceDef("res", Seq(
    VertexStep("A"), VertexStep("B"), VertexStep("C")))

  test("the emitted graph before the merge (baseline)") {
    val g = graft.pipeline.PipelineCompiler.compile(
      schemaWith(joinedEdges), resource, doc)
    assert(g.vertex("A").count() == 1 && g.vertex("B").count() == 1 &&
      g.vertex("C").count() == 1)
    assert(g.edge(EdgeKey("A", "C", "ac")).count() == 1)
    assert(g.edge(EdgeKey("B", "C", "bc")).count() == 1)
    assert(g.edge(EdgeKey("A", "B", "ab")).count() == 1)
  }

  test("a merge that would fuse rows is rejected by default, and the " +
      "error names the edge that becomes a self-relation") {
    val err = intercept[IllegalArgumentException] {
      MergeImpact.applyMergeVertices(
        EvolutionOp.MergeVertices(Seq("B"), "A"),
        schemaWith(joinedEdges), Seq(resource))
    }
    assert(err.getMessage.contains("self-relations"))
    assert(err.getMessage.contains("(A, B, ab) -> (A, A, ab)"))
  }

  test("row fusion is reported separately from self-relations") {
    // no edge joins A and B, so only the shared pipeline level is a problem
    val err = intercept[IllegalArgumentException] {
      MergeImpact.applyMergeVertices(
        EvolutionOp.MergeVertices(Seq("B"), "A"),
        schemaWith(Seq(EdgeDef("A", "C", "ac"), EdgeDef("B", "C", "bc"))),
        Seq(resource))
    }
    assert(err.getMessage.contains("more than once"))
    assert(!err.getMessage.contains("self-relation"))
  }

  test("affirming both hazards lets the merge through — and both " +
      "relations survive inference") {
    val (after, rewritten, impact) = MergeImpact.applyMergeVertices(
      EvolutionOp.MergeVertices(Seq("B"), "A",
        allowSelfRelations = true, allowRowFusion = true),
      schemaWith(joinedEdges), Seq(resource))
    assert(!after.vertexByName.contains("B"))
    assert(impact.selfRelations.nonEmpty && impact.fusedLevels.nonEmpty)
    // multiple relations now share the (A, C) pair — the advisory the
    // reference logs (apply.py:416-427)
    assert(impact.advisories.exists(_.contains("more than one relation")))
    val g = graft.pipeline.PipelineCompiler.compile(after, rewritten.head, doc)
    assert(g.vertices.keySet.filter(v => g.vertex(v).count() > 0) == Set("A", "C"))
    // BOTH (A, C) relations are inferred — inference keys per schema edge,
    // not per pair (test_two_relations_on_one_vertex_pair_are_both_inferred)
    assert(g.edge(EdgeKey("A", "C", "ac")).count() == 1)
    assert(g.edge(EdgeKey("A", "C", "bc")).count() == 1)
    // the self-relation (A, A, ab) renders nothing: one A location per doc
    assert(g.edges.get(EdgeKey("A", "A", "ab")).map(_.count()).getOrElse(0L) == 0L)
  }

  test("a merge with no shared level and no joining edge is clean") {
    val cleanResource = ResourceDef("res", Seq(VertexStep("A"), VertexStep("C")))
    val (after, _, impact) = MergeImpact.applyMergeVertices(
      EvolutionOp.MergeVertices(Seq("B"), "A"),
      schemaWith(Seq(EdgeDef("A", "C", "ac"))), Seq(cleanResource))
    assert(!after.vertexByName.contains("B"))
    assert(impact.selfRelations.isEmpty && impact.fusedLevels.isEmpty)
  }

  test("router type_map targets count toward the fusion check and get " +
      "rewritten to the merged name") {
    val routed = ResourceDef("res", Seq(
      VertexStep("A"),
      VertexRouterStep(typeField = "kind", typeMap = Map("b" -> "B"))))
    val err = intercept[IllegalArgumentException] {
      MergeImpact.applyMergeVertices(
        EvolutionOp.MergeVertices(Seq("B"), "A"),
        schemaWith(Nil), Seq(routed))
    }
    assert(err.getMessage.contains("more than once"))
    val (_, rewritten, _) = MergeImpact.applyMergeVertices(
      EvolutionOp.MergeVertices(Seq("B"), "A", allowRowFusion = true),
      schemaWith(Nil), Seq(routed))
    val router = rewritten.head.steps.collectFirst { case r: VertexRouterStep => r }.get
    assert(router.typeMap == Map("b" -> "A"))
  }
}
