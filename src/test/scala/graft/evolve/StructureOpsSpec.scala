package graft.evolve

import graft.SparkSpec
import graft.model._
import graft.pipeline.{ResourceDef, VertexStep}
import graft.manifest.{GraphManifest, ResourceBinding}

/** RenameRelations / MergeEdges / ReplaceEdgeIdentities / renameResources —
  * the reference's remaining structure ops (ops.py:330-443) with their
  * validation contract and codec round-trip.
  */
class StructureOpsSpec extends SparkSpec {
  import EvolutionOp._

  private def vtx(n: String) =
    VertexDef(n, Seq(FieldDef("id")), Identity.Natural(Seq("id")))

  private val base = GraphSchema(
    vertices = Seq(vtx("a"), vtx("b"), vtx("c")),
    edges = Seq(
      EdgeDef("a", "b", "likes", directed = false,
        properties = Seq(FieldDef("since"))),
      EdgeDef("a", "b", "knows"),
      EdgeDef("a", "c", "likes")))

  test("rename_relations renames across every dyad; injectivity enforced") {
    val out = Evolution(base, Seq(RenameRelations(Map("likes" -> "adores"))))
    assert(out.edges.map(_.relation).sorted == Seq("adores", "adores", "knows"))
    intercept[IllegalArgumentException](
      RenameRelations(Map("likes" -> "x", "knows" -> "x")))
  }

  test("rename_relations landing on an existing key is REJECTED") {
    // executed evolution-parity: the reference raises "duplicate edge
    // definitions" — MergeEdges is the deliberate merge path
    intercept[IllegalArgumentException](
      Evolution(base, Seq(RenameRelations(Map("likes" -> "knows")))))
  }

  test("merge_edges collapses source relations into the canonical one") {
    val out = Evolution(base, Seq(MergeEdges(Seq("likes"), "knows")))
    assert(out.edges.map(_.relation).distinct == Seq("knows"))
    assert(out.edges.size == 2) // (a,b) merged pair + (a,c)
    intercept[IllegalArgumentException](MergeEdges(Seq("knows"), "knows"))
    intercept[IllegalArgumentException](MergeEdges(Nil, "x"))
  }

  test("replace_edge_identities swaps the key and materializes new tokens") {
    val out = Evolution(base, Seq(ReplaceEdgeIdentities(
      EdgeKey("a", "b", "knows"), Seq("source", "target", "since", "ctx"))))
    val e = out.edgeByKey(EdgeKey("a", "b", "knows"))
    assert(e.identities == Seq("source", "target", "since", "ctx"))
    // non-endpoint tokens merged into properties, existing ones not duplicated
    assert(e.properties.map(_.name) == Seq("since", "ctx"))
  }

  test("new ops round-trip the revision JSON codec") {
    val ops: Seq[EvolutionOp] = Seq(
      RenameRelations(Map("likes" -> "adores", "knows" -> "met")),
      MergeEdges(Seq("likes", "loves"), "knows"),
      ReplaceEdgeIdentities(EdgeKey("a", "b", "knows"), Seq("source", "target", "ctx")))
    ops.foreach { op =>
      val json = RevisionStore.opToJson(op)
      assert(RevisionStore.opFromJson(json) == op, s"codec round-trip: $op")
    }
  }

  test("rename_resources renames bindings too; unknown and colliding raise") {
    val m = GraphManifest("m",
      GraphSchema(Seq(vtx("a")), Nil),
      resources = Seq(
        ResourceDef("old", Seq(VertexStep("a"))),
        ResourceDef("other", Seq(VertexStep("a")))),
      bindings = Seq(ResourceBinding("old"), ResourceBinding("other")))
    val out = Project.renameResources(m, Map("old" -> "fresh"))
    assert(out.resources.map(_.name) == Seq("fresh", "other"))
    assert(out.bindings.map(_.resource) == Seq("fresh", "other"))
    intercept[IllegalArgumentException](
      Project.renameResources(m, Map("nope" -> "x")))
    intercept[IllegalArgumentException](
      Project.renameResources(m, Map("old" -> "other")))
    intercept[IllegalArgumentException](
      Project.renameResources(m, Map("old" -> "x", "other" -> "x")))
  }

  test("assigned identity field follows a property rename") {
    val s = GraphSchema(Seq(VertexDef("sess", Seq(FieldDef("sid")),
      Identity.Assigned("sid"))), Nil)
    val out = Evolution(s, Seq(RenameProperty("sess", "sid", "session_id")))
    assert(out.vertexByName("sess").identity == Identity.Assigned("session_id"))
  }

  test("risk classification covers the new ops") {
    assert(Risk.classify(RenameRelations(Map("a" -> "b"))) == Risk.Medium)
    assert(Risk.classify(MergeEdges(Seq("a"), "b")) == Risk.High)
    assert(Risk.classify(ReplaceEdgeIdentities(
      EdgeKey("a", "b", "r"), Seq("source", "target"))) == Risk.Critical)
  }

  test("planner orders ops deterministically: vertices, edges, fields") {
    val plan = Planner.build(Seq(
      AddEdgeProperty(EdgeKey("a", "b", "r"), FieldDef("w")),
      AddVertex(vtx("person")),
      AddEdge(EdgeDef("person", "company", "works_at"))))
    assert(plan.operations.map(_.getClass.getSimpleName) ==
      Seq("AddVertex", "AddEdge", "AddEdgeProperty"))
    assert(plan.blocked.isEmpty && plan.warnings.isEmpty)
  }

  test("planner blocks high-risk by default, reports them, allows on flag") {
    val ops = Seq(
      RemoveVertex("old"),
      AddVertex(vtx("fresh")),
      MergeVertices(Seq("x"), "y"))
    val gated = Planner.build(ops)
    assert(gated.operations.map(_.getClass.getSimpleName) == Seq("AddVertex"))
    assert(gated.blocked.map(_._2).toSet == Set(Risk.High, Risk.Critical))
    assert(gated.warnings.exists(_.contains("blocked by default")))
    val open = Planner.build(ops, allowHighRisk = true)
    assert(open.operations.size == 3 && open.blocked.isEmpty)
    // removes run AFTER adds even when allowed
    assert(open.operations.map(_.getClass.getSimpleName) ==
      Seq("AddVertex", "RemoveVertex", "MergeVertices"))
  }

  test("intra-rank order is alphabetical by target (deterministic re-runs)") {
    val plan = Planner.build(Seq(
      AddVertex(vtx("zebra")), AddVertex(vtx("ant"))),
      allowHighRisk = true)
    assert(plan.operations.collect { case AddVertex(v) => v.name } ==
      Seq("ant", "zebra"))
  }
}
