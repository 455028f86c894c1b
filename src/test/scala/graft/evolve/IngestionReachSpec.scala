package graft.evolve

import org.scalatest.funsuite.AnyFunSuite

import graft.evolve.EvolutionOp._
import graft.model._

/** Ingestion-reach classification (reference ops.py INGESTION_REWRITING_OPS
  * + `ops_reaching_ingestion`, mirroring
  * test_evolution_codec.py::test_every_op_is_classified_for_ingestion_reach):
  * every op kind in the vocabulary is classified, and the reaching ops
  * report the reference's own op tokens.
  */
class IngestionReachSpec extends AnyFunSuite {

  private val oneOfEach: Seq[EvolutionOp] = Seq(
    AddVertex(VertexDef("v", Nil, Identity.Natural(Seq("id")))),
    RemoveVertex("v"),
    RenameVertex("a", "b"),
    RenameVertices(Map("a" -> "b")),
    AddProperty("v", FieldDef("p")),
    RemoveProperty("v", "p"),
    RenameProperty("v", "p", "q"),
    SetFieldType("v", "p", FieldType.IntT),
    AddSecondaryIdentity("v", SecondaryIdentity("s", Seq("p"))),
    RemoveSecondaryIdentity("v", "s"),
    AddEdge(EdgeDef("a", "b", "r")),
    RemoveEdge(EdgeKey("a", "b", "r")),
    RenameRelation(EdgeKey("a", "b", "r"), "r2"),
    RetargetEdge(EdgeKey("a", "b", "r"), "a", "c"),
    RenameRelations(Map("r" -> "r2")),
    MergeEdges(Seq("r"), "r2"),
    ReplaceEdgeIdentities(EdgeKey("a", "b", "r"), Seq("source", "target")),
    InverseEdge(EdgeKey("a", "b", "r"), "r_inv"),
    AddEdgeProperty(EdgeKey("a", "b", "r"), FieldDef("w")),
    RenameEdgeProperty(EdgeKey("a", "b", "r"), "w", "w2"),
    RemoveEdgeProperty(EdgeKey("a", "b", "r"), "w"),
    SetEdgeDirected(EdgeKey("a", "b", "r"), directed = false),
    ReplaceIdentity("v", Identity.Blank),
    MergeVertices(Seq("a"), "b")
  )

  test("every op kind is classified (total match, no throw)") {
    oneOfEach.foreach(op => Risk.reachesIngestion(op): Unit)
  }

  test("reaching ops report the reference's op tokens, in input order") {
    assert(Risk.opsReachingIngestion(oneOfEach) == Seq(
      "remove_vertices", "rename_vertices", "rename_vertices",
      "remove_vertex_properties", "rename_vertex_properties",
      "remove_edges", "rename_relations", "rename_relations",
      "merge_edges", "add_inverse_edges", "replace_identity",
      "merge_vertices"))
    // the token vocabulary matches the reference's frozen set (every
    // member expressible as a graft op; sanitize / project_manifest /
    // rename_resources live on graft's generator/module planes)
    assert(Risk.opsReachingIngestion(oneOfEach).toSet == Set(
      "rename_vertices", "remove_vertices", "rename_vertex_properties",
      "remove_vertex_properties", "rename_relations", "remove_edges",
      "merge_edges", "merge_vertices", "replace_identity",
      "add_inverse_edges"))
    // schema-only ops never reach: additions, retype, retarget, edge-prop
    // renames, secondary identities, directedness
    assert(!Risk.reachesIngestion(oneOfEach.head)) // AddVertex
  }
}
