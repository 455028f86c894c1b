package graft.evolve

import graft.SparkSpec
import graft.model._

/** `directed` must survive every path that rebuilds an edge def — the
  * reference's merge_core.py contract (test_edge_directed_merge.py):
  * losing it lets an inverse-edge op synthesize a duplicate of the very
  * relationship the undirected flag exists to keep single.
  */
class EdgeMergeSpec extends SparkSpec {
  import EvolutionOp._

  private def vertex(n: String) =
    VertexDef(n, Seq(FieldDef("name")), Identity.Natural(Seq("id")))

  test("merging two undirected edges stays undirected; property union") {
    val a = EdgeDef("person", "person", "knows", directed = false)
    val b = EdgeDef("person", "person", "knows", directed = false,
      properties = Seq(FieldDef("since")))
    val m = mergeEdgePair(a, b)
    assert(!m.directed)
    assert(m.properties.map(_.name) == Seq("since"))
  }

  test("merging two directed edges stays directed") {
    val a = EdgeDef("person", "company", "works_at")
    val m = mergeEdgePair(a, a.copy())
    assert(m.directed)
  }

  test("undirected wins a mixed merge, in either argument order") {
    val u = EdgeDef("a", "b", "r", directed = false)
    val d = EdgeDef("a", "b", "r", directed = true)
    assert(!mergeEdgePair(u, d).directed)
    assert(!mergeEdgePair(d, u).directed)
  }

  test("typed beats untyped in the property union; conflicts raise") {
    val a = EdgeDef("a", "b", "r", properties = Seq(FieldDef("w")))
    val b = EdgeDef("a", "b", "r",
      properties = Seq(FieldDef("w", Some(FieldType.IntT))))
    assert(mergeEdgePair(a, b).properties == Seq(FieldDef("w", Some(FieldType.IntT))))
    val c = EdgeDef("a", "b", "r",
      properties = Seq(FieldDef("w", Some(FieldType.StringT))))
    intercept[IllegalArgumentException](mergeEdgePair(b, c))
  }

  test("merge_vertices endpoint-redirect collision preserves undirected") {
    val s = GraphSchema(
      vertices = Seq(vertex("person"), vertex("staff"), vertex("employee")),
      edges = Seq(
        EdgeDef("person", "staff", "knows", directed = false),
        EdgeDef("person", "employee", "knows", directed = false)))
    val out = Evolution(s, Seq(
      MergeVertices(Seq("staff", "employee"), "worker")))
    val ks = out.edges.filter(_.relation == "knows")
    assert(ks.size == 1)
    assert(ks.head.key == EdgeKey("person", "worker", "knows"))
    assert(!ks.head.directed)
  }

  test("relation-remap collision is rejected (merge is MergeEdges' job)") {
    // executed evolution-parity: the reference's manifest re-validation
    // raises "duplicate edge definitions" when a rename lands on an
    // existing (source, target, relation) key
    val s = GraphSchema(
      vertices = Seq(vertex("a"), vertex("b")),
      edges = Seq(
        EdgeDef("a", "b", "likes", directed = false,
          properties = Seq(FieldDef("since"))),
        EdgeDef("a", "b", "knows", directed = true)))
    intercept[IllegalArgumentException](Evolution(s, Seq(
      RenameRelation(EdgeKey("a", "b", "likes"), "knows"))))
    // non-colliding rename still works
    val ok = Evolution(s, Seq(
      RenameRelation(EdgeKey("a", "b", "likes"), "adores")))
    assert(ok.edges.map(_.relation).sorted == Seq("adores", "knows"))
  }

  test("retarget collision is rejected (executed reference truth)") {
    val s = GraphSchema(
      vertices = Seq(vertex("a"), vertex("b"), vertex("c")),
      edges = Seq(
        EdgeDef("a", "b", "r", directed = false),
        EdgeDef("a", "c", "r", directed = true)))
    intercept[IllegalArgumentException](Evolution(s, Seq(
      RetargetEdge(EdgeKey("a", "c", "r"), "a", "b"))))
    val ok = Evolution(s, Seq(RetargetEdge(EdgeKey("a", "c", "r"), "b", "c")))
    assert(ok.edgeByKey.contains(EdgeKey("b", "c", "r")))
  }
}
