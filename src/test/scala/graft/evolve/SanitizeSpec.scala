package graft.evolve

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

class SanitizeSpec extends AnyFunSuite {

  private def schema = GraphSchema(
    vertices = Seq(
      VertexDef("User-Account",
        properties = Seq(FieldDef("User-Id", Some(FieldType.StringT)),
          FieldDef("Display Name", Some(FieldType.StringT))),
        identity = Identity.Natural(Seq("User-Id"))),
      VertexDef("ORDER",
        properties = Seq(FieldDef("id", Some(FieldType.StringT))),
        identity = Identity.Natural(Seq("id")))),
    edges = Seq(
      EdgeDef("User-Account", "ORDER", relation = "Placed-Order")))

  test("sanitize rewrites names to the store-safe charset, cascading everywhere") {
    val out = Sanitize(schema)
    assert(out.vertexByName.keySet == Set("user_account", "order"))
    val user = out.vertexByName("user_account")
    assert(user.properties.map(_.name).toSet == Set("user_id", "display_name"))
    // the natural identity followed its renamed property
    assert(user.identity == Identity.Natural(Seq("user_id")))
    val e = out.edges.head
    assert(e.source == "user_account" && e.target == "order" &&
      e.relation == "placed_order")
  }

  test("sanitization is idempotent and empty on a clean schema") {
    val once = Sanitize(schema)
    assert(Sanitize.ops(once).isEmpty)
    assert(Sanitize(once) == once)
  }

  test("post-sanitization collisions get deterministic suffixes") {
    val s = GraphSchema(
      vertices = Seq(
        VertexDef("My-Vertex",
          properties = Seq(FieldDef("id", Some(FieldType.StringT))),
          identity = Identity.Natural(Seq("id"))),
        VertexDef("My Vertex",
          properties = Seq(FieldDef("id", Some(FieldType.StringT))),
          identity = Identity.Natural(Seq("id")))),
      edges = Nil)
    val out = Sanitize(s)
    // "My Vertex" < "My-Vertex" in sorted-original order → gets the base
    assert(out.vertexByName.keySet == Set("my_vertex", "my_vertex_2"))
  }

  test("leading digits and hostile characters are neutralized") {
    assert(Sanitize.clean("2fast2furious", 63) == "n_2fast2furious")
    assert(Sanitize.clean("--weird--", 63) == "weird")
    assert(Sanitize.clean("a!!b??c", 63) == "a_b_c")
    assert(Sanitize.clean("", 63) == "n_")
    assert(Sanitize.clean("x" * 100, 10).length == 10)
  }

  test("sanitize ops are plain structural renames — revision machinery applies") {
    val ops = Sanitize.ops(schema)
    assert(ops.nonEmpty)
    assert(ops.forall {
      case _: EvolutionOp.RenameVertex | _: EvolutionOp.RenameProperty |
           _: EvolutionOp.RenameRelation => true
      case _ => false
    })
    // the op list replayed through the generic applier gives the same result
    assert(Evolution(schema, ops) == Sanitize(schema))
  }
}
