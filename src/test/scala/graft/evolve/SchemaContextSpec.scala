package graft.evolve

import graft.SparkSpec
import graft.model._

/** Bounded seeded schema slicing (reference schema/context/subschema.py). */
class SchemaContextSpec extends SparkSpec {

  private val ring: GraphSchema = {
    val n = 10
    GraphSchema(
      (0 until n).map(i => VertexDef(f"v$i%02d", Seq(FieldDef("p")),
        Identity.Natural(Seq("p")))),
      (0 until n).map(i => EdgeDef(f"v$i%02d", f"v${(i + 1) % n}%02d", s"r$i")))
  }

  test("slice keeps the seed neighbourhood and induces edges") {
    val (s, rep) = SchemaContext.subschema(ring, Seq("v00"), maxHops = 1)
    assert(s.vertexByName.keySet == Set("v00", "v01", "v09"))
    // induced: v09->v00 and v00->v01 survive; v01->v02 and v08->v09 don't
    assert(s.edges.map(_.relation).toSet == Set("r9", "r0"))
    assert(rep.elidedVertices.size == 7)
  }

  test("seeds always admit even under a tiny budget; nearest-first order") {
    val (s, _) = SchemaContext.subschema(ring, Seq("v05"), maxHops = 3,
      budget = SchemaContext.Budget(maxElements = Some(3), maxTokens = None))
    // v05 (seed), then hop-1 neighbours by name: v04, v06
    assert(s.vertexByName.keySet == Set("v05", "v04", "v06"))
    val (s1, _) = SchemaContext.subschema(ring, Seq("v02", "v07"),
      maxHops = 2,
      budget = SchemaContext.Budget(maxElements = Some(1), maxTokens = None))
    assert(s1.vertexByName.keySet == Set("v02", "v07")) // seeds never elide
  }

  test("unknown seed throws; schemaCard renders every type") {
    intercept[NoSuchElementException] {
      SchemaContext.subschema(ring, Seq("nope"))
    }
    val card = SchemaContext.schemaCardText(ring)
    assert(card.linesIterator.size == 20)
    assert(card.contains("vertex v00(id: [p]; props: [p])"))
    assert(card.contains("edge (v00)-[r0]->(v01)"))
  }
}
