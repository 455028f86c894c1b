package graft.evolve

import graft.SparkSpec
import graft.evolve.Compose._
import graft.manifest.ManifestLoader

/** compose_manifests semantics (reference evolution/compose.py:586-660):
  * equivalence merge, derived identity union, collision policies.
  */
class ComposeSpec extends SparkSpec {

  private def mini(name: String, vertex: String, prop: String,
      id: String): graft.manifest.GraphManifest =
    ManifestLoader.fromYamlString(
      s"""schema:
         |    metadata:
         |        name: $name
         |    graph:
         |        vertex_config:
         |            vertices:
         |            -   name: $vertex
         |                properties:
         |                -   $prop
         |                identity:
         |                -   $id
         |ingestion_model:
         |    resources:
         |    -   name: r_$name
         |        pipeline:
         |        -   vertex: $vertex
         |""".stripMargin)

  test("empty equivalences give a disjoint union") {
    val c = Compose.composeManifests(
      mini("l", "a", "p1", "k1"), mini("r", "b", "p2", "k2"),
      ComposeManifestsOp())
    assert(c.schema.vertexByName.keySet == Set("a", "b"))
    assert(c.resources.map(_.name) == Seq("r_l", "r_r"))
  }

  test("derived identity is the union of both sides plus flagged intos") {
    val c = Compose.composeManifests(
      mini("l", "a", "p1", "k1"), mini("r", "b", "p2", "k2"),
      ComposeManifestsOp(vertices = Seq(VertexEquiv("a", "b", "ab",
        properties = Seq(PropertyEquiv(Some("p1"), Some("p2"), "p",
          identity = true))))))
    val v = c.schema.vertex("ab")
    assert(v.properties.map(_.name) == Seq("p"))
    assert(v.idColumns == Seq("k1", "k2", "p"))
  }

  test("right-side collisions error by default and prefix under prefix_right") {
    val l = mini("l", "same", "p1", "k1")
    val r = mini("r", "same", "p2", "k2")
    intercept[IllegalArgumentException] {
      Compose.composeManifests(l, r, ComposeManifestsOp())
    }
    val c = Compose.composeManifests(l, r,
      ComposeManifestsOp(nameConflict = "prefix_right"))
    assert(c.schema.vertexByName.keySet == Set("same", "r_same"))
  }

  test("resource renames apply to the right side before union") {
    val c = Compose.composeManifests(
      mini("l", "a", "p1", "k1"), mini("r", "b", "p2", "k2"),
      ComposeManifestsOp(resourceRenames = Map("r_r" -> "renamed")))
    assert(c.resources.map(_.name) == Seq("r_l", "renamed"))
  }
}
