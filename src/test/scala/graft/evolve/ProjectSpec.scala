package graft.evolve

import graft.SparkSpec
import graft.model._
import graft.pipeline._
import graft.manifest.{GraphManifest, ResourceBinding}

/** Manifest projection — mirrors the reference's
  * test_manifest_projection.py / test_projection_kernel.py contracts.
  */
class ProjectSpec extends SparkSpec {

  private def vtx(n: String) =
    VertexDef(n, Seq(FieldDef("id")), Identity.Natural(Seq("id")))

  private def threeVertexManifest: GraphManifest = GraphManifest(
    name = "three_vertex",
    schema = GraphSchema(
      vertices = Seq(vtx("a"), vtx("b"), vtx("c")),
      edges = Seq(EdgeDef("a", "b", "linked"))),
    resources = Seq(
      ResourceDef("r_a", Seq(VertexStep("a"))),
      ResourceDef("r_b", Seq(VertexStep("b"))),
      ResourceDef("r_c", Seq(VertexStep("c")))),
    bindings = Seq(
      ResourceBinding("r_a"), ResourceBinding("r_c")))

  test("keep_vertices induced prune drops isolated requested vertices") {
    val out = Project.projectManifest(threeVertexManifest,
      keepVertices = Some(Seq("a", "b", "c")))
    assert(out.schema.vertices.map(_.name).toSet == Set("a", "b"))
    assert(out.schema.edges.map(_.relation) == Seq("linked"))
    assert(out.resources.map(_.name).toSet == Set("r_a", "r_b"))
    // bindings of dropped resources go too
    assert(out.bindings.map(_.resource) == Seq("r_a"))
  }

  test("keep_edges by triple keeps exactly the selected dyad") {
    val m = GraphManifest(
      name = "dyads",
      schema = GraphSchema(
        vertices = Seq(vtx("person"), vtx("company"), vtx("department")),
        edges = Seq(
          EdgeDef("person", "company", "works_at"),
          EdgeDef("person", "department", "works_at"))),
      resources = Seq(ResourceDef("r", Seq(
        VertexStep("person"), VertexStep("company"), VertexStep("department"),
        EdgeStep("person", "company", "works_at"),
        EdgeStep("person", "department", "works_at")))),
      bindings = Nil)
    val out = Project.projectManifest(m,
      keepEdges = Some(Seq(EdgeKey("person", "company", "works_at"))))
    assert(out.schema.edges.map(_.key) == Seq(EdgeKey("person", "company", "works_at")))
    assert(out.schema.vertices.map(_.name).toSet == Set("person", "company"))
    val steps = out.resources.head.steps
    assert(steps.collect { case e: EdgeStep => e.target } == Seq("company"))
    assert(steps.collect { case v: VertexStep => v.vertex }.toSet ==
      Set("person", "company"))
  }

  test("strict unknown vertex and edge selectors raise") {
    intercept[IllegalArgumentException](
      Project.projectManifest(threeVertexManifest,
        keepVertices = Some(Seq("a", "nope"))))
    intercept[IllegalArgumentException](
      Project.projectManifest(threeVertexManifest,
        keepEdges = Some(Seq(EdgeKey("a", "b", "missing")))))
    // non-strict tolerates and simply drops
    val out = Project.projectManifest(threeVertexManifest,
      keepVertices = Some(Seq("a", "b", "nope")), strict = false)
    assert(out.schema.vertices.map(_.name).toSet == Set("a", "b"))
  }

  test("projection that empties the ingestion model aborts") {
    val solo = GraphManifest(
      name = "solo",
      schema = GraphSchema(vertices = Seq(vtx("only"), vtx("other")),
        edges = Seq(EdgeDef("only", "other", "r"))),
      resources = Seq(ResourceDef("r1", Seq(VertexStep("other")))),
      bindings = Nil)
    val ex = intercept[IllegalArgumentException](
      Project.projectManifest(solo, keepVertices = Some(Seq("only"))))
    assert(ex.getMessage.contains("empty"))
  }

  test("keep_resources filters surviving resources and their bindings") {
    val out = Project.projectManifest(threeVertexManifest,
      keepVertices = Some(Seq("a", "b", "c")),
      keepResources = Some(Seq("r_a")))
    assert(out.resources.map(_.name) == Seq("r_a"))
  }

  test("at least one selector is required; duplicates rejected") {
    intercept[IllegalArgumentException](
      Project.projectManifest(threeVertexManifest))
    intercept[IllegalArgumentException](
      Project.projectManifest(threeVertexManifest,
        keepVertices = Some(Seq("a", "a"))))
  }

  test("router type_map entries prune; an emptied router drops its resource") {
    val m = GraphManifest(
      name = "routed",
      schema = GraphSchema(
        vertices = Seq(vtx("person"), vtx("vehicle"), vtx("site")),
        edges = Seq(EdgeDef("person", "site", "at"))),
      resources = Seq(
        ResourceDef("r_router", Seq(VertexRouterStep("type",
          typeMap = Map("P" -> "person", "V" -> "vehicle")))),
        ResourceDef("r_site", Seq(VertexStep("site"))),
        ResourceDef("r_only_vehicle", Seq(VertexRouterStep("type",
          typeMap = Map("V" -> "vehicle"))))),
      bindings = Nil)
    val out = Project.projectManifest(m, keepVertices = Some(Seq("person", "site")))
    val router = out.resources.find(_.name == "r_router").get
      .steps.head.asInstanceOf[VertexRouterStep]
    assert(router.typeMap == Map("P" -> "person"))
    assert(!out.resources.exists(_.name == "r_only_vehicle"))
  }

  test("descend subtrees that only fed removed vertices prune away") {
    val m = GraphManifest(
      name = "nested",
      schema = GraphSchema(
        vertices = Seq(vtx("order"), vtx("item"), vtx("note")),
        edges = Seq(
          EdgeDef("order", "item", "has"),
          EdgeDef("order", "note", "annotated"))),
      resources = Seq(ResourceDef("r", Seq(
        VertexStep("order"),
        Descend(key = Some("items"), steps = Seq(VertexStep("item"))),
        Descend(key = Some("notes"), steps = Seq(VertexStep("note")))))),
      bindings = Nil)
    val out = Project.projectManifest(m, keepVertices = Some(Seq("order", "item")))
    val steps = out.resources.head.steps
    assert(steps.size == 2) // the notes descend is gone with its vertex
    assert(steps.collectFirst { case d: Descend => d.key } == Some(Some("items")))
  }

  test("a projection whose induced prune empties everything aborts") {
    val m = GraphManifest(
      name = "nested",
      schema = GraphSchema(
        vertices = Seq(vtx("order"), vtx("item")),
        edges = Seq(EdgeDef("order", "item", "has"))),
      resources = Seq(ResourceDef("r", Seq(
        VertexStep("order"),
        Descend(key = Some("items"), steps = Seq(VertexStep("item")))))),
      bindings = Nil)
    // order alone is isolated once the edge goes -> induced prune drops it
    // too, the resource loses every graph step, and the projection aborts
    val ex = intercept[IllegalArgumentException](
      Project.projectManifest(m, keepVertices = Some(Seq("order"))))
    assert(ex.getMessage.contains("empty"))
  }
}
