package graft.evolve

import graft.SparkSpec
import graft.model._

/** Round-trip contracts of [[ManifestEvolution.evolveManifest]] beyond the
  * byte-parity fixtures: the returned manifest must be RUNNABLE — evolved
  * bindings (not the pre-evolution ones), and every normalized step form
  * the cascade emits must re-parse through the manifest loader.
  */
class ManifestEvolutionSpec extends SparkSpec {
  import CascadeOp._

  private val withBindings =
    """schema:
      |    metadata: {name: t}
      |    graph:
      |        vertex_config:
      |            vertices:
      |            -   name: person
      |                properties: [pid, age]
      |                identity: [pid]
      |            -   name: city
      |                properties: [cid]
      |                identity: [cid]
      |        edge_config:
      |            edges:
      |            -   {source: person, target: city, relation: lives_in}
      |ingestion_model:
      |    resources:
      |    -   name: people
      |        pipeline:
      |        -   vertex: person
      |    -   name: cities
      |        pipeline:
      |        -   vertex: city
      |bindings:
      |    people: /data/people.jsonl
      |    cities: /data/cities.jsonl
      |""".stripMargin

  test("evolved bindings follow resource renames and resource pruning") {
    val evolved = ManifestEvolution.evolveManifest(withBindings, Seq(
      RenameResources(Seq("people" -> "persons")),
      // removing `city` drops the cities resource — its binding must go too
      RemoveVertices(Seq("city"))))
    assert(evolved.resources.map(_.name) == Seq("persons"))
    assert(evolved.bindings.map(_.resource) == Seq("persons"))
    assert(evolved.bindings.head.path.contains("/data/people.jsonl"))
  }

  test("normalized role-bound edge steps survive the evolve round trip") {
    val routed =
      """schema:
        |    metadata: {name: t}
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: city
        |                properties: [cid, pop]
        |                identity: [cid]
        |            -   name: company
        |                properties: [coid]
        |                identity: [coid]
        |        edge_config:
        |            edges:
        |            -   {source: company, target: city, relation: based_in}
        |ingestion_model:
        |    resources:
        |    -   name: routed
        |        pipeline:
        |        -   vertex_router:
        |                type_field: kind
        |                type_map: {c: city, co: company}
        |                role: slot_kind
        |        -   edge:
        |                source_role: slot_kind
        |                target_role: slot_kind
        |                relation: based_in
        |""".stripMargin
    // a property rename normalizes EVERY step, flattening the edge wrapper
    // into a bare role-bound dict — the reload must still parse it
    val evolved = ManifestEvolution.evolveManifest(routed, Seq(
      RenameVertexProperties(Seq("city" -> Seq("pop" -> "population")))))
    val steps = evolved.resource("routed").steps
    assert(steps.exists(_.isInstanceOf[graft.pipeline.EdgeStep]))
    assert(steps.collect { case e: graft.pipeline.EdgeStep => e }
      .exists(e => e.relation == "based_in"))
  }

  test("localize cap at Int.MaxValue saturates instead of wrapping") {
    import graft.query._
    import graft.expr.FilterExpr
    import spark.implicits._
    val schema = GraphSchema(
      vertices = Seq(VertexDef("u", Nil, Identity.Natural(Seq("id")))),
      edges = Seq(EdgeDef("u", "u", "uu")))
    val vs = Map("u" -> Seq(("u1", 1), ("u2", 2)).toDF("id", "n"))
    val es = Map(EdgeKey("u", "u", "uu") ->
      Seq(("u1", "u2")).toDF("src_id", "dst_id"))
    val reader = new GraphReader(schema, vs(_), es.get(_),
      QueryCaps.Hard.copy(timeoutSeconds = 0), localizeCap = Int.MaxValue)
    val out = reader.neighbors(NeighborQuery("u", FilterExpr.eq("id", "u1")))
    assert(out.vertices("u").count() == 1)
  }

  test("multi-link edge steps survive the evolve round trip (flat {type: edge, links})") {
    // the cascade normalizes `edge: {links: [...]}` into the FLAT
    // `{type: edge, links: [...]}` shape; the loader's type-tag dispatch
    // must not swallow it into one empty EdgeStep (round-10 self-review
    // finding: every link silently dropped)
    val linked =
      """schema:
        |    metadata: {name: t}
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: a
        |                properties: [aid, x]
        |                identity: [aid]
        |            -   name: b
        |                properties: [bid]
        |                identity: [bid]
        |        edge_config:
        |            edges:
        |            -   {source: a, target: b, relation: r1}
        |            -   {source: a, target: b, relation: r2}
        |ingestion_model:
        |    resources:
        |    -   name: r
        |        pipeline:
        |        -   vertex: a
        |        -   vertex: b
        |        -   edge:
        |                links:
        |                -   {from: a, to: b, relation: r1}
        |                -   {from: a, to: b, relation: r2}
        |""".stripMargin
    val evolved = ManifestEvolution.evolveManifest(linked, Seq(
      RenameVertexProperties(Seq("a" -> Seq("x" -> "y")))))
    val steps = evolved.resources.head.steps
    val multi = steps.collect { case m: graft.pipeline.MultiEdgeStep => m }
    assert(multi.nonEmpty, s"links step vanished: $steps")
    assert(multi.head.links.map(_.relation).sorted == Seq("r1", "r2"))
    // and the renamed property still feeds the vertex step
    val va = steps.collect {
      case v: graft.pipeline.VertexStep if v.vertex == "a" => v }.head
    assert(va.from.get("y").contains("x"))
  }
}
