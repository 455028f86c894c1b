package graft

/** The `manifest-to-rdf` / `rdf-to-manifest` CLI subcommands (reference
  * pyproject scripts `manifest_to_rdf` / `rdf_to_manifest`): a manifest
  * serialized to an OWL/RDFS TBox and re-inferred must round-trip its
  * schema, all through the CLI faces.
  */
class CliRdfSpec extends SparkSpec {

  test("manifest → RDF → manifest round-trips the schema through the CLI") {
    val dir = freshDir("target/cli-rdf")
    new java.io.File(dir).mkdirs()
    val manifestPath = s"$dir/m.yaml"
    java.nio.file.Files.write(java.nio.file.Paths.get(manifestPath),
      """schema:
        |    metadata:
        |        name: rt-demo
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: Person
        |                properties:
        |                -   name
        |                identity:
        |                -   id
        |            -   name: City
        |                identity:
        |                -   id
        |        edge_config:
        |            edges:
        |            -   source: Person
        |                target: City
        |                relation: livesIn
        |""".stripMargin.getBytes("UTF-8"))
    val ntPath = s"$dir/schema.nt"
    val backPath = s"$dir/back.yaml"
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli.Main.run(spark, List("manifest-to-rdf", manifestPath, ntPath))
      cli.Main.run(spark, List("rdf-to-manifest", ntPath, backPath))
    }
    assert(out.toString.contains("\"triples\""))
    val back = graft.manifest.ManifestLoader.load(backPath)
    assert(back.schema.vertexByName.keySet == Set("Person", "City"))
    assert(back.schema.vertex("Person").properties.map(_.name) == Seq("name"))
    assert(back.schema.edges.map(e => (e.source, e.target, e.relation)) ==
      Seq(("Person", "City", "livesIn")))
  }

  test("semantics blocks survive the RDF round trip (gf: meta-ontology 1.4.0)") {
    // vertex/edge semantics (iri / exact_match / synonyms) and the
    // field-only unit ride as gf:semanticIri, skos:exactMatch,
    // skos:altLabel, gf:unit triples (reference rdf/serializer.py
    // _emit_semantics) and parse back through inferSchema
    import graft.model._
    val schema = GraphSchema(
      Seq(
        VertexDef("Person", Seq(FieldDef("height",
          Some(FieldType.FloatT),
          semantics = Some(Semantics(iri = Some("https://schema.org/height"),
            unit = Some("cm"))))),
          Identity.Natural(Seq("id")),
          semantics = Some(Semantics(
            iri = Some("https://schema.org/Person"),
            exactMatch = Seq("http://xmlns.com/foaf/0.1/Person"),
            synonyms = Seq("human", "individual")))),
        VertexDef("City", Nil, Identity.Natural(Seq("id")))),
      Seq(EdgeDef("Person", "City", "livesIn",
        semantics = Some(Semantics(iri = Some("https://schema.org/homeLocation"))))))
    val nt = rdf.Rdf.schemaToNTriples(schema)
    assert(nt.exists(_.contains(
      "<https://ontology.growgraph.dev/graflo/semanticIri> <https://schema.org/Person>")))
    assert(nt.exists(_.contains(
      "<http://www.w3.org/2004/02/skos/core#altLabel> \"human\"")))
    assert(nt.exists(_.contains(
      "<https://ontology.growgraph.dev/graflo/unit> \"cm\"")))
    import spark.implicits._
    val inferred = rdf.Rdf.inferSchema(rdf.Rdf.parseNTriples(nt.toDF("line")))
    val p = inferred.vertex("Person")
    assert(p.semantics.flatMap(_.iri).contains("https://schema.org/Person"))
    assert(p.semantics.map(_.exactMatch).getOrElse(Nil) ==
      Seq("http://xmlns.com/foaf/0.1/Person"))
    assert(p.semantics.map(_.synonyms).getOrElse(Nil) == Seq("human", "individual"))
    assert(p.properties.head.semantics.flatMap(_.unit).contains("cm"))
    assert(inferred.edges.head.semantics.flatMap(_.iri)
      .contains("https://schema.org/homeLocation"))
  }

  test("the loader rejects unit on vertex/edge semantics (field-only)") {
    intercept[IllegalArgumentException] {
      graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata: {name: bad}
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: a
          |                properties: [x]
          |                identity: [x]
          |        edge_config:
          |            edges:
          |            -   source: a
          |                target: a
          |                relation: r
          |                semantics: {unit: kg}
          |ingestion_model:
          |    resources: [{name: r, pipeline: [{vertex: a}]}]
          |""".stripMargin)
    }
  }
}
