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
}
