package graft

/** The `plan-migration` CLI subcommand (reference pyproject script
  * `migrate_schema`, cli/migrate_schema.py `plan`): diff two manifest
  * YAMLs, order ops by structural dependency, gate risk by default.
  */
class CliPlanSpec extends SparkSpec {

  private def write(path: String, text: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      text.getBytes("UTF-8")): Unit

  test("plan-migration prints ordered runnable ops and gates risk") {
    val dir = freshDir("target/cli-plan")
    new java.io.File(dir).mkdirs()
    write(s"$dir/from.yaml",
      """schema:
        |    metadata:
        |        name: v1
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: person
        |                properties: [name]
        |                identity: [id]
        |            -   name: legacy
        |                identity: [id]
        |        edge_config:
        |            edges: []
        |""".stripMargin)
    write(s"$dir/to.yaml",
      """schema:
        |    metadata:
        |        name: v2
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: person
        |                properties: [name, email]
        |                identity: [id]
        |            -   name: company
        |                identity: [id]
        |        edge_config:
        |            edges:
        |            -   source: person
        |                target: company
        |                relation: works_at
        |""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli.Main.run(spark, List("plan-migration", s"$dir/from.yaml", s"$dir/to.yaml"))
    }
    val text = out.toString("UTF-8")
    // adds (low) are runnable; the legacy-vertex removal (high) is blocked
    assert(text.contains("Runnable operations:"))
    assert(text.contains("Blocked operations:"))
    assert(text.contains("blocked by default"))
    assert(text.contains("AddVertex") && text.contains("company"))
    assert(text.contains("RemoveVertex") && text.contains("legacy"))
    // adds come before edge adds in the printed order
    val iVertex = text.indexOf("AddVertex")
    val iEdge = text.indexOf("AddEdge")
    assert(iVertex >= 0 && iEdge > iVertex)

    // --allow-high-risk moves the removal into the runnable set
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      cli.Main.run(spark, List("plan-migration", s"$dir/from.yaml",
        s"$dir/to.yaml", "--allow-high-risk"))
    }
    val text2 = out2.toString("UTF-8")
    assert(text2.contains("Blocked: 0"))
    assert(!text2.contains("blocked by default"))
  }
}
