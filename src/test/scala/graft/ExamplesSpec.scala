package graft

import graft.model._
import graft.pipeline._
import graft.expr.FilterExpr
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Runnable ports of the reference's examples/ directory (1-ingest-csv …
  * 18-cross-resource-identity) — each test is the graft version of one
  * example, kept compiling so EXAMPLES.md can't rot.
  */
class ExamplesSpec extends SparkSpec {

  test("example 1: ingest a CSV into a typed graph") {
    val dir = Files.createTempDirectory("ex1").toString
    Files.write(java.nio.file.Paths.get(dir, "people.csv"),
      "id,name,city\n1,ann,rome\n2,bob,oslo\n3,cyd,rome\n".getBytes)
    val df = graft.sources.FileSource.read(spark, s"$dir/people.csv")
    val schema = GraphSchema(
      vertices = Seq(
        VertexDef("person", Seq(FieldDef("name")), Identity.Natural(Seq("id"))),
        VertexDef("city", Nil, Identity.Natural(Seq("city")))),
      edges = Seq(EdgeDef("person", "city", "lives_in")))
    val res = ResourceDef("people", Seq(
      VertexStep("person"),
      VertexStep("city", from = Map("city" -> "city"), extractionScope = "mapped_only",
        lookupOnly = true)))
    val g = PipelineCompiler.compile(schema, res, df)
    assert(g.vertex("person").count() == 3)
    assert(g.edge(EdgeKey("person", "city", "lives_in")).count() == 3)
  }

  test("example 2: self-referencing edges (employee → manager, same type)") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq((1L, Some(2L)), (2L, None), (3L, Some(2L)))
      .toDF("emp_id", "manager_id")
    val schema = GraphSchema(
      vertices = Seq(VertexDef("employee", Nil, Identity.Natural(Seq("emp_id")))),
      edges = Seq(EdgeDef("employee", "employee", "reports_to")))
    val res = ResourceDef("emps", Seq(
      VertexStep("employee"),
      VertexStep("employee", from = Map("emp_id" -> "manager_id"),
        extractionScope = "mapped_only", role = Some("mgr"), lookupOnly = true),
      EdgeStep(source = "employee", target = "employee",
        targetRole = Some("mgr"), relation = "reports_to")), inferEdges = false)
    val g = PipelineCompiler.compile(schema, res, df)
    val edges = g.edge(EdgeKey("employee", "employee", "reports_to"))
      .select("src_emp_id", "dst_emp_id").as[(Long, Long)].collect().toSet
    assert(edges == Set((1L, 2L), (3L, 2L))) // null manager dropped
  }

  test("example 5: identity funnel end-to-end through the pipeline") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(("doi-1", null, "paper A"), (null, "arxiv-9", "paper B"),
      (null, null, "paper C")).toDF("doi", "arxiv", "title")
    val schema = GraphSchema(Seq(VertexDef("paper",
      Seq(FieldDef("title")),
      Identity.Funnel(Seq(
        FunnelBranch("by_doi", Seq("doi"), Seq("doi")),
        FunnelBranch("by_arxiv", Seq("arxiv"), Seq("arxiv")))))))
    val g = PipelineCompiler.compile(schema,
      ResourceDef("papers", Seq(VertexStep("paper"))), df)
    // paper C has no branch → dropped before write (_drop_unkeyed_docs)
    assert(g.vertex("paper").count() == 2)
    assert(g.vertex("paper").where(col("_id").isNull).count() == 0)
  }

  test("example 18: cross-resource identity proposal") {
    val sparkS = spark
    import sparkS.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("user_id", "val")
    val b = Seq((1L, 9.0), (3L, 8.0)).toDF("userId", "score")
    val proposals = graft.infer.CrossResourceIdentity.proposeSharedKey(
      a, b, minNameSim = 0.5, minJaccard = 0.3)
    assert(proposals.nonEmpty)
    assert(proposals.head._1 == "user_id" && proposals.head._2 == "userId")
  }

  test("example 13: relational 3NF inference then graph ingest") {
    val sparkS = spark
    import sparkS.implicits._
    import graft.infer.RelationalInference._
    val catalog = Seq(
      CatalogColumn("person", "pid", isPk = true, None),
      CatalogColumn("person", "name", isPk = false, None),
      CatalogColumn("team", "tid", isPk = true, None),
      CatalogColumn("membership", "pid", isPk = true, Some("person")),
      CatalogColumn("membership", "tid", isPk = true, Some("team")),
      CatalogColumn("membership", "since", isPk = false, None))
    val schema = infer(catalog)
    assert(schema.vertexByName.keySet == Set("person", "team"))
    assert(schema.edges.map(_.relation) == Seq("membership"))

    // ingest the inferred manifest from the "tables"
    val person = Seq((1L, "ann")).toDF("pid", "name")
    val membership = Seq((1L, 10L, "2020")).toDF("pid", "tid", "since")
    val g = PipelineCompiler.compile(schema,
        ResourceDef("p", Seq(VertexStep("person"))), person)
      .unionWith(PipelineCompiler.compile(schema,
        ResourceDef("m", Seq(
          VertexStep("person", from = Map("pid" -> "pid"),
            extractionScope = "mapped_only", lookupOnly = true),
          VertexStep("team", from = Map("tid" -> "tid"),
            extractionScope = "mapped_only", lookupOnly = true),
          EdgeStep(source = "person", target = "team", relation = "membership",
            weightFields = Seq("since"))), inferEdges = false), membership))
    val e = g.edge(EdgeKey("person", "team", "membership")).collect().head
    assert(e.getAs[String]("since") == "2020")
  }
}
