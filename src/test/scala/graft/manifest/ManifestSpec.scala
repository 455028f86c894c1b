package graft.manifest

import graft.SparkSpec
import graft.model._
import graft.pipeline._
import graft.expr.FilterExpr
import graft.store.GraphStore

/** Manifest loader (reference `GraphManifest.from_config`,
  * contract/manifest.py:17-90). Fixtures below are authored in the
  * reference's YAML dialect (cf. test/config/schema/review.yaml,
  * csv-edge-weights.yaml, ticker.yaml, kg.yaml patterns).
  */
class ManifestSpec extends SparkSpec {

  test("review-style manifest: schema + vertex steps with from-maps") {
    val m = ManifestLoader.fromYamlString(
      """schema:
        |    metadata:
        |        name: review
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: author
        |                properties:
        |                -   id
        |                -   full_name
        |                -   hindex
        |                identity:
        |                -   id
        |                -   full_name
        |            -   name: field
        |                properties:
        |                -   id
        |                identity:
        |                -   id
        |        edge_config:
        |            edges:
        |            -   source: author
        |                target: field
        |                relation: belongsTo
        |ingestion_model:
        |    resources:
        |    -   name: authors
        |        pipeline:
        |        -   vertex: author
        |            from:
        |                id: author_id
        |                full_name: FullName
        |        -   vertex: field
        |            from:
        |                id: research_sector
        |bindings: {}
        |""".stripMargin)
    assert(m.name == "review")
    assert(m.schema.vertices.map(_.name) == Seq("author", "field"))
    assert(m.schema.vertex("author").identity ==
      Identity.Natural(Seq("id", "full_name")))
    assert(m.schema.edges.head.relation == "belongsTo")
    val steps = m.resource("authors").steps
    assert(steps.collect { case v: VertexStep => v }.map(_.vertex) ==
      Seq("author", "field"))
    assert(steps.head.asInstanceOf[VertexStep].from ==
      Map("id" -> "author_id", "full_name" -> "FullName"))

    // end-to-end: compile against a frame, inferred edge renders
    import spark.implicits._
    val df = Seq(("a1", "Ann", "physics"), ("a2", "Bob", "math"))
      .toDF("author_id", "FullName", "research_sector")
    val out = PipelineCompiler.compile(m.schema, m.resource("authors"), df)
    assert(out.vertex("author").count() == 2)
    assert(out.edge(EdgeKey("author", "field", "belongsTo")).count() == 2)
  }

  test("relation_field manifest routes edges by data (csv-edge-weights style)") {
    val m = ManifestLoader.fromYamlString(
      """schema:
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: company
        |                properties:
        |                -   name
        |                identity:
        |                -   name
        |        edge_config:
        |            edges:
        |            -   source: company
        |                target: company
        |                relation: owns
        |            -   source: company
        |                target: company
        |                relation: supplies
        |ingestion_model:
        |    resources:
        |    -   name: relations
        |        infer_edges: false
        |        pipeline:
        |        -   vertex: company
        |            from:
        |                name: company_a
        |            role: a
        |        -   vertex: company
        |            from:
        |                name: company_b
        |            role: b
        |        -   source: company
        |            target: company
        |            source_role: a
        |            target_role: b
        |            relation_field: relation
        |""".stripMargin)
    import spark.implicits._
    val df = Seq(("x", "y", "owns"), ("x", "z", "supplies"), ("y", "z", "owns"))
      .toDF("company_a", "company_b", "relation")
    val out = PipelineCompiler.compile(m.schema, m.resource("relations"), df)
    assert(out.edge(EdgeKey("company", "company", "owns")).count() == 2)
    assert(out.edge(EdgeKey("company", "company", "supplies")).count() == 1)
  }

  test("ticker-style: filters (foo dunders, if_then), dress transform, rename, vertex_weights") {
    val m = ManifestLoader.fromYamlString(
      """schema:
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: ticker
        |                properties:
        |                -   oftic
        |                identity:
        |                -   oftic
        |            -   name: feature
        |                properties:
        |                -   name
        |                -   value
        |                identity:
        |                -   name
        |                -   value
        |                filters:
        |                -   or:
        |                    -   if_then:
        |                        -   field: name
        |                            foo: __eq__
        |                            value: Open
        |                        -   field: value
        |                            foo: __gt__
        |                            value: 0
        |                    -   field: name
        |                        foo: __ne__
        |                        value: Open
        |        edge_config:
        |            edges:
        |            -   source: ticker
        |                target: feature
        |                relation: has
        |                properties:
        |                -   t_obs
        |ingestion_model:
        |    resources:
        |    -   name: history
        |        infer_edges: false
        |        pipeline:
        |        -   transform:
        |                call:
        |                    module: graft.util.transform
        |                    foo: round_str
        |                    params:
        |                        ndigits: 2
        |                    input:
        |                    -   Open
        |                    dress:
        |                        key: name
        |                        value: value
        |        -   transform:
        |                rename:
        |                    __ticker: oftic
        |        -   vertex: ticker
        |        -   vertex: feature
        |        -   source: ticker
        |            target: feature
        |            relation: has
        |            vertex_weights:
        |            -   name: feature
        |                fields:
        |                -   name
        |""".stripMargin)
    // vertex_weights resolved onto the schema's EdgeDef
    val ed = m.schema.edgeByKey(EdgeKey("ticker", "feature", "has"))
    assert(ed.extraWeights == Seq(VertexWeightSpec("feature", Seq("name"))))
    // filter parse: OR(IF_THEN(name==Open, value>0), name != Open)
    val f = m.schema.vertex("feature").filters.get
    assert(f == FilterExpr.Or(Seq(
      FilterExpr.IfThen(FilterExpr.eq("name", "Open"), FilterExpr.gt("value", 0L)),
      FilterExpr.neq("name", "Open"))))

    import spark.implicits._
    val df = Seq(("T1", 12.345), ("T2", -3.0)).toDF("__ticker", "Open")
    val out = PipelineCompiler.compile(m.schema, m.resource("history"), df)
    // dress melts Open → (name=Open, value=12.34 / -3.0); filter drops
    // -3.0. 12.34, not 12.35: python round() is banker's rounding on the
    // BINARY value (12.345 is stored as 12.34499…), replayed by bround
    val feats = out.vertex("feature").collect()
    assert(feats.length == 1)
    assert(feats.head.getAs[Double]("value") == 12.34)
    assert(out.vertex("ticker").count() == 2)
  }

  test("kg-style: nested descends, bare pipeline, match groups parse") {
    val m = ManifestLoader.fromYamlString(
      """schema:
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: mention
        |                properties:
        |                -   text
        |                identity:
        |                -   _key
        |            -   name: entity
        |                identity:
        |                -   _key
        |        edge_config:
        |            edges:
        |            -   source: mention
        |                target: entity
        |                relation: refers
        |ingestion_model:
        |    resources:
        |    -   name: kg
        |        infer_edge_except:
        |        -   source: entity
        |            target: entity
        |        pipeline:
        |        -   key: mentions
        |            pipeline:
        |            -   vertex: mention
        |            -   transform:
        |                    rename:
        |                        hash: _key
        |        -   key: entities
        |            pipeline:
        |            -   pipeline:
        |                -   vertex: entity
        |        -   source: mention
        |            target: entity
        |            relation: refers
        |            match_source: mentions
        |            match_target: entities
        |""".stripMargin)
    val r = m.resource("kg")
    assert(r.inferEdgeExcept == Seq(("entity", "entity")))
    val d1 = r.steps.head.asInstanceOf[Descend]
    assert(d1.key.contains("mentions"))
    // the dialect sorts siblings by actor priority (descend.py:208-216):
    // the rename (transform, 20) precedes the vertex extraction (50)
    assert(d1.steps.head.isInstanceOf[RenameStep])
    assert(d1.steps.last.isInstanceOf[VertexStep])
    val d2 = r.steps(1).asInstanceOf[Descend]
    assert(d2.steps.head.asInstanceOf[Descend].key.isEmpty) // bare descend
    val e = r.steps(2).asInstanceOf[EdgeStep]
    assert(e.sourceGroup.contains("mentions") && e.targetGroup.contains("entities"))
  }

  test("reference example 1-ingest-csv: regex connectors, two resources, golden sizes") {
    val dir = new java.io.File("target/manifest-ex1"); dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "people.csv").toPath,
      "id,name,age\n1,John H,27\n2,Mary A,33\n3,Sid M,45\n".getBytes)
    java.nio.file.Files.write(new java.io.File(dir, "departments.csv").toPath,
      "person_id,person,department\n1,John H,Sales\n2,Mary A,R&D\n3,Sid M,Support\n".getBytes)
    val mf = new java.io.File(dir, "manifest.yaml")
    java.nio.file.Files.write(mf.toPath,
      """schema:
        |    metadata:
        |        name: hr
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: person
        |                properties:
        |                -   id
        |                -   name
        |                -   age
        |                identity:
        |                -   id
        |            -   name: department
        |                properties:
        |                -   name
        |                identity:
        |                -   name
        |        edge_config:
        |            edges:
        |            -   source: person
        |                target: department
        |                relation: works_in
        |ingestion_model:
        |    resources:
        |    -   name: people
        |        pipeline:
        |        -   vertex: person
        |    -   name: departments
        |        pipeline:
        |        -   vertex: person
        |            from:
        |                id: person_id
        |                name: person
        |        -   vertex: department
        |            from:
        |                name: department
        |bindings:
        |    connectors:
        |    -   regex: "^people.*\\.csv$"
        |        sub_path: .
        |        resource_name: people
        |    -   regex: "^dep.*\\.csv$"
        |        sub_path: .
        |        resource_name: departments
        |""".stripMargin.getBytes)
    val m = ManifestLoader.load(mf.getPath)
    assert(m.bindings.exists(b => b.resource == "people" && b.regex.isDefined))
    val g = m.resources.map { r =>
      val input = graft.cli.Main.resolveInput(spark, m, r.name, dir.getPath)
      PipelineCompiler.compile(m.schema, r, input)
    }.reduceLeft(_.unionWith(_))
    // golden sizes (reference example's figs) hold AFTER the store upsert
    // merges the two resources' person observations on identity:
    // 3 people, 3 departments, 3 works_in edges
    val store = new GraphStore(freshDir(new java.io.File(dir, "store").getPath),
      m.schema, spark)
    store.write(g)
    assert(store.vertices("person").count() == 3)
    assert(store.vertices("department").count() == 3)
    assert(store.edges(EdgeKey("person", "department", "works_in")).count() == 3)
    // the people resource's ages survived the merge with the departments obs
    assert(store.vertices("person").where(org.apache.spark.sql.functions.col("age")
      .isNotNull).count() == 3)
  }

  test("end-to-end: CSV file → manifest ingest → store with golden sizes") {
    val dir = new java.io.File("target/manifest-e2e"); dir.mkdirs()
    val csv = new java.io.File(dir, "people.csv")
    java.nio.file.Files.write(csv.toPath,
      "pid,pname,city\n1,ann,berlin\n2,bob,paris\n3,cyd,berlin\n".getBytes)
    val mf = new java.io.File(dir, "manifest.yaml")
    java.nio.file.Files.write(mf.toPath,
      """schema:
        |    metadata:
        |        name: people
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: person
        |                properties:
        |                -   pname
        |                identity:
        |                -   pid
        |            -   name: city
        |                identity:
        |                -   cname
        |        edge_config:
        |            edges:
        |            -   source: person
        |                target: city
        |                relation: lives_in
        |ingestion_model:
        |    resources:
        |    -   name: people
        |        pipeline:
        |        -   vertex: person
        |        -   vertex: city
        |            from:
        |                cname: city
        |bindings:
        |    people: people.csv
        |""".stripMargin.getBytes)

    val m = ManifestLoader.load(mf.getPath)
    val input = graft.cli.Main.resolveInput(spark, m, "people", dir.getPath)
    val out = PipelineCompiler.compile(m.schema, m.resource("people"), input)
    val store = new GraphStore(freshDir(new java.io.File(dir, "store").getPath),
      m.schema, spark)
    store.write(out)
    assert(store.vertices("person").count() == 3)
    assert(store.vertices("city").count() == 2)
    assert(store.edges(EdgeKey("person", "city", "lives_in")).count() == 3)
  }
}
