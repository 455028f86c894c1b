package graft.pipeline

import graft.SparkSpec
import graft.model._
import graft.graph.GraphOutput
import org.apache.spark.sql.functions._

class CompilerSpec extends SparkSpec {

  private def sch(vs: Seq[VertexDef], es: Seq[EdgeDef] = Nil) = GraphSchema(vs, es)

  test("vertex projection: from-map rename, full vs mapped_only scope, filters") {
    import spark.implicits._
    val df = Seq((1L, "a", 5.0), (2L, "b", -1.0)).toDF("pk", "nm", "bal")
    val schema = sch(Seq(VertexDef("p",
      Seq(FieldDef("name"), FieldDef("bal")), Identity.Natural(Seq("id")))))
    val res = ResourceDef("r", Seq(VertexStep("p",
      from = Map("id" -> "pk", "name" -> "nm"),
      filters = Some(FilterExpr0.gt("bal", 0)))))
    val out = PipelineCompiler.compile(schema, res, df)
    val rows = out.vertex("p").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("id") == 1L && r.getAs[String]("name") == "a"
      && r.getAs[Double]("bal") == 5.0) // bal passed through (full scope)
  }

  test("router fans out by data value with type_map renames") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "z")).toDF("id", "t")
    val schema = sch(Seq(
      VertexDef("vx", Nil, Identity.Natural(Seq("id"))),
      VertexDef("vy", Nil, Identity.Natural(Seq("id")))))
    val res = ResourceDef("r", Seq(VertexRouterStep("t",
      typeMap = Map("x" -> "vx", "y" -> "vy"))))
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.vertex("vx").count() == 2)
    assert(out.vertex("vy").count() == 1)
    assert(!out.vertices.contains("vz")) // unmapped value 'z' routed nowhere
  }

  test("descend into array of structs with PAIR edge back to root (product)") {
    import spark.implicits._
    val df = Seq(
      (10L, Seq(("p1", 1), ("p2", 2))),
      (20L, Seq(("p3", 3)))
    ).toDF("oid", "items")
      .withColumn("items", org.apache.spark.sql.functions.transform(col("items"),
        x => struct(x.getField("_1").as("sku"), x.getField("_2").as("qty"))))
    val schema = sch(
      Seq(VertexDef("order", Nil, Identity.Natural(Seq("oid"))),
        VertexDef("item", Seq(FieldDef("qty")), Identity.Natural(Seq("sku")))),
      Seq(EdgeDef("order", "item", "has")))
    val res = ResourceDef("r", Seq(
      VertexStep("order"),
      Descend(Some("items"), steps = Seq(VertexStep("item")))))
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.vertex("item").count() == 3)
    val edges = out.edge(EdgeKey("order", "item", "has"))
      .select("src_oid", "dst_sku").as[(Long, String)].collect().toSet
    assert(edges == Set((10L, "p1"), (10L, "p2"), (20L, "p3")))
  }

  test("same-bucket auto casting: anchor pairs first item with the rest") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b", "c")), (2L, Seq("x"))).toDF("gid", "members")
    val schema = sch(Seq(VertexDef("m", Nil, Identity.Natural(Seq("name")))),
      Seq(EdgeDef("m", "m", "together")))
    val res = ResourceDef("r", Seq(
      Descend(Some("members"), steps = Seq(
        VertexStep("m", from = Map("name" -> "_value"), extractionScope = "mapped_only"))),
      EdgeStep(source = "m", target = "m", relation = "together")), inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    val pairs = out.edge(EdgeKey("m", "m", "together"))
      .select("src_name", "dst_name").as[(String, String)].collect().toSet
    // the reference's single-group anchor split (edge_render.py:196-207):
    // first location × rest — (b, c) is NOT emitted; gid=2 singleton → none
    assert(pairs == Set(("a", "b"), ("a", "c")))
  }

  test("explicit combinations casting keeps the full unordered-pair join") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b", "c"))).toDF("gid", "members")
    val schema = sch(Seq(VertexDef("m", Nil, Identity.Natural(Seq("name")))),
      Seq(EdgeDef("m", "m", "together")))
    val res = ResourceDef("r", Seq(
      Descend(Some("members"), steps = Seq(
        VertexStep("m", from = Map("name" -> "_value"), extractionScope = "mapped_only"))),
      EdgeStep(source = "m", target = "m", relation = "together",
        casting = "combinations")), inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    val pairs = out.edge(EdgeKey("m", "m", "together"))
      .select("src_name", "dst_name").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("dynamic edges: relation from a data field with relation_map and strict types") {
    import spark.implicits._
    val df = Seq(("s1", "t1", "likes"), ("s2", "t2", "hates"), ("s3", "t3", "unknown"))
      .toDF("sid", "tid", "rel")
    val schema = sch(
      Seq(VertexDef("a", Nil, Identity.Natural(Seq("aid"))),
        VertexDef("b", Nil, Identity.Natural(Seq("bid")))),
      Seq(EdgeDef("a", "b", "LIKES"), EdgeDef("a", "b", "hates")))
    val res = ResourceDef("r", Seq(
      VertexStep("a", from = Map("aid" -> "sid"), extractionScope = "mapped_only", lookupOnly = true),
      VertexStep("b", from = Map("bid" -> "tid"), extractionScope = "mapped_only", lookupOnly = true),
      EdgeStep(source = "a", target = "b", relationField = Some("rel"),
        relationMap = Map("likes" -> "LIKES"))), inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.edge(EdgeKey("a", "b", "LIKES")).count() == 1)
    assert(out.edge(EdgeKey("a", "b", "hates")).count() == 1)
    // 'unknown' passes no declared edge → dropped (strict_edge_types)
    assert(out.edges.values.map(_.count()).sum == 2)
  }

  test("edge inference emits declared edges when both endpoints were produced") {
    import spark.implicits._
    val df = Seq((1L, 100L)).toDF("cid", "nid")
    val schema = sch(
      Seq(VertexDef("c", Nil, Identity.Natural(Seq("cid"))),
        VertexDef("n", Nil, Identity.Natural(Seq("nid")))),
      Seq(EdgeDef("c", "n", "in")))
    val res = ResourceDef("r", Seq(VertexStep("c"), VertexStep("n", lookupOnly = true)))
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.edge(EdgeKey("c", "n", "in")).count() == 1)
  }

  test("cast step applies strict-allowlist type casts; uint nulls negatives") {
    import spark.implicits._
    val df = Seq(("42", "3.5", "7"), ("1", "2.0", "-5")).toDF("a", "b", "u")
    val schema = sch(Seq(VertexDef("v",
      Seq(FieldDef("a"), FieldDef("b"), FieldDef("u")), Identity.Natural(Seq("a")))))
    val res = ResourceDef("r", Seq(
      CastStep(Map("a" -> "int", "b" -> "double", "u" -> "uint")),
      VertexStep("v")))
    val out = PipelineCompiler.compile(schema, res, df)
    val f = out.vertex("v").schema
    assert(f("a").dataType.typeName == "long")
    assert(f("b").dataType.typeName == "double")
    val us = out.vertex("v").orderBy("a").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
    assert(us.toSeq == Seq(None, Some(7L))) // -5 nulled, 7 kept (ordered by a: 1, 42)
  }

  test("any_key descend over a multi-entry map fans out with the key as data") {
    import spark.implicits._
    val df = Seq((1L, Map("open" -> "10.5", "close" -> "11.0")),
      (2L, Map("open" -> "7.0"))).toDF("tick_id", "prices")
    val schema = sch(
      Seq(VertexDef("tick", Nil, Identity.Natural(Seq("tick_id"))),
        VertexDef("quote", Nil, Identity.Natural(Seq("kind", "px")))),
      Seq(EdgeDef("tick", "quote", "quoted")))
    val res = ResourceDef("r", Seq(
      VertexStep("tick", lookupOnly = true),
      Descend(Some("prices"), anyKey = true, steps = Seq(
        VertexStep("quote", from = Map("kind" -> "_key", "px" -> "_value"),
          extractionScope = "mapped_only", lookupOnly = true))),
      EdgeStep(source = "tick", target = "quote", relation = "quoted")),
      inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    val edges = out.edge(EdgeKey("tick", "quote", "quoted"))
      .select("src_tick_id", "dst_kind", "dst_px").as[(Long, String, String)]
      .collect().toSet
    assert(edges == Set((1L, "open", "10.5"), (1L, "close", "11.0"), (2L, "open", "7.0")))
  }

  test("edge-inference selectors: only/except restrict inferred pairs") {
    import spark.implicits._
    val df = Seq((1L, 10L, 100L)).toDF("aid", "bid", "cid")
    val schema = sch(
      Seq(VertexDef("a", Nil, Identity.Natural(Seq("aid"))),
        VertexDef("b", Nil, Identity.Natural(Seq("bid"))),
        VertexDef("c", Nil, Identity.Natural(Seq("cid")))),
      Seq(EdgeDef("a", "b", "ab"), EdgeDef("a", "c", "ac")))
    val steps = Seq(VertexStep("a"), VertexStep("b", lookupOnly = true),
      VertexStep("c", lookupOnly = true))
    val only = PipelineCompiler.compile(schema,
      ResourceDef("r", steps, inferEdgeOnly = Seq(("a", "b"))), df)
    assert(only.edges.keySet == Set(EdgeKey("a", "b", "ab")))
    val except = PipelineCompiler.compile(schema,
      ResourceDef("r", steps, inferEdgeExcept = Seq(("a", "b"))), df)
    assert(except.edges.keySet == Set(EdgeKey("a", "c", "ac")))
  }

  test("dropTrivialFields nulls empty strings before extraction") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "x")).toDF("id", "s")
    val schema = sch(Seq(VertexDef("v", Seq(FieldDef("s")), Identity.Natural(Seq("id")))))
    val out = PipelineCompiler.compile(schema,
      ResourceDef("r", Seq(VertexStep("v")), dropTrivialFields = true), df)
    val m = out.vertex("v").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m == Map(1L -> None, 2L -> Some("x")))
  }

  test("multi-link edge step emits several edges from one flat row") {
    import spark.implicits._
    val df = Seq((1L, 10L, 100L)).toDF("oid", "bid", "sid")
    val schema = sch(
      Seq(VertexDef("order", Nil, Identity.Natural(Seq("oid"))),
        VertexDef("buyer", Nil, Identity.Natural(Seq("bid"))),
        VertexDef("seller", Nil, Identity.Natural(Seq("sid")))),
      Seq(EdgeDef("order", "buyer", "bought_by"), EdgeDef("order", "seller", "sold_by")))
    val res = ResourceDef("r", Seq(
      VertexStep("order", lookupOnly = true),
      VertexStep("buyer", lookupOnly = true),
      VertexStep("seller", lookupOnly = true),
      MultiEdgeStep(Seq(
        EdgeStep(source = "order", target = "buyer", relation = "bought_by"),
        EdgeStep(source = "order", target = "seller", relation = "sold_by")))),
      inferEdges = false)
    val out = PipelineCompiler.compile(schema, res, df)
    assert(out.edge(EdgeKey("order", "buyer", "bought_by")).count() == 1)
    assert(out.edge(EdgeKey("order", "seller", "sold_by")).count() == 1)
  }

  test("manifest dialect sorts sibling actors by type priority: transforms " +
      "run before vertex extraction regardless of listed order") {
    import spark.implicits._
    // reference _NodeTypePriority (descend.py:208-216): ibes.yaml lists
    // vertex steps before the renames that produce their identity fields.
    // This is a YAML-dialect normalization — the programmatic Scala API
    // stays sequential (it can descend into transform-produced keys).
    val df = Seq(("k1", "alpha"), ("k2", "beta")).toDF("RAW_KEY", "RAW_VAL")
    val m = graft.manifest.ManifestLoader.fromYamlString(
      """schema:
        |    metadata:
        |        name: prio-demo
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: item
        |                properties:
        |                -   val
        |                identity:
        |                -   key
        |ingestion_model:
        |    resources:
        |    -   name: r
        |        pipeline:
        |        -   vertex: item
        |        -   transform:
        |                rename:
        |                    RAW_KEY: key
        |                    RAW_VAL: val
        |""".stripMargin)
    val out = PipelineCompiler.compile(m.schema, m.resources.head, df)
    val rows = out.vertex("item").orderBy("key").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[String]("key") == "k1")
    assert(rows.head.getAs[String]("val") == "alpha")
  }

  test("merge across repeated identities is order-sensitive last-wins") {
    import spark.implicits._
    val df = Seq((1L, "first"), (1L, "second")).toDF("k", "v")
    val schema = sch(Seq(VertexDef("v", Seq(FieldDef("v")), Identity.Natural(Seq("k")))))
    val res = ResourceDef("r", Seq(VertexStep("v")))
    val out = PipelineCompiler.compile(schema, res, df)
    val rows = out.vertex("v").collect()
    assert(rows.length == 1)
    // NOTE: both rows are separate documents; the later (larger _row_id) wins
    assert(rows.head.getAs[String]("v") == "second")
  }
}

/** avoid name clash with scalatest's === on eq/gt helpers */
private object FilterExpr0 {
  def gt(f: String, v: Any): graft.expr.FilterExpr = graft.expr.FilterExpr.gt(f, v)
}
