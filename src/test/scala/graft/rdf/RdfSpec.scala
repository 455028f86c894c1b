package graft.rdf

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.functions._

class RdfSpec extends SparkSpec {

  private lazy val ntriples = {
    import spark.implicits._
    Seq(
      """<http://ex.org/Person> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> .""",
      """<http://ex.org/City> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#Class> .""",
      """<http://ex.org/livesIn> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#ObjectProperty> .""",
      """<http://ex.org/livesIn> <http://www.w3.org/2000/01/rdf-schema#domain> <http://ex.org/Person> .""",
      """<http://ex.org/livesIn> <http://www.w3.org/2000/01/rdf-schema#range> <http://ex.org/City> .""",
      """<http://ex.org/name> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/2002/07/owl#DatatypeProperty> .""",
      """<http://ex.org/name> <http://www.w3.org/2000/01/rdf-schema#domain> <http://ex.org/Person> .""",
      """<http://ex.org/p1> <http://ex.org/name> "Alice" .""",
      """<http://ex.org/p1> <http://ex.org/livesIn> <http://ex.org/rome> .""",
      """<http://ex.org/p1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Person> ."""
    ).toDF("line")
  }

  test("N-Triples parse: IRIs and literals") {
    val t = Rdf.parseNTriples(ntriples)
    assert(t.count() == 10)
    val lit = t.where(col("isLiteral")).collect()
    assert(lit.length == 1 && lit.head.getAs[String]("o") == "Alice")
  }

  test("triples group per subject into documents; multi-valued predicates collect") {
    val sparkS = spark
    import sparkS.implicits._
    val extra = ntriples.union(
      Seq("""<http://ex.org/p1> <http://ex.org/livesIn> <http://ex.org/oslo> .""").toDF("line"))
    val docs = Rdf.triplesToDocs(Rdf.parseNTriples(extra))
    val p1 = docs.where(col("id") === "http://ex.org/p1")
      .select("props").collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(p1("name").toSeq == Seq("Alice"))
    assert(p1("livesIn").toSeq == Seq("http://ex.org/oslo", "http://ex.org/rome"))
  }

  test("manifest↔RDF round-trip: serialize then re-infer yields the same schema") {
    val sparkS = spark
    import sparkS.implicits._
    val schema = GraphSchema(
      vertices = Seq(
        VertexDef("Person", Seq(FieldDef("name")), Identity.Natural(Seq("id"))),
        VertexDef("City", Nil, Identity.Natural(Seq("id")))),
      edges = Seq(EdgeDef("Person", "City", "livesIn")))
    val lines = Rdf.schemaToNTriples(schema).toDF("line")
    val back = Rdf.inferSchema(Rdf.parseNTriples(lines))
    assert(back.vertexByName.keySet == schema.vertexByName.keySet)
    assert(back.vertex("Person").properties.map(_.name) == Seq("name"))
    assert(back.edges.map(_.key) == schema.edges.map(_.key))
  }

  test("OWL TBox inference: Class→vertex, ObjectProperty→edge, DatatypeProperty→field") {
    val schema = Rdf.inferSchema(Rdf.parseNTriples(ntriples))
    assert(schema.vertexByName.keySet == Set("Person", "City"))
    assert(schema.vertex("Person").properties.map(_.name) == Seq("name"))
    assert(schema.edges.map(_.key) == Seq(EdgeKey("Person", "City", "livesIn")))
  }
}

class ApiSourceSpec extends SparkSpec {
  import graft.sources.{ApiSource, PaginationSpec}

  test("carried pagination stops when continuation fields disappear") {
    var calls = 0
    val fetch = (params: Map[String, String]) => {
      calls += 1
      if (params.isEmpty) """{"items":[{"id":0}],"next_token":"t1"}"""
      else """{"items":[{"id":1}]}""" // records but NO continuation → end
    }
    val recs = ApiSource.fetchAll(fetch,
      PaginationSpec(strategy = "carried", carriedFields = Seq("next_token")))
    assert(recs.size == 2 && calls == 2) // no page-1 replay loop
  }

  test("offset pagination exhausts on a short page") {
    // fake API: 5 records total, page size 2
    val fetch = (params: Map[String, String]) => {
      val off = params("offset").toInt
      val recs = (off until math.min(off + 2, 5)).map(i => s"""{"id":$i}""")
      s"""{"items":[${recs.mkString(",")}]}"""
    }
    val recs = ApiSource.fetchAll(fetch, PaginationSpec(strategy = "offset", pageSize = 2))
    assert(recs.size == 5)
  }

  test("cursor pagination follows next_cursor until absent") {
    val pages = Map(
      "" -> """{"items":[{"id":0}],"next_cursor":"c1"}""",
      "c1" -> """{"items":[{"id":1}],"next_cursor":"c2"}""",
      "c2" -> """{"items":[{"id":2}]}""")
    val fetch = (params: Map[String, String]) => pages(params.getOrElse("cursor", ""))
    val recs = ApiSource.fetchAll(fetch, PaginationSpec(strategy = "cursor"))
    assert(recs.size == 3)
  }

  test("records-path autodetection + DataFrame materialization") {
    assert(ApiSource.detectRecordsPath("""{"meta":1,"rows":[{"a":1}]}""").contains("rows"))
    assert(ApiSource.detectRecordsPath("""[{"a":1}]""").contains(""))
    val fetch = (_: Map[String, String]) => """{"rows":[{"a":1},{"a":2}]}"""
    val df = ApiSource.read(spark, fetch, PaginationSpec(strategy = "cursor",
      cursorField = "missing"))
    assert(df.count() == 2 && df.columns.contains("a"))
  }
}
