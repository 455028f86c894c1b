package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RDF/XML subset parser (reference rdf.py:42-48 maps .rdf/.xml → rdflib
  * "xml"): node elements, typed nodes, nested nodes, rdf:resource refs,
  * parseType="Resource", nodeID, literals, and the extension dispatcher.
  */
class RdfXmlSpec extends SparkSpec {

  private val xml =
    """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/">
      |  <rdf:Description rdf:about="http://ex.org/p1">
      |    <ex:name>Alice</ex:name>
      |    <ex:livesIn rdf:resource="http://ex.org/rome"/>
      |  </rdf:Description>
      |  <ex:Person rdf:about="http://ex.org/p2">
      |    <ex:name>Bob</ex:name>
      |    <ex:address rdf:parseType="Resource">
      |      <ex:city>Paris</ex:city>
      |    </ex:address>
      |    <ex:knows>
      |      <ex:Person rdf:about="http://ex.org/p3">
      |        <ex:name>Carol</ex:name>
      |      </ex:Person>
      |    </ex:knows>
      |    <ex:friend rdf:nodeID="b9"/>
      |  </ex:Person>
      |</rdf:RDF>""".stripMargin

  private def triples = Rdf.parseRdfXmlBytes(xml.getBytes("UTF-8"), "t")

  test("plain description: literal + resource") {
    assert(triples.contains(("http://ex.org/p1", "http://ex.org/name", "Alice", true)))
    assert(triples.contains(
      ("http://ex.org/p1", "http://ex.org/livesIn", "http://ex.org/rome", false)))
  }

  test("typed node element emits rdf:type") {
    assert(triples.contains(
      ("http://ex.org/p2", Rdf.RdfType, "http://ex.org/Person", false)))
  }

  test("parseType=Resource mints a blank subject holding the children") {
    val addr = triples.find(t => t._1 == "http://ex.org/p2" && t._2 == "http://ex.org/address").get
    assert(addr._3.startsWith("_:") && !addr._4)
    assert(triples.contains((addr._3, "http://ex.org/city", "Paris", true)))
  }

  test("nested node element links parent to child subject") {
    assert(triples.contains(
      ("http://ex.org/p2", "http://ex.org/knows", "http://ex.org/p3", false)))
    assert(triples.contains(("http://ex.org/p3", "http://ex.org/name", "Carol", true)))
  }

  test("rdf:nodeID reference is file-scoped (blank ids from different files must not merge)") {
    assert(triples.contains(("http://ex.org/p2", "http://ex.org/friend", "_:t-b9", false)))
  }

  test("DTDs are refused (untrusted input)") {
    val evil = """<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x "y">]><r/>"""
    intercept[Exception](Rdf.parseRdfXmlBytes(evil.getBytes("UTF-8"), "t"))
  }

  test("read dispatches by extension and round-trips through Spark") {
    val dir = java.nio.file.Files.createTempDirectory("rdfxml").toFile
    val f = new java.io.File(dir, "fixture.rdf")
    java.nio.file.Files.writeString(f.toPath, xml)
    val df = Rdf.read(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("s", "p", "o", "isLiteral"))
    assert(df.where(col("isLiteral")).count() == 4)
    val docs = Rdf.triplesToDocs(df)
    val p3 = docs.where(col("id") === "http://ex.org/p3").collect()
    assert(p3.length == 1)
    intercept[IllegalArgumentException](Rdf.read(spark, "/tmp/x.unknown"))
  }
}
