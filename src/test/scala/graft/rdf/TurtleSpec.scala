package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Turtle subset parser (reference rdf.py:64-424 .ttl path): @prefix
  * expansion, prefixed names, the `a` keyword, literal suffix stripping —
  * producing the same triple frame as the N-Triples parser.
  */
class TurtleSpec extends SparkSpec {

  test("turtle parses prefixed names, a-keyword, lang/datatype literals") {
    import spark.implicits._
    val lines = Seq(
      "# a comment",
      "@prefix ex: <http://ex.org/> .",
      "@prefix foaf: <http://xmlns.com/foaf/0.1/> .",
      "",
      "ex:p1 a ex:Person .",
      "ex:p1 foaf:name \"Alice\"@en .",
      "ex:p1 ex:age \"33\"^^<http://www.w3.org/2001/XMLSchema#integer> .",
      "<http://ex.org/p2> foaf:name \"Bob\" .",
      "ex:p1 ex:knows ex:p2 ."
    ).toDF("line")
    val t = Rdf.parseTurtle(lines).collect().map(r =>
      (r.getAs[String]("s"), r.getAs[String]("p"), r.getAs[String]("o"),
        r.getAs[Boolean]("isLiteral"))).toSet
    assert(t == Set(
      ("http://ex.org/p1", Rdf.RdfType, "http://ex.org/Person", false),
      ("http://ex.org/p1", "http://xmlns.com/foaf/0.1/name", "Alice", true),
      ("http://ex.org/p1", "http://ex.org/age", "33", true),
      ("http://ex.org/p2", "http://xmlns.com/foaf/0.1/name", "Bob", true),
      ("http://ex.org/p1", "http://ex.org/knows", "http://ex.org/p2", false)))
  }

  test("turtle docs equal the N-Triples docs for the same data") {
    import spark.implicits._
    val ttl = Seq(
      "@prefix ex: <http://ex.org/> .",
      "ex:p1 ex:name \"Alice\" .",
      "ex:p1 ex:city \"rome\" .").toDF("line")
    val nt = Seq(
      "<http://ex.org/p1> <http://ex.org/name> \"Alice\" .",
      "<http://ex.org/p1> <http://ex.org/city> \"rome\" .").toDF("line")
    val a = Rdf.triplesToDocs(Rdf.parseTurtle(ttl)).collect().toSeq
    val b = Rdf.triplesToDocs(Rdf.parseNTriples(nt)).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
