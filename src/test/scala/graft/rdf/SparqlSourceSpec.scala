package graft.rdf

import graft.SparkSpec

/** SPARQL endpoint paging (reference rdf.py:200-424 endpoint half): the
  * fetch is injected, serving SPARQL 1.1 JSON result pages.
  */
class SparqlSourceSpec extends SparkSpec {

  private def page(rows: Seq[(String, String)]): String = {
    val bindings = rows.map { case (s, name) =>
      s"""{"s":{"type":"uri","value":"$s"},"name":{"type":"literal","value":"$name","xml:lang":"en"}}"""
    }.mkString(",")
    s"""{"head":{"vars":["s","name"]},"results":{"bindings":[$bindings]}}"""
  }

  test("pages until a short page; bindings flatten to columns") {
    val all = (0 until 5).map(i => (s"http://x/$i", s"n$i"))
    var seen = List.empty[String]
    val fetch: String => String = { q =>
      seen ::= q
      val off = "OFFSET (\\d+)".r.findFirstMatchIn(q).get.group(1).toInt
      page(all.slice(off, off + 2))
    }
    val df = SparqlSource.read(spark, fetch, "SELECT ?s ?name WHERE { ?s <n> ?name }",
      pageSize = 2)
    assert(df.count() == 5)
    assert(df.columns.sorted.toSeq == Seq("name", "s"))
    assert(seen.length == 3) // 2 + 2 + 1(short)
    assert(seen.head.contains("LIMIT 2 OFFSET 4"))
  }
}
