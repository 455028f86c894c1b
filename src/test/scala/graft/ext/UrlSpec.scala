package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** URL canonicalization rules + butterfly census. */
class UrlSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Url.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("scheme/host lowercase; path case preserved") {
    assert(canon("HTTP://WWW.Ex.COM/A/B") == Seq("http://www.ex.com/A/B"))
  }

  test("default ports stripped, non-default kept — per scheme") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "https://a.com:80/x", "http://a.com:8080/x") ==
      Seq("http://a.com/x", "https://a.com/x",
        "https://a.com:80/x", "http://a.com:8080/x"))
  }

  test("path normalization: dup slashes, trailing slash, empty path") {
    assert(canon(
      "http://a.com//x///y/", "http://a.com/", "http://a.com",
      "http://a.com/x/") ==
      Seq("http://a.com/x/y", "http://a.com/", "http://a.com/",
        "http://a.com/x"))
  }

  test("query: tracking params dropped, rest sorted, fragment dropped") {
    assert(canon(
      "http://a.com/x?b=2&utm_source=s&a=1#frag",
      "http://a.com/x?a=1&b=2",
      "http://a.com/x?utm_campaign=c&fbclid=z") ==
      Seq("http://a.com/x?a=1&b=2", "http://a.com/x?a=1&b=2",
        "http://a.com/x"))
  }

  test("butterflyCensus counts 4-cycles via the wedge formula") {
    import spark.implicits._
    // K_{2,2} on (a1,a2)×(b1,b2) = exactly one butterfly, 2 wedges
    // (b1<b2 per pivot); plus a pendant edge (a3,b1) adding no wedge.
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L),
      (3L, 10L)) // duplicate edge must not double-count
    val r = graft.graph.GraphAlgos.butterflyCensus(
      edges.toDF("a", "b"), "a", "b").collect().head
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("n_wedges") == 2L)
    assert(r.getAs[Long]("n_butterflies") == 1L)
    assert(r.getAs[Long]("max_copairs") == 2L)
  }
}
