package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** SPARQL SELECT endpoint source with OFFSET/LIMIT paging — the reference's
  * endpoint half of `RdfFileDataSource` (graflo/data_source/rdf.py:200-424):
  * page the query until a short page, parse the SPARQL 1.1 JSON results
  * format, land bindings as a DataFrame. The HTTP fetch is injected
  * (`query string → response body`), same pattern as
  * [[graft.sources.ApiSource]] — unit-testable offline, swaps for a real
  * client in one line.
  */
object SparqlSource {
  private val mapper = new ObjectMapper()

  /** Run the paging loop; returns one flat JSON object per result row
    * (`{var: value}` — types/langs normalized away, as the reference does
    * when building docs).
    */
  def fetchAll(
      fetch: String => String,
      query: String,
      pageSize: Int = 1000,
      maxPages: Int = 10000
  ): Seq[String] = {
    // pagination appends its own solution modifiers — a caller-supplied
    // LIMIT/OFFSET would produce invalid SPARQL on the first page
    require(!"(?i)\\b(LIMIT|OFFSET)\\s+\\d+\\s*$".r.findFirstIn(query.trim).isDefined,
      "query must not end with its own LIMIT/OFFSET; pagination adds them")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      val paged = s"$query LIMIT $pageSize OFFSET ${page * pageSize}"
      val root = mapper.readTree(fetch(paged))
      val bindings = root.path("results").path("bindings")
      val n = if (bindings.isArray) bindings.size() else 0
      bindings.elements().asScala.foreach { b =>
        val o = mapper.createObjectNode()
        b.properties().asScala.foreach { e =>
          o.put(e.getKey, e.getValue.path("value").asText())
        }
        out += o.toString
      }
      done = n < pageSize
      page += 1
    }
    out.toSeq
  }

  /** Fetch + parse into a DataFrame (one column per SPARQL variable). */
  def read(spark: SparkSession, fetch: String => String, query: String,
      pageSize: Int = 1000): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(fetchAll(fetch, query, pageSize)))
  }
}
