package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** REST API source — the reference's `APIDataSource`
  * (graflo/data_source/api.py:1-221, api_response.py:50-281): driver-side
  * pagination (offset / cursor / carried-params strategies) with
  * records-path autodetection, then parallelize into a DataFrame. The fetch
  * function is injected (`params → body`), which keeps the pagination state
  * machine unit-testable offline and swaps cleanly for a real HTTP client.
  *
  * Scale note: API ingest is inherently driver-paced (the remote service is
  * the bottleneck); records land in an RDD via `spark.read.json(Dataset)` so
  * downstream processing is distributed. For very large APIs, shard by query
  * partition (one fetch loop per executor via mapPartitions over shard
  * params) — same state machine, executor-side.
  */
final case class PaginationSpec(
    strategy: String = "offset", // offset | cursor | carried (api.py)
    pageSize: Int = 100,
    offsetParam: String = "offset",
    limitParam: String = "limit",
    cursorParam: String = "cursor",
    cursorField: String = "next_cursor", // body field holding the next cursor
    carriedFields: Seq[String] = Nil,    // body fields re-sent as params
    recordsPath: Option[String] = None,  // autodetected when None
    maxPages: Int = 1000
)

object ApiSource {
  private val mapper = new ObjectMapper()

  /** Records-path autodetection (api_response.py: autodetect): the first
    * top-level array field — or the root itself when it is an array.
    */
  def detectRecordsPath(body: String): Option[String] = {
    val root = mapper.readTree(body)
    if (root.isArray) Some("")
    else root.properties().asScala.collectFirst {
      case e if e.getValue.isArray => e.getKey
    }
  }

  private def records(root: JsonNode, path: String): Seq[JsonNode] = {
    val node = if (path.isEmpty) root else root.path(path)
    if (node.isArray) node.elements().asScala.toSeq else Nil
  }

  /** Run the pagination state machine to exhaustion:
    *  - offset: advance by page size until a short/empty page
    *    (`has_more_pages`/`next_offset_value`, api_response.py:168,195);
    *  - cursor: follow `cursorField` until absent (`next_cursor_value`:209);
    *  - carried: re-send selected body fields as params until empty page.
    * Returns raw record JSON strings.
    */
  def fetchAll(fetch: Map[String, String] => String, spec: PaginationSpec): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var params = Map.empty[String, String]
    var page = 0
    var done = false
    var detectedPath: Option[String] = spec.recordsPath
    while (!done && page < spec.maxPages) {
      val pageParams = spec.strategy match {
        case "offset" => params ++ Map(
          spec.offsetParam -> (page * spec.pageSize).toString,
          spec.limitParam -> spec.pageSize.toString)
        case _ => params
      }
      val body = fetch(pageParams)
      val root = mapper.readTree(body)
      if (detectedPath.isEmpty) detectedPath = detectRecordsPath(body)
      val recs = records(root, detectedPath.getOrElse(""))
      out ++= recs.map(_.toString)
      page += 1
      spec.strategy match {
        case "offset" => done = recs.size < spec.pageSize
        case "cursor" =>
          val next = root.path(spec.cursorField)
          if (next.isMissingNode || next.isNull || next.asText.isEmpty) done = true
          else params = Map(spec.cursorParam -> next.asText)
        case "carried" =>
          val carried = spec.carriedFields.flatMap { f =>
            val v = root.path(f)
            if (v.isMissingNode || v.isNull) None else Some(f -> v.asText)
          }.toMap
          // no records OR no continuation fields = end of data; resetting to
          // empty params would re-fetch page 1 in a loop
          if (recs.isEmpty || carried.isEmpty) done = true
          else params = carried
        case other => throw new IllegalArgumentException(s"unknown strategy: $other")
      }
    }
    out.toSeq
  }

  /** Fetch + parse into a DataFrame (schema inferred from the records). */
  def read(spark: SparkSession, fetch: Map[String, String] => String,
      spec: PaginationSpec = PaginationSpec()): DataFrame = {
    import spark.implicits._
    val recs = fetchAll(fetch, spec)
    spark.read.json(spark.createDataset(recs))
  }
}
