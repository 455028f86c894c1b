package graft.store

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.EdgeKey
import graft.graph.GraphOutput

/** Reader for the reference's chunked-file backend layout
  * (graflo/architecture/backend/layout.py:23-120, reader.py,
  * graflo/db/graflo_backend/connection.py:38-420): per-collection gzip JSONL
  * chunk files under `vertices/<name>/` and `edges/<src__rel__tgt>/`, with an
  * `INDEX.json` manifest. `spark.read.json` handles the chunk globs and gzip
  * transparently — the reference's chunk iterator and single-writer lock
  * have no Spark equivalent to port.
  */
object GrafloBackendReader {

  /** Parse the INDEX.json manifest: {"vertices": [...], "edges": [...]} —
    * minimal extraction without a JSON dependency beyond Jackson (bundled
    * with Spark).
    */
  private def index(root: String): (Seq[String], Seq[String]) = {
    val p = Paths.get(root, "INDEX.json")
    if (!Files.exists(p)) {
      // fall back to directory listing, like the reference's recovery path
      def ls(sub: String): Seq[String] = {
        import scala.jdk.CollectionConverters._
        val d = Paths.get(root, sub)
        if (!Files.exists(d)) Nil
        else { val s = Files.list(d); try s.iterator().asScala.map(_.getFileName.toString).toList.sorted finally s.close() }
      }
      (ls("vertices"), ls("edges"))
    } else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(Files.readAllBytes(p), "UTF-8"))
      import scala.jdk.CollectionConverters._
      def arr(k: String): Seq[String] =
        Option(node.get(k)).map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      (arr("vertices"), arr("edges"))
    }
  }

  def readVertices(spark: SparkSession, root: String, name: String): DataFrame =
    spark.read.json(s"$root/vertices/$name")

  def readEdges(spark: SparkSession, root: String, storeName: String): DataFrame =
    spark.read.json(s"$root/edges/$storeName")

  /** Load the whole backend directory into a GraphOutput. Edge directory
    * names follow `src__rel__tgt`.
    */
  def readAll(spark: SparkSession, root: String): GraphOutput = {
    val (vs, es) = index(root)
    val vertices = vs.map(n => n -> readVertices(spark, root, n)).toMap
    val edges = es.flatMap { dir =>
      dir.split("__", 3) match {
        case Array(s, r, t) => Some(EdgeKey(s, t, r) -> readEdges(spark, root, dir))
        case _              => None
      }
    }.toMap
    GraphOutput(vertices, edges)
  }
}
