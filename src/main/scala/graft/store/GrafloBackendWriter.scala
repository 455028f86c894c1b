package graft.store

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.graph.GraphOutput

/** Writer for the reference's chunked-file backend layout
  * (graflo/architecture/backend/{layout,writer}.py): per-collection gzip
  * JSONL chunks under `vertices/<name>/` and `edges/<src__rel__tgt>/` plus
  * the `INDEX.json` manifest — the interchange format a graflo deployment
  * reads natively. Spark's json writer produces the chunking (one part file
  * per partition = the reference's chunk files) and the gzip codec.
  *
  * The engine's own store stays parquet ([[GraphStore]] — columnar scans,
  * pushdown); this writer exists for migration paths OUT to reference-format
  * consumers, closing the read/write round-trip with
  * [[GrafloBackendReader]].
  */
object GrafloBackendWriter {

  def writeVertices(root: String, name: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").option("compression", "gzip")
      .json(s"$root/vertices/$name")

  def writeEdges(root: String, storeName: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").option("compression", "gzip")
      .json(s"$root/edges/$storeName")

  /** Write a whole GraphOutput + INDEX.json manifest. */
  def writeAll(g: GraphOutput, root: String): Unit = {
    g.vertices.foreach { case (n, df) => writeVertices(root, n, df) }
    g.edges.foreach { case (k, df) => writeEdges(root, k.storeName, df) }
    def arr(xs: Seq[String]) = xs.sorted.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    Files.createDirectories(Paths.get(root))
    Files.write(Paths.get(root, "INDEX.json"),
      s"""{"vertices":${arr(g.vertices.keys.toSeq)},"edges":${arr(g.edges.keys.map(_.storeName).toSeq)}}""".getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
