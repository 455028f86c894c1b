package graft.store

import graft.SparkSpec
import graft.model.EdgeKey
import graft.graph.GraphOutput

/** graflo-backend write/read round-trip (reference backend/{writer,reader}). */
class BackendWriterSpec extends SparkSpec {

  test("writeAll produces the chunked gzip-JSONL layout readAll consumes") {
    import spark.implicits._
    val root = freshDir("target/backend-writer-spec")
    val g = GraphOutput(
      vertices = Map("person" -> Seq((1L, "ann"), (2L, "bob")).toDF("pid", "name")),
      edges = Map(EdgeKey("person", "person", "knows") ->
        Seq((1L, 2L)).toDF("src_pid", "dst_pid")))
    GrafloBackendWriter.writeAll(g, root)
    // gzip chunk files exist
    val chunks = new java.io.File(s"$root/vertices/person").listFiles()
      .filter(_.getName.endsWith(".gz"))
    assert(chunks.nonEmpty)
    val back = GrafloBackendReader.readAll(spark, root)
    assert(back.vertex("person").count() == 2)
    assert(back.edge(EdgeKey("person", "person", "knows"))
      .select("src_pid").as[Long].collect().toSeq == Seq(1L))
  }
}
