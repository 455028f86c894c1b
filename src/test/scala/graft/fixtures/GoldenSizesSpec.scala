package graft.fixtures

import graft.SparkSpec
import graft.store.GrafloBackendReader
import graft.model.EdgeKey
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

/** Golden collection sizes at sf0.001 — the reference's `*_sizes.yaml` test
  * pattern (test/ref/json/community_sizes.yaml etc.): full-manifest ingest
  * must keep producing exactly these counts.
  */
class GoldenSizesSpec extends SparkSpec {

  test("full TpchGraph ingest matches golden sizes at sf0.001") {
    val g = TpchGraph.ingest(spark, "/root/testdata/sf0.001")
    val sizes = g.sizes()
    val golden = Map(
      "region" -> 5L, "nation" -> 25L, "customer" -> 150L, "supplier" -> 10L,
      "part" -> 200L, "orders" -> 1500L, "user" -> 15L, "event" -> 1000L,
      "nation__in_region__region" -> 25L,
      "customer__in_nation__nation" -> 150L,
      "supplier__in_nation__nation" -> 10L,
      "orders__placed_by__customer" -> 1500L,
      "orders__contains__part" -> 6000L,
      "part__supplied_by__supplier" -> 1905L,
      "event__by_user__user" -> 1000L)
    golden.foreach { case (k, n) =>
      assert(sizes(k) == n, s"collection $k: got ${sizes(k)}, golden $n")
    }
  }
}

class GrafloBackendReaderSpec extends SparkSpec {

  test("reads the reference's chunked gzip-JSONL layout with INDEX.json") {
    val root = Files.createTempDirectory("graflo-backend").toString
    def writeChunk(sub: String, name: String, lines: Seq[String]): Unit = {
      val dir = Files.createDirectories(java.nio.file.Paths.get(s"$root/$sub"))
      val out = new GZIPOutputStream(Files.newOutputStream(dir.resolve(name)))
      out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    }
    writeChunk("vertices/person", "chunk_000.jsonl.gz",
      Seq("""{"id": 1, "name": "ann"}""", """{"id": 2, "name": "bob"}"""))
    writeChunk("vertices/person", "chunk_001.jsonl.gz",
      Seq("""{"id": 3, "name": "cyd"}"""))
    writeChunk("edges/person__knows__person", "chunk_000.jsonl.gz",
      Seq("""{"src_id": 1, "dst_id": 2}"""))
    Files.write(java.nio.file.Paths.get(root, "INDEX.json"),
      """{"vertices":["person"],"edges":["person__knows__person"]}""".getBytes)

    val g = GrafloBackendReader.readAll(spark, root)
    assert(g.vertex("person").count() == 3) // both chunks
    assert(g.edge(EdgeKey("person", "person", "knows")).count() == 1)
  }

  test("sampler truncates cells and bounds rows") {
    import spark.implicits._
    val df = Seq((1L, "x" * 500), (2L, "short"), (3L, "short")).toDF("id", "t")
    val s = graft.infer.Sampler.sample(df, n = 2, maxCellChars = 10)
    assert(s.size == 2)
    assert(s.head("t").length == 11) // 10 + ellipsis
  }
}
