package graft

import graft.model.EdgeKey
import graft.pipeline.PipelineCompiler
import graft.store.GraphStore

/** Manifest-dialect parity against the REFERENCE's own committed fixtures:
  * the ticker end-to-end test (reference test/config/schema/ticker.yaml →
  * test/data/ticker/ticker.csv.gz → test/ref/table/ticker_sizes.yaml)
  * loads verbatim through [[graft.manifest.ManifestLoader]], runs the full
  * pipeline (dress transforms with round_str/int, parse_date_yahoo,
  * rename, schema-level feature filters, edge vertex_weights) into a live
  * [[GraphStore]], and must land the reference's exact golden collection
  * sizes — proving dialect parity against reference-committed goldens, not
  * just our own fixtures.
  */
class ReferenceGoldenSpec extends SparkSpec {

  private val refRoot = "/root/reference/test"

  private def goldenSizes(path: String): Map[String, Long] =
    scala.io.Source.fromFile(path).getLines()
      .map(_.trim).filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val Array(k, v) = l.split(":", 2)
        k.trim -> v.trim.toLong
      }.toMap

  test("reference ticker example lands its committed golden sizes") {
    assume(new java.io.File(s"$refRoot/config/schema/ticker.yaml").exists())
    val golden = goldenSizes(s"$refRoot/ref/table/ticker_sizes.yaml")
    val m = graft.manifest.ManifestLoader.load(
      s"$refRoot/config/schema/ticker.yaml")
    val df = graft.sources.FileSource.read(spark,
      s"$refRoot/data/ticker/ticker.csv.gz")
    val g = PipelineCompiler.compile(m.schema, m.resources.head, df)
    val root = freshDir("/root/repo/target/graft-ticker-golden")
    val store = new GraphStore(root, m.schema, spark)
    store.write(g)
    assert(store.vertices("ticker").count() == golden("tickers"))
    assert(store.vertices("feature").count() == golden("features"))
    val ek = m.schema.edges.map(e => EdgeKey(e.source, e.target, e.relation))
      .find(k => k.source == "ticker" && k.target == "feature").get
    assert(store.edges(ek).count() == golden("tickers_features_edges"))
  }
}
