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

  test("reference ibes example lands its committed cast-level golden sizes") {
    // ref/cast/ibes_sizes.yaml is the ASSEMBLY contract (test_caster.py
    // level-2: cast + pick_unique whole-dict dedup, before any DB write) —
    // exactly the plane PipelineCompiler implements. The ibes pipeline
    // lists its vertex steps BEFORE the transforms that produce their
    // fields, so this golden also locks the reference's sibling-actor
    // priority sort (descend.py:208-216). The db-ingest golden
    // (ref/table/ibes_sizes.yaml) additionally bakes in ArangoDB
    // upsert-on-partial-null behavior and is not asserted here.
    assume(new java.io.File(s"$refRoot/config/schema/ibes.yaml").exists())
    val golden = goldenSizes(s"$refRoot/ref/cast/ibes_sizes.yaml")
    val m = graft.manifest.ManifestLoader.load(
      s"$refRoot/config/schema/ibes.yaml")
    // the manifest declares `encoding: ISO-8859-1` for this feed
    val df = spark.read.option("header", "true")
      .option("encoding", "ISO-8859-1")
      .csv(s"$refRoot/data/ibes/ibes.csv.gz")
    val g = PipelineCompiler.compile(m.schema, m.resources.head, df)
    // identity-merged vertex frames match the dict-level dedup directly
    assert(g.vertex("ticker").count() == golden("ticker"))
    assert(g.vertex("agency").count() == golden("agency"))
    assert(g.vertex("analyst").count() == golden("analyst"))
    assert(g.vertex("recommendation").count() == golden("recommendation"))
    // blank vertices carry minted ids pre-write; the cast golden dedups the
    // PROPERTY dicts (keys are minted later, db_writer.py:240-276)
    assert(g.vertex("publication")
      .select("datetime_review", "datetime_announce").distinct().count() ==
      golden("publication"))
    // the explicit analyst→agency edge (with its document-scoped
    // publication vertex_weights) whole-dict dedups to the golden
    val ek = m.schema.edges.map(e => EdgeKey(e.source, e.target, e.relation))
      .find(k => k.source == "analyst" && k.target == "agency").get
    assert(g.edge(ek).distinct().count() == golden("analyst->agency->None"))
  }

  test("reference kg example lands its committed cast-level golden sizes") {
    // ref/cast/kg_sizes.yaml: assembly + pick_unique whole-dict dedup over
    // the declared fields — identity-merged vertices land the same counts.
    // The kg pipeline exercises nested descends, a bare descend inside
    // `triple`, match/match_source/match_target location groups, edge
    // identities with key-set form, and infer_edge_except — the deepest
    // dialect surface the reference ships.
    assume(new java.io.File(s"$refRoot/config/schema/kg.yaml").exists())
    val golden = goldenSizes(s"$refRoot/ref/cast/kg_sizes.yaml")
    val m = graft.manifest.ManifestLoader.load(s"$refRoot/config/schema/kg.yaml")
    val df = graft.sources.FileSource.read(spark,
      s"$refRoot/data/kg/kg.json.gz", format = Some("json"))
    val g = PipelineCompiler.compile(m.schema, m.resource("kg"), df)
    assert(g.vertex("publication").count() == golden("publication"))
    assert(g.vertex("mention").count() == golden("mention"))
    assert(g.vertex("entity").count() == golden("entity"))
    def edge(src: String, dst: String) =
      g.edges.collectFirst { case (k, e) if k.source == src && k.target == dst => e }
    // identities [[_role]] → assembly dedup on endpoints + _role
    assert(edge("mention", "mention").get.count() ==
      golden("mention->mention->None"))
    // identity-less edges dedup whole-dict at cast (pick_unique)
    assert(edge("mention", "entity").get.distinct().count() ==
      golden("mention->entity->None"))
    assert(edge("publication", "mention").get.distinct().count() ==
      golden("publication->mention->None"))
    // entity→entity is excluded from inference and has no explicit step
    assert(edge("entity", "entity").map(_.count()).getOrElse(0L) == 0L)
  }

  test("reference oa-institution example lands its committed golden sizes") {
    // ref/db/oa-institution_sizes.yaml: named `transforms:` declarations
    // referenced via `use:`, split_keep_part with a NEGATIVE keep, a
    // dynamic relation_field edge with NO declared edge types, and a
    // same-type edge whose one-sided match_target selects the descended
    // observations against the top-level ones.
    assume(new java.io.File(s"$refRoot/config/schema/oa-institution.yaml").exists())
    val golden = goldenSizes(s"$refRoot/ref/db/oa-institution_sizes.yaml")
    val m = graft.manifest.ManifestLoader.load(
      s"$refRoot/config/schema/oa-institution.yaml")
    val df = graft.sources.FileSource.read(spark,
      s"$refRoot/data/oa-institution/oa.institutions.json", format = Some("json"))
    val g = PipelineCompiler.compile(m.schema, m.resource("institutions"), df)
    assert(g.vertex("institution").count() == golden("institutions"))
    val edges = g.edges.collect {
      case (k, e) if k.source == "institution" && k.target == "institution" => e
    }
    assert(edges.map(_.distinct().count()).sum ==
      golden("institutions->institutions->None"))
  }
}
