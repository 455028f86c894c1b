package graft

import org.apache.spark.sql.functions._

import graft.pipeline.PipelineCompiler
import graft.sources.FileSource

/** Round-6 reference-golden ports: the remaining reference-committed
  * manifests with data fixtures run VERBATIM through the manifest loader +
  * pipeline compiler, asserted against golden numbers produced by the
  * reference's own code on its own committed fixtures
  * (`test/config/schema/{debian-eco,objects-relations,csv-edge-weights,
  * review}.yaml` + `test/data/...`; counts cross-checked against the
  * reference's committed test assertions where they exist —
  * test/architecture/test_actor.py:141-166 for the dependency-relation
  * histogram, test/routing/test_objects_relations.py:49-146 for the
  * router/dynamic-edge counts, test/architecture/test_csv_edge_weights.py
  * for one-edge-per-row + direct weights, test/db/neo4js/test_ingest.py:33
  * for the 374 authors).
  *
  * Note: the reference also commits `test/ref/json/{community, freshcaller,
  * kg_v2, kg_v3, kg_v3b, lake_odds, wos}_sizes.yaml` — those goldens are
  * ORPHANED upstream (no `<mode>.yaml` manifest exists under
  * test/config/schema/ for any of them, and mostly no data either), so no
  * dialect-parity port is possible; recorded in DIVERGENCES.md.
  */
class ReferenceGoldenR6Spec extends SparkSpec {

  private val refRoot = "/root/reference/test"

  private def relationHistogram(
      edges: Seq[org.apache.spark.sql.DataFrame],
      cols: Seq[String]): Map[String, Long] =
    edges.map(_.select(cols.map(col): _*).distinct()
        .groupBy("relation").count())
      .reduceLeft(_.unionByName(_))
      .groupBy("relation").agg(sum("count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("reference debian-eco package resource lands reference-executed goldens") {
    assume(new java.io.File(s"$refRoot/config/schema/debian-eco.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(
      s"$refRoot/config/schema/debian-eco.yaml")
    val df = FileSource.read(spark, s"$refRoot/data/deb/package.json",
      format = Some("json"))
    val g = PipelineCompiler.compile(m.schema, m.resource("package"), df)
    // identity (name) merged packages = 29 distinct names (reference
    // pick_unique keeps 35 whole dicts over the same 29 identities);
    // the single shared maintainer merges to one doc
    assert(g.vertex("package").count() == 29)
    assert(g.vertex("maintainer").count() == 1)
    // relation_from_key: dependency edges keyed by the any_key map entry
    // ('-'→'_'), identity-projected (reference pick_unique histogram:
    // depends 27, pre_depends 3, suggests 2, breaks 1)
    val pp = g.edges.collect {
      case (k, e) if k.source == "package" && k.target == "package" => e
    }.toSeq
    assert(relationHistogram(pp, Seq("src_name", "dst_name", "relation")) ==
      Map("depends" -> 27L, "pre_depends" -> 3L, "suggests" -> 2L,
        "breaks" -> 1L))
    // no spurious self-edges (reference test_no_self_edge invariant)
    pp.foreach(e =>
      assert(e.where(col("src_name") === col("dst_name")).count() == 0))
    // maintainer->package: document-scoped product over every package
    // observation, identity-projected = 29 (the one maintainer × all names)
    val mp = g.edges.collect {
      case (k, e) if k.source == "maintainer" && k.target == "package" => e
    }.toSeq
    assert(mp.map(_.select("src_email", "dst_name").distinct().count()).sum == 29L)
  }

  test("reference deb compact resource (apply + exclude_target) lands committed counts") {
    // the reference's conftest resource_deb_compact (test/conftest.py:397-415,
    // `apply:` dialect) with the committed raw-assembly counts from
    // test/architecture/test_actor.py:165-166 and :180 — depends 29,
    // pre_depends 3, suggests 2, breaks 1; maintainer->package 3 with
    // exclude_target: dependencies
    assume(new java.io.File(s"$refRoot/data/deb/package.json").exists())
    val m = graft.manifest.ManifestLoader.fromYamlString(
      """schema:
        |    metadata:
        |        name: deb-compact
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: package
        |                properties: [name, version]
        |                identity: [name]
        |            -   name: maintainer
        |                properties: [name, email]
        |                identity: [email]
        |        edge_config:
        |            edges:
        |            -   source: package
        |                target: package
        |            -   source: maintainer
        |                target: package
        |ingestion_model:
        |    resources:
        |    -   name: package
        |        apply:
        |        -   vertex: package
        |        -   key: dependencies
        |            apply:
        |            -   any_key: true
        |                apply:
        |                -   vertex: package
        |        -   source: maintainer
        |            target: package
        |            exclude_target: dependencies
        |        -   source: package
        |            target: package
        |            relation_from_key: true
        |        -   key: maintainer
        |            apply:
        |            -   vertex: maintainer
        |bindings: {}
        |""".stripMargin)
    val df = FileSource.read(spark, s"$refRoot/data/deb/package.json",
      format = Some("json"))
    val g = PipelineCompiler.compile(m.schema, m.resource("package"), df)
    val pp = g.edges.collect {
      case (k, e) if k.source == "package" && k.target == "package" => e
    }.toSeq
    // RAW assembly counts (the reference's acc lengths, pre-dedup)
    val rawHist = pp.map(_.groupBy("relation").count())
      .reduceLeft(_.unionByName(_))
      .groupBy("relation").agg(sum("count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rawHist == Map("depends" -> 29L, "pre_depends" -> 3L,
      "suggests" -> 2L, "breaks" -> 1L))
    val mp = g.edges.collect {
      case (k, e) if k.source == "maintainer" && k.target == "package" => e
    }.toSeq
    assert(mp.map(_.count()).sum == 3L) // exclude_target keeps top-level only
  }

  test("reference debian-eco bug resource infers package->bug and never package->package") {
    // reference test_no_self_edge.py:126-155: bugs for a single package
    // must not mint a package->package self-edge through edge inference
    assume(new java.io.File(s"$refRoot/config/schema/debian-eco.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(
      s"$refRoot/config/schema/debian-eco.yaml")
    import spark.implicits._
    val bugs = Seq(
      """{"package": "0ad", "bug_num": 1008531, "subject": "assertion failure", "severity": "normal", "date": "2022-03-28T14:00:01"}""",
      """{"package": "0ad", "bug_num": 794562, "subject": "test with nvidia-texture-tools", "severity": "wishlist", "date": "2015-08-04T13:00:01"}""")
    val df = spark.read.json(bugs.toDS())
    val g = PipelineCompiler.compile(m.schema, m.resource("bug"), df)
    assert(g.vertex("package").count() == 1) // both bugs name 0ad
    assert(g.vertex("bug").count() == 2)
    val pb = g.edges.collect {
      case (k, e) if k.source == "package" && k.target == "bug" => e
    }.toSeq
    assert(pb.map(_.count()).sum == 2L)
    val pp = g.edges.collect {
      case (k, e) if k.source == "package" && k.target == "package" => e
    }.toSeq
    assert(pp.map(_.count()).sum == 0L)
  }

  test("reference objects-relations routers + dynamic edge land committed counts") {
    // test/routing/test_objects_relations.py:49-146: objects route to
    // person 4 / vehicle 3 / institution 3; relations produce exactly one
    // edge per row (7) with canonical relation_map names
    assume(new java.io.File(s"$refRoot/config/schema/objects-relations.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(
      s"$refRoot/config/schema/objects-relations.yaml")
    val objects = FileSource.read(spark,
      s"$refRoot/data/objects-relations/objects.csv")
    val go = PipelineCompiler.compile(m.schema, m.resource("objects"), objects)
    assert(go.vertex("person").count() == 4)
    assert(go.vertex("vehicle").count() == 3)
    assert(go.vertex("institution").count() == 3)
    // routed vertices retain row fields (Alice keeps name + email)
    val alice = go.vertex("person")
      .where(col("id") === "ec3cd5f9-8a75-49af-adc8-654eab637ebc")
      .select("name", "email").collect().head
    assert(alice.getString(0) == "Alice Martin")
    assert(alice.getString(1) == "alice@example.com")
    val relations = FileSource.read(spark,
      s"$refRoot/data/objects-relations/relations.csv")
    val gr = PipelineCompiler.compile(m.schema, m.resource("relations"), relations)
    val all = gr.edges.values.toSeq
    assert(all.map(_.count()).sum == 7L) // one edge per relations row
    val hist = all.map(_.groupBy("relation").count())
      .reduceLeft(_.unionByName(_))
      .groupBy("relation").agg(sum("count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist == Map("employed_by" -> 2L, "owns" -> 2L,
      "colleague_of" -> 1L, "funds" -> 1L, "invests_in" -> 1L))
    // per-(srcType, dstType) split matches the reference container keys
    def between(s: String, t: String): Long = gr.edges.collect {
      case (k, e) if k.source == s && k.target == t => e
    }.map(_.count()).sum
    assert(between("person", "institution") == 2L)
    assert(between("person", "vehicle") == 2L)
    assert(between("person", "person") == 1L)
    assert(between("institution", "institution") == 2L)
  }

  test("reference csv-edge-weights lands one edge per row with direct date weights") {
    // test/architecture/test_csv_edge_weights.py: 8 rows → 8 edges, each
    // carrying the schema-declared `date` property off its own row
    assume(new java.io.File(s"$refRoot/config/schema/csv-edge-weights.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(
      s"$refRoot/config/schema/csv-edge-weights.yaml")
    val df = FileSource.read(spark,
      s"$refRoot/data/csv-edge-weights/relations.csv")
    val g = PipelineCompiler.compile(m.schema, m.resource("relations"), df)
    assert(g.vertex("company").count() == 8) // identity (name) merged
    val cc = g.edges.collect {
      case (k, e) if k.source == "company" && k.target == "company" => e
    }.toSeq
    assert(cc.map(_.count()).sum == 8L)
    // every edge payload carries its row's date (null merge keys would
    // break downstream MERGE semantics — the reference asserts non-null)
    cc.foreach { e =>
      assert(e.columns.contains("date"))
      assert(e.where(col("date").isNull).count() == 0)
    }
    val hist = cc.map(_.groupBy("relation").count())
      .reduceLeft(_.unionByName(_))
      .groupBy("relation").agg(sum("count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist == Map("invests_in" -> 1L, "partners_with" -> 2L,
      "acquires" -> 1L, "integrates_with" -> 1L, "competes_with" -> 1L,
      "collaborates_with" -> 1L, "supplies_to" -> 1L))
  }

  test("reference kg example round-trips the committed DB CONTENTS through a live store") {
    // ref/db/kg_contents.yaml is the reference's committed ArangoDB
    // contents dump — document-level, not just sizes. The kg data carries
    // its own `_key` values (renamed from `hash`), so even the keys are
    // engine-portable here; every vertex dict and edge endpoint pair must
    // match EXACTLY after our store upsert.
    assume(new java.io.File(s"$refRoot/ref/db/kg_contents.yaml").exists())
    val golden = loadContentsYaml(s"$refRoot/ref/db/kg_contents.yaml")
    val m = graft.manifest.ManifestLoader.load(s"$refRoot/config/schema/kg.yaml")
    val df = FileSource.read(spark, s"$refRoot/data/kg/kg.json.gz",
      format = Some("json"))
    val g = PipelineCompiler.compile(m.schema, m.resource("kg"), df)
    val root = freshDir("/root/repo/target/graft-kg-contents-golden")
    val store = new graft.store.GraphStore(root, m.schema, spark)
    store.write(g)
    def vertexDicts(name: String): Seq[Map[String, String]] =
      store.vertices(name).collect().toSeq.map { r =>
        r.schema.fieldNames.flatMap(f =>
          Option(r.getAs[Any](f)).map(v => f -> v.toString)).toMap
      }
    def sortDicts(ds: Seq[Map[String, String]]) =
      ds.sortBy(_.toSeq.sorted.mkString(""))
    // vertex collections: full document contents, key included
    assert(sortDicts(vertexDicts("entity")) == sortDicts(golden("entities")))
    assert(sortDicts(vertexDicts("mention")) == sortDicts(golden("mentions")))
    assert(sortDicts(vertexDicts("publication").map(_ - "data_source")) ==
      sortDicts(golden("publications")))
    // edge collections: endpoint key pairs (+ _role where the reference
    // records it); the golden prefixes keys with the storage collection
    def stripRef(v: String) = v.substring(v.indexOf('/') + 1)
    def edgeFrame(src: String, dst: String) = {
      // undeclared pipeline edges (publication→mention) land under the
      // synthesized default relation
      val ek = m.schema.edges.map(e => graft.model.EdgeKey(e.source, e.target, e.relation))
        .find(k => k.source == src && k.target == dst)
        .getOrElse(graft.model.EdgeKey(src, dst, "related"))
      store.edges(ek)
    }
    val me = edgeFrame("mention", "entity")
      .select("src__key", "dst__key").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val meGold = golden("mentions_entities_edges")
      .map(d => (stripRef(d("_from")), stripRef(d("_to")))).sorted
    assert(me == meGold)
    val mm = edgeFrame("mention", "mention")
      .select(col("src__key"), col("dst__key"), col("_role"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    val mmGold = golden("mentions_mentions_edges")
      .map(d => (stripRef(d("_from")), stripRef(d("_to")), d("_role"))).sorted
    assert(mm == mmGold)
    val pm = edgeFrame("publication", "mention")
      .select("dst__key").collect().map(_.getString(0)).toSeq.sorted
    val pmGold = golden("publications_mentions_edges")
      .map(d => stripRef(d("_to"))).sorted
    assert(pm == pmGold)
    // empty collections stay empty (never written at all here)
    assert(golden("communities").isEmpty)
    assert(!store.vertexCollections.contains("community"))
  }

  test("reference ibes vertex collections match the committed DB contents") {
    // ref/db/ibes_contents.yaml, vertex collections only: agencies,
    // analysts, tickers, recommendations have clean content dicts
    // (publications bake in ArangoDB's upsert-on-partial-null extra doc —
    // the known divergence ReferenceGoldenSpec documents — and the edge
    // dumps reference ArangoDB-minted blank keys, so those stay out).
    // The dump pops _key and identity-as-key fields; we project our store
    // docs to the dump's field set and compare whole multisets. Empty
    // strings in the dump equal absent fields here (CSV null semantics).
    assume(new java.io.File(s"$refRoot/ref/db/ibes_contents.yaml").exists())
    val golden = loadContentsYaml(s"$refRoot/ref/db/ibes_contents.yaml")
    val m = graft.manifest.ManifestLoader.load(s"$refRoot/config/schema/ibes.yaml")
    val df = spark.read.option("header", "true")
      .option("encoding", "ISO-8859-1")
      .csv(s"$refRoot/data/ibes/ibes.csv.gz")
    val g = PipelineCompiler.compile(m.schema, m.resources.head, df)
    val root = freshDir("/root/repo/target/graft-ibes-contents-golden")
    val store = new graft.store.GraphStore(root, m.schema, spark)
    store.write(g)
    def normalize(ds: Seq[Map[String, String]]): Seq[Seq[(String, String)]] =
      ds.map(_.filter(_._2.nonEmpty).toSeq.sorted).sortBy(_.mkString(""))
    def check(vertex: String, collection: String): Unit = {
      val fields = golden(collection).flatMap(_.keys).distinct
      val ours = store.vertices(vertex).collect().toSeq.map { r =>
        fields.flatMap(f =>
          if (!r.schema.fieldNames.contains(f)) None
          else Option(r.getAs[Any](f)).map(v => f -> v.toString)).toMap
      }
      // pandas float-mangling divergence (DIVERGENCES.md): the reference's
      // CSV reader parses the cusip '15117E10' as scientific notation
      // before ingest (golden holds '1.5117E14'); our reader keeps the
      // raw string. Normalize the one mangled golden value back.
      val fixedGolden = golden(collection).map(d =>
        if (d.get("cusip").contains("1.5117E14")) d + ("cusip" -> "15117E10")
        else d)
      assert(normalize(ours) == normalize(fixedGolden),
        s"$collection contents diverge")
    }
    check("agency", "agencies")
    check("analyst", "analysts")
    check("ticker", "tickers")
    check("recommendation", "recommendations")
  }

  /** Parse a reference contents dump (collection → list of string-valued
    * docs) with the Jackson YAML reader bundled with Spark.
    */
  private def loadContentsYaml(path: String): Map[String, Seq[Map[String, String]]] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper(new YAMLFactory())
      .readTree(new java.io.File(path))
    root.properties().asScala.map { e =>
      val docs = e.getValue.elements().asScala.map { d =>
        d.properties().asScala.map(f => f.getKey -> f.getValue.asText()).toMap
      }.toSeq
      e.getKey -> docs
    }.toMap
  }

  test("reference review example lands its committed author counts") {
    // test/db/neo4js/test_ingest.py:33-36: 374 Authors after ingest, 8 of
    // them with hindex 10; plus the inferred author->researchField edge
    assume(new java.io.File(s"$refRoot/config/schema/review.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(s"$refRoot/config/schema/review.yaml")
    val df = FileSource.read(spark, s"$refRoot/data/review/authors.csv.gz",
      format = Some("csv"))
    val g = PipelineCompiler.compile(m.schema, m.resource("authors"), df)
    assert(g.vertex("author").count() == 374)
    assert(g.vertex("author").where(col("hindex") === 10).count() == 8)
    assert(g.vertex("researchField").count() == 17)
    val ar = g.edges.collect {
      case (k, e) if k.source == "author" && k.target == "researchField" => e
    }.toSeq
    assert(ar.map(_.select("src_id", "src_full_name", "dst_id").distinct()
      .count()).sum == 374L)
  }
}
