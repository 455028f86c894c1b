package graft

import org.apache.spark.sql.functions._

/** Round-7 reference goldens: examples 16 (secondary identities) and 17
  * (identity funnel) run VERBATIM — manifest.yaml + data CSVs through
  * ManifestLoader → PipelineCompiler → a live GraphStore — and must match
  * the COMMITTED artifacts the reference ships
  * (examples/16…/artifacts/csv-backend, examples/17…/artifacts), including
  * the funnel digest ids byte-for-byte (PyJsonCanon parity).
  */
class ReferenceGoldenR7Spec extends SparkSpec {

  private val refRoot = "/root/reference/examples"

  private def jsonlGz(path: String): Seq[Map[String, String]] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(path))
    val text = new String(in.readAllBytes(), "UTF-8")
    in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    text.split("\n").filter(_.nonEmpty).toSeq.map { line =>
      val n = mapper.readTree(line)
      import scala.jdk.CollectionConverters._
      n.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
  }

  /** normalize: the reference's CSV plane stores "" for absent values */
  private def clean(d: Map[String, String]): Map[String, String] =
    d.filter { case (_, v) => v != null && v.nonEmpty }

  test("example 16 (secondary identities) matches its committed artifacts") {
    val ex = s"$refRoot/16-secondary-identities"
    assume(new java.io.File(s"$ex/manifest.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(s"$ex/manifest.yaml")
    val root = freshDir("/root/repo/target/golden-ex16")
    val store = new graft.store.GraphStore(root, m.schema, spark)
    val parts = m.resources.map { res =>
      val input = cli.Main.resolveInput(spark, m, res.name, ex)
      graft.pipeline.PipelineCompiler.compile(m.schema, res, input)
    }
    store.write(parts.reduceLeft(_.unionWith(_)))

    def vertexDicts(name: String): Seq[Map[String, String]] =
      store.vertices(name).collect().toSeq.map { r =>
        r.schema.fieldNames.flatMap(f =>
          Option(r.getAs[Any](f)).map(v => f -> v.toString)).toMap
      }
    def sortDicts(ds: Seq[Map[String, String]]) =
      ds.map(clean).sortBy(_.toSeq.sorted.mkString("|"))

    val art = s"$ex/artifacts/csv-backend"
    assert(sortDicts(vertexDicts("instrument")) ==
      sortDicts(jsonlGz(s"$art/vertices/instrument.000.jsonl.gz")))
    assert(sortDicts(vertexDicts("issuer")) ==
      sortDicts(jsonlGz(s"$art/vertices/issuer.000.jsonl.gz")))

    // the links rows carried ONLY isin/lei — the committed edge artifact
    // holds PRIMARY ids, so the store's secondary→primary endpoint
    // resolution is what's being asserted here
    val edges = store.edges(graft.model.EdgeKey("instrument", "issuer", "issued_by"))
      .select(col("src_sid"), col("dst_iid"), col("share").cast("double"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq.sorted
    // edge artifact rows are [srcDoc, dstDoc, propsDoc] triples
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(
      s"$art/edges/instrument__issued_by__issuer.000.jsonl.gz"))
    val lines = new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty)
    in.close()
    val goldEdges = lines.toSeq.map { line =>
      val a = mapper.readTree(line)
      (a.get(0).path("sid").asText(), a.get(1).path("iid").asText(),
        a.get(2).path("share").asDouble())
    }.sorted
    assert(edges == goldEdges)
  }

  test("example 13 (export/migration) matches its committed artifacts") {
    val ex = s"$refRoot/13-graph-export-migration"
    assume(new java.io.File(s"$ex/manifest.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(s"$ex/manifest.yaml")
    val root = freshDir("/root/repo/target/golden-ex13")
    val store = new graft.store.GraphStore(root, m.schema, spark)
    val parts = m.resources.map { res =>
      val input = cli.Main.resolveInput(spark, m, res.name, ex)
      graft.pipeline.PipelineCompiler.compile(m.schema, res, input)
    }
    store.write(parts.reduceLeft(_.unionWith(_)))

    def vertexDicts(name: String): Seq[Map[String, String]] =
      store.vertices(name).collect().toSeq.map { r =>
        r.schema.fieldNames.flatMap(f =>
          Option(r.getAs[Any](f)).map(v => f -> v.toString)).toMap
      }
    def sortDicts(ds: Seq[Map[String, String]]) =
      ds.map(clean).sortBy(_.toSeq.sorted.mkString("|"))
    val art = s"$ex/artifacts/csv-backend"
    // the backend appends one chunk per batch (person.000 = people.csv,
    // person.001 = the departments resource's partial observations); the
    // read-side view merges by id with the later batch winning per field
    val expectPerson = {
      val byId = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
      Seq("000", "001").foreach { b =>
        jsonlGz(s"$art/vertices/person.$b.jsonl.gz").foreach { d =>
          byId(d("id")) = byId.getOrElse(d("id"), Map.empty) ++ clean(d)
        }
      }
      byId.values.toSeq
    }
    assert(sortDicts(vertexDicts("person")) == sortDicts(expectPerson))
    assert(sortDicts(vertexDicts("department")) ==
      sortDicts(jsonlGz(s"$art/vertices/department.000.jsonl.gz")))
    // edge artifact rows are [srcDoc, dstDoc, props] (empty props); the
    // reference leaves the relation undeclared — graft synthesizes
    // "related" for the store key, contents identical
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(
      s"$art/edges/person____department.000.jsonl.gz"))
    val lines = new String(in.readAllBytes(), "UTF-8").split("\n").filter(_.nonEmpty)
    in.close()
    val goldEdges = lines.toSeq.map { line =>
      val a = mapper.readTree(line)
      (a.get(0).path("id").asText(), a.get(1).path("name").asText())
    }.sorted
    val edges = store.edges(graft.model.EdgeKey("person", "department", "related"))
      .select(col("src_id"), col("dst_name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(edges == goldEdges)
  }

  test("example 17 (identity funnel) reproduces the committed digest ids byte-for-byte") {
    val ex = s"$refRoot/17-identity-funnel"
    assume(new java.io.File(s"$ex/manifest.yaml").exists())
    val m = graft.manifest.ManifestLoader.load(s"$ex/manifest.yaml")
    // the funnel parses with its branch order and the branch-id marker
    val party = m.schema.vertexByName("party")
    party.identity match {
      case graft.model.Identity.Funnel(bs, mark) =>
        assert(bs.map(_.name) == Seq("email", "phone", "weak") && mark)
      case other => fail(s"expected funnel, got $other")
    }
    val root = freshDir("/root/repo/target/golden-ex17")
    val store = new graft.store.GraphStore(root, m.schema, spark)
    val parts = m.resources.map { res =>
      val input = cli.Main.resolveInput(spark, m, res.name, ex)
      graft.pipeline.PipelineCompiler.compile(m.schema, res, input)
    }
    store.write(parts.reduceLeft(_.unionWith(_)))

    // expected: the two committed batches merged by id, later batch's
    // non-empty fields win (crm = .000, billing = .001)
    val art = s"$ex/artifacts/csv-backend/vertices"
    val batches = Seq(jsonlGz(s"$art/party.000.jsonl.gz"),
      jsonlGz(s"$art/party.001.jsonl.gz"))
    val expect = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, String]]
    batches.flatten.foreach { d =>
      val id = d("id")
      expect(id) = expect.getOrElse(id, Map.empty) ++ clean(d)
    }

    val ours = store.vertices("party").collect().toSeq.map { r =>
      r.schema.fieldNames.flatMap(f =>
        Option(r.getAs[Any](f)).map(v => f -> v.toString)).toMap
    }.map(d => clean(d).map { case ("_id", v) => "id" -> v; case kv => kv })
    assert(ours.size == expect.size, s"party count ${ours.size} vs ${expect.size}")
    val oursById = ours.map(d => d("id") -> d).toMap
    expect.foreach { case (id, gold) =>
      val doc = oursById.getOrElse(id,
        fail(s"digest id $id not produced (byte-parity break)"))
      assert(doc == gold + ("id" -> id), s"doc for $id:\n  ours=$doc\n  gold=$gold")
    }
  }
}
