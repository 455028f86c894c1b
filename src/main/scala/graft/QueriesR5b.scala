package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.pipeline._
import graft.query._
import graft.store.GraphStore
import graft.fixtures.TpchGraph

/** Round-5 coverage closers: battery entries (each with a full DuckDB
  * oracle) for the SURVEY §2 rows that were previously ScalaTest-only —
  * SPARQL endpoint paging, OWL TBox inference, `target: keys` and
  * `input_groups` through the manifest dialect, the bounded sampler, the
  * dry-run write, and the AggregateQuery constraint contract.
  */
object GraftQueriesR5b {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    graft.fixtures.TpchGraph.table(s, dir, name)

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(

    // §2.1 SPARQL endpoint paging (graflo/data_source/rdf.py:224-424): the
    // injected fetch serves SPARQL 1.1 JSON pages of the nation table; page
    // size 7 over 25 rows exercises three full pages + the short-page stop
    "q_sparql_page" -> { (s, d) =>
      import graft.rdf.SparqlSource
      val rows = t(s, d)("nation")
        .select(col("n_nationkey").cast("long"), col("n_name"))
        .orderBy("n_nationkey").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val limRe = "LIMIT (\\d+) OFFSET (\\d+)".r
      val fetch: String => String = { q =>
        val m = limRe.findFirstMatchIn(q).get
        val (lim, off) = (m.group(1).toInt, m.group(2).toInt)
        val bindings = rows.slice(off, off + lim).map { case (k, n) =>
          s"""{"key":{"type":"literal","value":"$k"},"name":{"type":"literal","value":"$n"}}"""
        }.mkString(",")
        s"""{"head":{"vars":["key","name"]},"results":{"bindings":[$bindings]}}"""
      }
      SparqlSource.read(s, fetch,
        "SELECT ?key ?name WHERE { ?x <http://g/p/key> ?key ; <http://g/p/name> ?name }",
        pageSize = 7)
        .select(col("key").cast("long").as("n_nationkey"), col("name").as("n_name"))
        .orderBy("n_nationkey")
    },

    // §2.12 OWL/RDFS TBox inference (graflo/hq/rdf_inferencer.py:98-260):
    // a TBox generated FROM the region/nation tables (classes = regions,
    // datatype properties = nations under their region, object properties =
    // key-adjacent region links) so the triple→schema mapping replays in SQL
    "q_owl_infer" -> { (s, d) =>
      import graft.rdf.Rdf
      val reg = t(s, d)("region").select(
        regexp_replace(col("r_name"), " ", "_").as("rn"), col("r_regionkey"))
      val nat = t(s, d)("nation")
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .select(regexp_replace(col("n_name"), " ", "_").as("nn"), col("rn"))
      val classT = reg.select(concat(lit("http://g/c/"), col("rn")).as("s"),
        lit(Rdf.RdfType).as("p"), lit(Rdf.OwlClass).as("o"))
      val dpT = nat.select(concat(lit("http://g/p/"), col("nn")).as("s"),
          lit(Rdf.RdfType).as("p"), lit(Rdf.OwlDatatypeProperty).as("o"))
        .unionByName(nat.select(concat(lit("http://g/p/"), col("nn")).as("s"),
          lit(Rdf.RdfsDomain).as("p"), concat(lit("http://g/c/"), col("rn")).as("o")))
      val pairs = reg.as("a").join(reg.as("b"),
          col("a.r_regionkey") + 1 === col("b.r_regionkey"))
        .select(col("a.rn").as("rn1"), col("b.rn").as("rn2"))
      val opT = pairs.select(concat(lit("http://g/r/to_"), col("rn1")).as("s"),
          lit(Rdf.RdfType).as("p"), lit(Rdf.OwlObjectProperty).as("o"))
        .unionByName(pairs.select(concat(lit("http://g/r/to_"), col("rn1")).as("s"),
          lit(Rdf.RdfsDomain).as("p"), concat(lit("http://g/c/"), col("rn1")).as("o")))
        .unionByName(pairs.select(concat(lit("http://g/r/to_"), col("rn1")).as("s"),
          lit(Rdf.RdfsRange).as("p"), concat(lit("http://g/c/"), col("rn2")).as("o")))
      val sch = Rdf.inferSchema(classT.unionByName(dpT).unionByName(opT))
      import s.implicits._
      val out =
        sch.vertices.map(v => ("vertex", v.name,
          v.properties.map(_.name).sorted.mkString(","))) ++
        sch.edges.map(e => ("edge", e.relation, s"${e.source}->${e.target}"))
      out.toDF("kind", "name", "detail").orderBy("kind", "name")
    },

    // §2.4 `target: keys` through the manifest dialect
    // (contract/ingestion/transform.py:217-232): camel_to_snake over an
    // include selection; the un-selected column keeps its camelCase name
    "q_target_keys" -> { (s, d) =>
      val input = t(s, d)("customer").select(
        col("c_custkey").as("custKey"),
        col("c_name").as("custName"),
        col("c_mktsegment").as("mktSegment"))
      val m = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: keys-demo
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: cust
          |                properties:
          |                -   cust_name
          |                -   mktSegment
          |                identity:
          |                -   cust_key
          |ingestion_model:
          |    resources:
          |    -   name: customer
          |        pipeline:
          |        -   transform:
          |                target: keys
          |                keys:
          |                -   custKey
          |                -   custName
          |                call:
          |                    foo: camel_to_snake
          |        -   vertex: cust
          |""".stripMargin)
      PipelineCompiler.compile(m.schema, m.resources.head, input)
        .vertex("cust")
        .select(col("cust_key"), col("cust_name"), col("mktSegment"))
        .orderBy("cust_key")
    },

    // §2.4 input_groups/output_groups through the manifest dialect
    // (transform.py:663-678): one n-ary fn tuple-called over two field
    // groups, collision-checked outputs
    "q_input_groups" -> { (s, d) =>
      val m = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: groups-demo
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: li
          |                properties: []
          |                identity:
          |                -   flag_status
          |                -   status_flag
          |ingestion_model:
          |    resources:
          |    -   name: lineitem
          |        pipeline:
          |        -   transform:
          |                call:
          |                    foo: concat_ws_pipe
          |                    input_groups:
          |                    -   [l_returnflag, l_linestatus]
          |                    -   [l_linestatus, l_returnflag]
          |                    output_groups:
          |                    -   [flag_status]
          |                    -   [status_flag]
          |        -   vertex: li
          |""".stripMargin)
      PipelineCompiler.compile(m.schema, m.resources.head, t(s, d)("lineitem"))
        .vertex("li")
        .select(col("flag_status"), col("status_flag"))
        .orderBy("flag_status")
    },

    // §2.12 bounded sampler (graflo/hq/sampler.py:48-407): first-N rows of a
    // deterministic order with long cells truncated to maxCellChars + '…'
    "q_sample" -> { (s, d) =>
      import s.implicits._
      val rows = graft.infer.Sampler.sample(
        t(s, d)("documents").select("doc_id", "lang", "text").orderBy("doc_id"),
        n = 25, maxCellChars = 40)
      rows.map(m => (m("doc_id").toLong, m("lang"), m("text")))
        .toDF("doc_id", "lang", "text").orderBy("doc_id")
    },

    // §2.2 dry run (graflo/hq/ingestion_parameters.py:155): a real write of
    // the even half, then a DRY write of the odd half through the full plan
    // — the store must still hold exactly the even half
    "q_dry_run" -> { (s, d) =>
      val root = GraftQueries.scratch(s, "dryrun", d)
      deleteRecursively(new java.io.File(root))
      val sch = GraphSchema(Seq(VertexDef("customer", Seq(FieldDef("c_name")),
        Identity.Natural(Seq("c_custkey")))))
      val store = new GraphStore(root, sch, s)
      val cust = t(s, d)("customer").select("c_custkey", "c_name")
      store.upsertVertices("customer", cust.where(col("c_custkey") % 2 === 0))
      val g = PipelineCompiler.compile(sch, ResourceDef("r",
        Seq(VertexStep("customer"))), cust.where(col("c_custkey") % 2 === 1))
      store.write(g, dry = true)
      store.vertices("customer")
        .agg(count(lit(1)).as("cnt_after_dry"),
          sum((col("c_custkey") % 2 === 0).cast("long")).as("n_even"))
    },

    // extension: sccFixed's unconverged-stop contract — a 25-cycle with
    // 2 propagation rounds cannot converge; the one provably-correct
    // agreement (the min-id node) is kept and everything else is
    // '?'-marked instead of a later trim mislabeling cycle members as
    // singletons; the oracle replays the stop via its conv/act flag CTEs
    "q_scc_truncated" -> { (s, d) =>
      import graft.graph.GraphAlgos
      val cyc = t(s, d)("nation").select(
        concat(lit("n"), col("n_nationkey")).as("src"),
        concat(lit("n"), pmod(col("n_nationkey") + 1, lit(25))).as("dst"))
      GraphAlgos.sccFixed(cyc, "src", "dst", peelRounds = 2, propRounds = 2)
        .orderBy("node")
    },

    // §2.13 compose_manifests (reference evolution/compose.py:586-660):
    // two independently-authored manifests (clients over customer, vendors
    // over supplier) compose under explicit vertex/property equivalences
    // into ONE party graph; both resources ingest through the composed
    // manifest and same-key docs merge across sources
    "q_compose_manifests" -> { (s, d) =>
      import graft.evolve.Compose
      import graft.evolve.Compose._
      val leftM = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: clients
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: client
          |                properties:
          |                -   name
          |                identity:
          |                -   client_id
          |ingestion_model:
          |    resources:
          |    -   name: customers
          |        pipeline:
          |        -   transform:
          |                rename:
          |                    c_custkey: client_id
          |                    c_name: name
          |        -   vertex: client
          |""".stripMargin)
      val rightM = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: vendors
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: vendor
          |                properties:
          |                -   vname
          |                identity:
          |                -   vendor_id
          |ingestion_model:
          |    resources:
          |    -   name: suppliers
          |        pipeline:
          |        -   transform:
          |                rename:
          |                    s_suppkey: vendor_id
          |                    s_name: vname
          |        -   vertex: vendor
          |""".stripMargin)
      val composed = Compose.composeManifests(leftM, rightM, ComposeManifestsOp(
        vertices = Seq(VertexEquiv("client", "vendor", "party",
          properties = Seq(
            PropertyEquiv(Some("name"), Some("vname"), "name"),
            PropertyEquiv(Some("client_id"), Some("vendor_id"), "party_id")),
          identity = Some(Seq("party_id"))))))
      val root = GraftQueries.scratch(s, "compose", d)
      deleteRecursively(new java.io.File(root))
      val store = new GraphStore(root, composed.schema, s)
      composed.resources.foreach { r =>
        val src = if (r.name == "customers") "customer" else "supplier"
        store.write(PipelineCompiler.compile(composed.schema, r, t(s, d)(src)))
      }
      store.vertices("party")
        .agg(count(lit(1)).as("n_parties"),
          sum(when(col("name").isNotNull, 1L).otherwise(0L)).as("n_named"))
    },

    // §2.7 AggregateQuery constraint contract (reference models.py:252-283):
    // the valid spec computes against live data; each invalid spec must be
    // rejected by the constraint checks, not silently computed
    "q_agg_constraints" -> { (s, d) =>
      val reader = new GraphReader(TpchGraph.schema, t(s, d), _ => None)
      def outcome(q: AggregateQuery): String =
        try {
          val v = reader.aggregate(q).collect()(0).get(0)
          s"ok:$v"
        } catch { case _: IllegalArgumentException => "rejected" }
      import s.implicits._
      Seq(
        ("count_total", outcome(AggregateQuery("customer", "COUNT"))),
        ("group_by_non_count", outcome(AggregateQuery("customer", "MAX",
          aggregatedField = Some("c_acctbal"),
          discriminant = Some("c_nationkey")))),
        ("missing_aggregated_field", outcome(AggregateQuery("customer", "MAX"))),
        ("unknown_aggregation", outcome(AggregateQuery("customer", "MEDIAN",
          aggregatedField = Some("c_acctbal")))))
        .toDF("spec", "status").orderBy("spec")
    }
  )

  val oracles: Map[String, String] = Map(

    "q_sparql_page" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
        |FROM nation ORDER BY 1""".stripMargin,

    "q_owl_infer" ->
      """WITH r AS (SELECT replace(r_name, ' ', '_') AS rn, r_regionkey FROM region),
        |n AS (SELECT replace(n_name, ' ', '_') AS nn, r.rn
        |      FROM nation JOIN r ON n_regionkey = r.r_regionkey)
        |SELECT 'vertex' AS kind, r.rn AS name,
        |  (SELECT string_agg(nn, ',' ORDER BY nn) FROM n WHERE n.rn = r.rn) AS detail
        |FROM r
        |UNION ALL
        |SELECT 'edge', 'to_' || a.rn, a.rn || '->' || b.rn
        |FROM r a JOIN r b ON a.r_regionkey + 1 = b.r_regionkey
        |ORDER BY kind, name""".stripMargin,

    "q_target_keys" ->
      """SELECT c_custkey AS cust_key, c_name AS cust_name,
        |  c_mktsegment AS "mktSegment"
        |FROM customer ORDER BY 1""".stripMargin,

    "q_input_groups" ->
      """SELECT DISTINCT l_returnflag || '|' || l_linestatus AS flag_status,
        |  l_linestatus || '|' || l_returnflag AS status_flag
        |FROM lineitem ORDER BY 1""".stripMargin,

    "q_sample" ->
      """SELECT doc_id, lang,
        |  CASE WHEN length(text) > 40 THEN substring(text, 1, 40) || '…'
        |       ELSE text END AS text
        |FROM documents ORDER BY doc_id LIMIT 25""".stripMargin,

    "q_dry_run" ->
      """SELECT count(*) AS cnt_after_dry, count(*) AS n_even
        |FROM customer WHERE c_custkey % 2 = 0""".stripMargin,

    "q_scc_truncated" -> (graft.graph.GraphAlgos.sccOracleSql(
      "SELECT 'n' || n_nationkey AS src, 'n' || ((n_nationkey + 1) % 25) AS dst FROM nation",
      peelRounds = 2, propRounds = 2) + "\nORDER BY node"),

    "q_compose_manifests" ->
      """SELECT count(*) AS n_parties, count(*) AS n_named FROM (
        |  SELECT c_custkey AS k FROM customer
        |  UNION SELECT s_suppkey FROM supplier)""".stripMargin,

    "q_agg_constraints" ->
      """SELECT 'count_total' AS spec,
        |  'ok:' || CAST((SELECT count(*) FROM customer) AS VARCHAR) AS status
        |UNION ALL SELECT 'group_by_non_count', 'rejected'
        |UNION ALL SELECT 'missing_aggregated_field', 'rejected'
        |UNION ALL SELECT 'unknown_aggregation', 'rejected'
        |ORDER BY spec""".stripMargin)
}
