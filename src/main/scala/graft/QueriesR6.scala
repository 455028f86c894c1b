package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Round-6 battery entries: DuckDB-oracled queries for the dialect surfaces
  * added while porting the remaining reference goldens —
  * `relation_from_key` over a keyless `any_key` descend (debian-eco.yaml,
  * reference edge_derivation.py:60 + edge_render.py:231-245), fully
  * dynamic typed edge slots (`source_type_field`/`target_type_field`,
  * objects-relations.yaml), and schema-declared direct edge weights with
  * same-type emission-ordered pairing (csv-edge-weights.yaml).
  */
object GraftQueriesR6 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    graft.fixtures.TpchGraph.table(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(

    // §2.6 relation_from_key: per-order docs with a struct of keyed part
    // lists; the edge relation is the any_key map entry each target part
    // was descended under
    "q_relation_from_key" -> { (s, d) =>
      val li = t(s, d)("lineitem").where(col("l_orderkey") % 50 === 0)
      val docs = li.groupBy(col("l_orderkey").as("okey")).agg(
        struct(
          array_sort(collect_list(when(col("l_quantity") <= 10,
            struct(concat(lit("p"), col("l_partkey")).as("pid"))))).as("light"),
          array_sort(collect_list(when(col("l_quantity") >= 40,
            struct(concat(lit("p"), col("l_partkey")).as("pid"))))).as("heavy"))
          .as("deps"))
      val m = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: rfk
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: order
          |                properties: [okey]
          |                identity: [okey]
          |            -   name: part
          |                properties: [pid]
          |                identity: [pid]
          |        edge_config:
          |            edges:
          |            -   source: order
          |                target: part
          |ingestion_model:
          |    resources:
          |    -   name: orders
          |        pipeline:
          |        -   vertex: order
          |        -   key: deps
          |            pipeline:
          |            -   any_key: true
          |                pipeline:
          |                -   vertex: part
          |        -   source: order
          |            target: part
          |            relation_from_key: true
          |bindings: {}
          |""".stripMargin)
      val g = PipelineCompiler.compile(m.schema, m.resource("orders"), docs)
      g.edges.collect {
        case (k, e) if k.source == "order" && k.target == "part" => e
      }.map(_.select(col("src_okey").as("okey"), col("dst_pid").as("pid"),
          col("relation")))
        .reduceLeft(_.unionByName(_))
        .distinct().orderBy("okey", "pid", "relation")
    },

    // §2.3 fully dynamic edge slots: both endpoints routed by type fields,
    // the relation by a mapped relation field (objects-relations dialect)
    "q_edge_typed_slots" -> { (s, d) =>
      val rows = t(s, d)("customer").where(col("c_custkey") % 20 === 0)
        .select(concat(lit("c"), col("c_custkey")).as("source_id"),
          lit("Cust").as("source_type"),
          concat(lit("n"), col("c_nationkey")).as("target_id"),
          lit("Nat").as("target_type"),
          when(col("c_acctbal") < 0, lit("OWES")).otherwise(lit("HOLDS"))
            .as("relation_type"))
        .unionAll(t(s, d)("supplier").where(col("s_suppkey") % 5 === 0)
          .select(concat(lit("s"), col("s_suppkey")).as("source_id"),
            lit("Supp").as("source_type"),
            concat(lit("n"), col("s_nationkey")).as("target_id"),
            lit("Nat").as("target_type"),
            lit("SUPPLIES").as("relation_type")))
      val m = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: typed-slots
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: customer
          |                properties: [id]
          |                identity: [id]
          |            -   name: supplier
          |                properties: [id]
          |                identity: [id]
          |            -   name: nation
          |                properties: [id]
          |                identity: [id]
          |        edge_config:
          |            edges: []
          |ingestion_model:
          |    resources:
          |    -   name: relations
          |        pipeline:
          |        -   vertex_router:
          |                type_field: source_type
          |                from:
          |                    id: source_id
          |                type_map:
          |                    Cust: customer
          |                    Supp: supplier
          |        -   vertex_router:
          |                type_field: target_type
          |                from:
          |                    id: target_id
          |                type_map:
          |                    Nat: nation
          |        -   edge:
          |                source_type_field: source_type
          |                target_type_field: target_type
          |                relation_field: relation_type
          |                relation_map:
          |                    OWES: owes
          |                    HOLDS: holds
          |                    SUPPLIES: supplies
          |bindings: {}
          |""".stripMargin)
      val g = PipelineCompiler.compile(m.schema, m.resource("relations"), rows)
      g.edges.values
        .map(_.select(col("src_id"), col("dst_id"), col("relation")))
        .reduceLeft(_.unionByName(_))
        .distinct().orderBy("src_id", "dst_id", "relation")
    },

    // §2.6 direct edge weights + same-type emission-ordered pairing: two
    // same-type vertex extractions pair once per row (never mirrored), and
    // the schema-declared edge property rides the edge off its own row
    "q_edge_direct_weights" -> { (s, d) =>
      val rows = t(s, d)("orders").where(col("o_orderkey") % 100 === 0)
        .select(concat(lit("c"), col("o_custkey")).as("a"),
          concat(lit("m"), pmod(col("o_orderkey"), lit(7))).as("b"),
          col("o_orderpriority").as("rel"),
          col("o_orderdate").cast("string").as("odate"))
      val m = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: direct-weights
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: party
          |                properties: [name]
          |                identity: [name]
          |        edge_config:
          |            edges:
          |            -   source: party
          |                target: party
          |                properties: [odate]
          |ingestion_model:
          |    resources:
          |    -   name: relations
          |        pipeline:
          |        -   vertex: party
          |            from:
          |                name: a
          |        -   vertex: party
          |            from:
          |                name: b
          |        -   source: party
          |            target: party
          |            relation_field: rel
          |bindings: {}
          |""".stripMargin)
      val g = PipelineCompiler.compile(m.schema, m.resource("relations"), rows)
      g.edges.collect {
        case (k, e) if k.source == "party" && k.target == "party" => e
      }.map(_.select(col("src_name"), col("dst_name"), col("relation"),
          col("odate")))
        .reduceLeft(_.unionByName(_))
        .distinct().orderBy("src_name", "dst_name", "relation", "odate")
    },

    // extension: REAL PNG codec round-trip (JDK javax.imageio) — lossless,
    // so the decoded channel sums replay the synthesis formula in SQL
    // exactly, same closed-form oracle shape as q_qoi_decode
    "q_png_roundtrip" -> { (s, d) =>
      import graft.ext.Multimodal
      val ids = t(s, d)("documents").select(col("doc_id"))
        .where(col("doc_id") < 100)
      val packed = Multimodal.synthesizePng(ids, "doc_id", w = 16, h = 12)
      Multimodal.channelSums(packed, "doc_id").orderBy("doc_id")
    },

    // §2.12 schema-inference fuzzy name matcher (util/fuzzy_matcher.py,
    // reference-exact port incl. difflib SequenceMatcher.ratio): fragments
    // derived from the testdata table vocabulary match vertex names; the
    // oracle is the REFERENCE'S OWN executed output for the same grid
    // (literal rows — the same golden discipline as the manifest goldens)
    "q_fuzzy_fragment" -> { (s, d) =>
      import s.implicits._
      val names = Seq("customer", "supplier", "nation", "region", "part",
        "orders", "lineitem")
      val frags = Seq("c_custkey", "customer_id", "supplier_fk", "nationkey",
        "region", "part_key", "order", "lineitems", "l_orderkey", "custome",
        "suplier", "regio", "fk_nation", "reference_part", "partsupp",
        "o_orderdate", "lineitem_ref", "natio")
      val m = new graft.infer.FuzzyMatcher(names, threshold = 0.8)
      frags.map { f =>
        val (mm, score) = m.matchFragment(f)
        (f, mm.orNull, BigDecimal(score).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("fragment", "matched", "score").orderBy("fragment")
    },

    // extension: REAL baseline-JPEG decode (JDK javax.imageio) — lossy, so
    // the gate is a PSNR band vs the known source image: any correct
    // decoder clears 15 dB on this content (measured floor 19.2 dB at
    // q=0.9 across the id range), a broken one lands near 8-10 dB
    "q_jpeg_decode" -> { (s, d) =>
      import graft.ext.Multimodal
      val ids = t(s, d)("documents").select(col("doc_id"))
        .where(col("doc_id") < 100)
      val packed = Multimodal.synthesizeJpeg(ids, "doc_id", w = 16, h = 12,
        quality = 0.9f)
      Multimodal.psnrCheck(packed, "doc_id", w = 16, h = 12, minPsnrDb = 15.0)
        .orderBy("doc_id")
    }
  )

  val oracles: Map[String, String] = Map(

    "q_relation_from_key" ->
      """WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 50 = 0)
        |SELECT okey, pid, relation FROM (
        |  SELECT CAST(l_orderkey AS BIGINT) AS okey,
        |    'p' || CAST(l_partkey AS VARCHAR) AS pid, 'light' AS relation
        |  FROM li WHERE l_quantity <= 10
        |  UNION
        |  SELECT CAST(l_orderkey AS BIGINT),
        |    'p' || CAST(l_partkey AS VARCHAR), 'heavy'
        |  FROM li WHERE l_quantity >= 40)
        |ORDER BY okey, pid, relation""".stripMargin,

    "q_edge_typed_slots" ->
      """SELECT src_id, dst_id, relation FROM (
        |  SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS src_id,
        |    'n' || CAST(c_nationkey AS VARCHAR) AS dst_id,
        |    CASE WHEN c_acctbal < 0 THEN 'owes' ELSE 'holds' END AS relation
        |  FROM customer WHERE c_custkey % 20 = 0
        |  UNION
        |  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR),
        |    'n' || CAST(s_nationkey AS VARCHAR), 'supplies'
        |  FROM supplier WHERE s_suppkey % 5 = 0)
        |ORDER BY src_id, dst_id, relation""".stripMargin,

    "q_edge_direct_weights" ->
      """SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src_name,
        |  'm' || CAST(o_orderkey % 7 AS VARCHAR) AS dst_name,
        |  o_orderpriority AS relation,
        |  CAST(o_orderdate AS VARCHAR) AS odate
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY src_name, dst_name, relation, odate""".stripMargin,

    "q_png_roundtrip" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 100),
        |xs AS (SELECT unnest(generate_series(0, 15)) AS x),
        |ys AS (SELECT unnest(generate_series(0, 11)) AS y)
        |SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
        |  CAST(sum((x * 3 + y * 5 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((x * 7 + y + 2 * doc_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((x + y * 11 + 3 * doc_id) % 256) AS BIGINT) AS sum_b
        |FROM d, xs, ys GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_jpeg_decode" ->
      """SELECT doc_id, CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
        |  true AS psnr_ok
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    // literal rows = the reference FuzzyMatcher's own executed output for
    // this grid (tools/gen_fuzzy_fixture.py provenance)
    "q_fuzzy_fragment" ->
      """SELECT fragment, matched, score FROM (VALUES
        |    ('c_custkey', NULL, 0.0),
        |    ('customer_id', 'customer', 0.9),
        |    ('supplier_fk', 'supplier', 0.9),
        |    ('nationkey', 'nation', 0.8),
        |    ('region', 'region', 1.0),
        |    ('part_key', 'part', 0.9),
        |    ('order', 'orders', 0.95),
        |    ('lineitems', 'lineitem', 0.95),
        |    ('l_orderkey', NULL, 0.0),
        |    ('custome', 'customer', 0.95),
        |    ('suplier', 'supplier', 0.933333),
        |    ('regio', 'region', 0.95),
        |    ('fk_nation', 'nation', 0.9),
        |    ('reference_part', 'part', 0.9),
        |    ('partsupp', NULL, 0.0),
        |    ('o_orderdate', NULL, 0.0),
        |    ('lineitem_ref', 'lineitem', 0.9),
        |    ('natio', 'nation', 0.95)
        |) t(fragment, matched, score)
        |ORDER BY fragment""".stripMargin)
}
