package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 battery additions.
  *
  * q_evolution_relmap — the evolution round-trip on a RELATION-MAPPED
  * edge step: cascade-normalizing ops flatten `edge:` wrappers into flat
  * `type: edge` steps, and the loader must keep the wrapper's
  * relation_map semantics on the normalized form (a dispatch that falls
  * into the source/target SHORTHAND branch silently stops applying the
  * map and every mapped relation count drops to zero — the round-9
  * advisor finding this row pins).
  *
  * q_evolution_physical — the physical/field-type evolution surface end
  * to end: a manifest with a db_profile evolves through the index ops +
  * SetFieldType/SetEdgeFieldType + the index-pruning cascades
  * (RemoveProperty endpoint pruning, RemoveSecondaryIdentity derived-
  * index pruning — reference apply.py:684-696, identity.py:533-540),
  * with every op ridden through the revision codec, and the evolved
  * index/type surface is exposed as a DataFrame alongside a re-ingested
  * row count from the evolved schema.
  */
object GraftQueriesR10 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    graft.fixtures.TpchGraph.table(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(

    // FLAC decode: real streams per row ([[graft.ext.FlacCodec]] —
    // STREAMINFO walk, framed FIXED/LPC/VERBATIM subframes, Rice
    // residuals, mid/side stereo, CRC-8/16), EXACT-match oracled
    // (lossless codec: sample equality, stronger than PSNR). Legs cycle
    // per id: mono best-FIXED, stereo MID/SIDE, mono LPC, mono VERBATIM.
    "q_flac_decode" -> { (s, d) =>
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 40)
      graft.ext.Multimodal.flacDecodeFrame(
        graft.ext.Multimodal.synthesizeFlacAudio(ids, "doc_id"), "doc_id")
        .orderBy("doc_id")
    },

    // OGG container walk ([[graft.ext.MediaContainers.parseOgg]]): CRC-32
    // verified pages, lacing reassembly across page boundaries (small
    // pages force continued packets; a multiple-of-255 packet exercises
    // the zero-lacing terminator), BOS codec identification for
    // Vorbis / Opus / FLAC-in-Ogg mapping headers.
    "q_ogg_meta" -> { (s, d) =>
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 60)
      graft.ext.MediaContainers.oggMetaFrame(
        graft.ext.MediaContainers.synthesizeOgg(ids, "doc_id"), "doc_id")
        .orderBy("doc_id")
    },

    "q_evolution_relmap" -> { (s, d) =>
      import graft.evolve._
      import graft.evolve.CascadeOp._
      val manifest =
        """schema:
          |    metadata:
          |        name: events-relmap
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: event
          |                properties:
          |                -   value
          |                identity:
          |                -   event_id
          |            -   name: user
          |                identity:
          |                -   user_id
          |        edge_config:
          |            edges:
          |            -   source: event
          |                target: user
          |                relation: clicked
          |            -   source: event
          |                target: user
          |                relation: errored
          |ingestion_model:
          |    resources:
          |    -   name: events
          |        pipeline:
          |        -   vertex: event
          |        -   vertex: user
          |            from:
          |                user_id: user_id
          |            mapped_only: true
          |            lookup_only: true
          |        -   edge:
          |                source: event
          |                target: user
          |                relation_field: event_type
          |                relation_map:
          |                    click: clicked
          |                    error: errored
          |""".stripMargin
      // the property rename triggers the cascade's step normalization:
      // the edge: wrapper flattens to {type: edge, ...} and must re-load
      // with relation_map still APPLYING
      val evolved = ManifestEvolution.evolveManifest(manifest, Seq(
        RenameVertexProperties(Seq("event" -> Seq("value" -> "amount")))))
      val events = graft.fixtures.TpchGraph.eventsTable(s, d)
      val parts = evolved.resources.map(r =>
        graft.pipeline.PipelineCompiler.compile(evolved.schema, r, events))
      val g = parts.reduceLeft(_.unionWith(_))
      Seq(
        g.edge(graft.model.EdgeKey("event", "user", "clicked"))
          .agg(count(lit(1)).as("cnt")).withColumn("item", lit("clicked")),
        g.edge(graft.model.EdgeKey("event", "user", "errored"))
          .agg(count(lit(1)).as("cnt")).withColumn("item", lit("errored")),
        g.vertex("event").agg(count(col("amount")).as("cnt"))
          .withColumn("item", lit("amount_nonnull"))
      ).reduce(_.unionByName(_)).select("item", "cnt").orderBy("item")
    },

    "q_evolution_physical" -> { (s, d) =>
      import graft.evolve._
      import graft.model._
      val manifest =
        """schema:
          |    metadata:
          |        name: phys
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: customer
          |                properties:
          |                -   c_name
          |                -   c_mktsegment
          |                -   c_acctbal
          |                identity:
          |                -   c_custkey
          |                secondary_identities:
          |                -   name: by_name
          |                    fields:
          |                    -   c_name
          |            -   name: orders
          |                properties:
          |                -   o_orderstatus
          |                -   o_totalprice
          |                identity:
          |                -   o_orderkey
          |        edge_config:
          |            edges:
          |            -   source: orders
          |                target: customer
          |                relation: placed_by
          |                properties:
          |                -   weight
          |    db_profile:
          |        vertex_indexes:
          |            customer:
          |            -   fields:
          |                -   c_mktsegment
          |                unique: false
          |        edge_specs:
          |        -   source: orders
          |            target: customer
          |            relation: placed_by
          |            indexes:
          |            -   fields:
          |                -   weight
          |            -   fields:
          |                -   weight
          |                -   c_mktsegment
          |ingestion_model:
          |    resources:
          |    -   name: customer
          |        pipeline:
          |        -   vertex: customer
          |""".stripMargin
      val loaded = graft.manifest.ManifestLoader.fromYamlString(manifest)
      import EvolutionOp._
      val ops: Seq[EvolutionOp] = Seq(
        AddVertexIndexes("orders", Seq(IndexDef(Seq("o_orderstatus"), unique = false))),
        SetFieldType("customer", "c_acctbal", FieldType.DoubleT),
        SetEdgeFieldType("placed_by", "weight", FieldType.DoubleT),
        // prunes the authored [c_mktsegment] vertex index (emptied → drops)
        // AND the edge-spec [weight, c_mktsegment] → [weight], which the
        // reference keeps as a duplicate of the existing [weight]
        RemoveProperty("customer", "c_mktsegment"),
        // prunes the secondary-derived [c_name] lookup index with the identity
        RemoveSecondaryIdentity("customer", "by_name"))
      // every op rides the revision codec (persistence face of migrate)
      val decoded = ops.map(op => RevisionStore.opFromJson(RevisionStore.opToJson(op)))
      val schema = Evolution(loaded.schema, decoded)
      def ixRows(owner: String, ixs: Seq[IndexDef], kind: String) =
        ixs.map(ix => (kind, owner,
          ix.fields.mkString(",") + "|unique=" + ix.unique))
      val surface =
        schema.vertices.flatMap(v => ixRows(v.name, v.indexes, "vertex_index")) ++
        schema.vertices.flatMap(v => v.properties.flatMap(p =>
          p.ftype.map(ft => ("field_type", v.name, s"${p.name}:$ft")))) ++
        schema.edges.flatMap(e =>
          ixRows(e.relation, e.specIndexes.getOrElse(Nil), "edge_index") ++
            e.properties.flatMap(p =>
              p.ftype.map(ft => ("edge_field_type", e.relation, s"${p.name}:$ft"))))
      import s.implicits._
      val meta = surface.toDF("kind", "owner", "detail")
      // re-ingest through the EVOLVED schema: the removed property must be
      // gone from the compiled vertex frame, the kept ones still feed
      val res = loaded.resources.find(_.name == "customer").get
      val cust = graft.pipeline.PipelineCompiler.compile(schema, res, t(s, d)("customer"))
        .vertex("customer")
      val dataRow = cust.agg(count(col("c_acctbal")).as("cnt"))
        .select(lit("data").as("kind"), lit("customer").as("owner"),
          concat(lit("acctbal_nonnull="), col("cnt")).as("detail"))
      meta.unionByName(dataRow).orderBy("kind", "owner", "detail")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_flac_decode" ->
      """SELECT doc_id, CAST(44100 AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 8 >= 4 THEN 32 ELSE 16 END AS BIGINT)
        |    AS bits_per_sample,
        |  CAST(5096 AS BIGINT) AS n_samples,
        |  true AS exact_match,
        |  CASE doc_id % 4 WHEN 1 THEN 'fixed' WHEN 2 THEN 'lpc'
        |    WHEN 3 THEN 'verbatim' ELSE 'fixed' END AS subframes
        |FROM documents WHERE doc_id < 40 ORDER BY doc_id""".stripMargin,

    "q_ogg_meta" ->
      """SELECT doc_id,
        |  -- 6 lacing segments (7 when the comment packet is 510 bytes),
        |  -- 2 per page: head(1) + comment(2|3) + three data packets(1)
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END AS BIGINT) AS n_pages,
        |  CAST(5 AS BIGINT) AS n_packets,
        |  CAST(4096 + doc_id AS BIGINT) AS serial,
        |  CAST(2880 AS BIGINT) AS last_granule,
        |  CASE doc_id % 3 WHEN 0 THEN 'vorbis' WHEN 1 THEN 'opus'
        |    ELSE 'flac' END AS codec,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 2 WHEN 1 THEN 2
        |    ELSE 1 END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 48000 ELSE 44100 END AS BIGINT)
        |    AS sample_rate,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 312 ELSE 0 END AS BIGINT)
        |    AS pre_skip
        |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin,

    "q_evolution_relmap" ->
      """SELECT 'amount_nonnull' AS item, count(value) AS cnt FROM events
        |UNION ALL SELECT 'clicked', count(*) FROM events WHERE event_type = 'click'
        |UNION ALL SELECT 'errored', count(*) FROM events WHERE event_type = 'error'
        |ORDER BY item""".stripMargin,

    "q_evolution_physical" ->
      """SELECT kind, owner, detail FROM (
        |  SELECT 'vertex_index' AS kind, 'orders' AS owner,
        |         'o_orderstatus|unique=false' AS detail
        |  UNION ALL SELECT 'field_type', 'customer', 'c_acctbal:DoubleT'
        |  UNION ALL SELECT 'edge_index', 'placed_by', 'weight|unique=true'
        |  UNION ALL SELECT 'edge_index', 'placed_by', 'weight|unique=true'
        |  UNION ALL SELECT 'edge_field_type', 'placed_by', 'weight:DoubleT'
        |  UNION ALL SELECT 'data', 'customer',
        |    'acctbal_nonnull=' || (SELECT count(c_acctbal) FROM customer)
        |) ORDER BY kind, owner, detail""".stripMargin
  )
}
