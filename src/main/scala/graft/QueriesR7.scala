package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.MediaContainers

/** Round-7 battery entries: real compressed-media handling (MP3/MP4
  * container metadata, G.711 + IMA-ADPCM audio decode, MJPEG-in-AVI video
  * decode), the audio face of the dedup family (WHT spectral fingerprints
  * + gram-Jaccard near-dups), the strict PYTHON filter flavor, assigned
  * identities, manifest projection, full identity inference, and a
  * watermarked stream-stream interval join. Synthesized payloads use
  * closed-form parameters so every query has an exact DuckDB oracle —
  * the same discipline as the WAV/PNG queries.
  */
object GraftQueriesR7 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    graft.fixtures.TpchGraph.table(s, dir, name)

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Copy a parquet input that may be a single FILE (driver testdata) or a
    * DIRECTORY of part files (synthesized sf1 tables) into `dstDir` as
    * `<stem>*.parquet` — the shape a streaming file source scans.
    */
  private[graft] def copyParquetInto(src: String,
      dstDir: java.nio.file.Path, stem: String): Unit = {
    val f = new java.io.File(src)
    if (f.isFile)
      java.nio.file.Files.copy(f.toPath, dstDir.resolve(s"$stem.parquet")): Unit
    else
      Option(f.listFiles).getOrElse(Array.empty)
        .filter(p => p.isFile && p.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.foreach { case (p, i) =>
          java.nio.file.Files.copy(p.toPath,
            dstDir.resolve(f"$stem%s_$i%04d.parquet")): Unit
        }
  }

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(

    // extension: MP3 frame-header walk — ID3v2 skip, MPEG1/MPEG2 Layer III
    // framing, per-frame padding, Xing VBR tag detection; every output
    // field replays from the id arithmetic in SQL
    "q_mp3_meta" -> { (s, d) =>
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 200)
      val packed = MediaContainers.synthesizeMp3(ids, "doc_id")
      MediaContainers.mp3MetaFrame(packed, "doc_id")
        .select(col("doc_id"), col("id3_bytes"), col("n_frames"),
          col("sample_rate"), col("channels"),
          round(col("bitrate_kbps"), 2).as("bitrate_kbps"),
          round(col("duration_ms"), 2).as("duration_ms"),
          col("mode"), col("xing_frames"))
        .orderBy("doc_id")
    },

    // §2.5 the reference's strict PYTHON filter flavor (dunder-direct, no
    // coercion — onto.py:499-523), compiled statically against the frame
    // schema: the cross-type `== "25"` leaf is constant-false (so its NOT
    // passes every row), and IN coerces numeric kinds like real Python `in`
    "q_filter_python_flavor" -> { (s, d) =>
      import graft.expr.FilterExpr
      val filt = FilterExpr.parse(Map("AND" -> Seq(
        Seq(">", 20L, "p_size"),
        Map("NOT" -> Seq(Seq("==", "25", "p_size"))), // str vs int col → False → NOT → True
        Map("field" -> "p_size", "cmp_operator" -> "IN",
          "value" -> Seq(30.0, 35L, true))))) // 30.0 and true coerce; "1" would not
      val df = t(s, d)("part")
      df.where(FilterExpr.compilePython(filt, df.schema))
        .select(col("p_partkey"), col("p_size"))
        .orderBy("p_partkey")
    },

    // extension: REAL G.711 μ-law/A-law decode (ITU-T G.711 segment
    // expansion, a pure closed-form integer kernel) over WAV format tags
    // 7/6 — compressed bytes are closed-form, so the decoded 16-bit
    // sample aggregates replay exactly in SQL through the same formula
    "q_g711_decode" -> { (s, d) =>
      import graft.ext.Multimodal
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 200)
      val u = Multimodal.pcmStatsFrame(
        Multimodal.synthesizeG711(ids, "doc_id", n = 240, aLaw = false), "doc_id")
        .withColumn("codec", lit("ulaw"))
      val a = Multimodal.pcmStatsFrame(
        Multimodal.synthesizeG711(ids, "doc_id", n = 240, aLaw = true), "doc_id")
        .withColumn("codec", lit("alaw"))
      u.unionByName(a)
        .select(col("doc_id"), col("codec"), col("sample_rate"),
          col("n_samples"), col("sum_pcm"), col("min_pcm"), col("max_pcm"))
        .orderBy("doc_id", "codec")
    },

    // extension: REAL IMA/DVI ADPCM decode (WAV tag 0x11) — per-block
    // {predictor, step-index} headers + 4-bit nibbles, blocks independent
    // (the 100 TB property), fact-chunk trim; the step-table recurrence
    // replays in SQL as a per-block recursive CTE
    "q_adpcm_decode" -> { (s, d) =>
      import graft.ext.Multimodal
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 150)
      Multimodal.pcmStatsFrame(
        Multimodal.synthesizeImaAdpcm(ids, "doc_id", nSamples = 97,
          samplesPerBlock = 33), "doc_id")
        .orderBy("doc_id")
    },

    // extension: REAL video decode — MJPEG-in-AVI: RIFF container walk +
    // per-frame JDK JPEG decode, PSNR-gated per frame against the known
    // source raster (the q_jpeg_decode lossy-codec discipline)
    "q_mjpeg_decode" -> { (s, d) =>
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 60)
      MediaContainers.aviFrameCheck(
        MediaContainers.synthesizeAvi(ids, "doc_id", w = 16, h = 12,
          quality = 0.9f),
        "doc_id", w = 16, h = 12, minPsnrDb = 15.0)
        .orderBy("doc_id", "frame_idx")
    },

    // §2.12 full identity inference (identity_inference.py): eligible
    // columns by type cost, parsimony + semantic ranking, unary winner
    // with bootstrap stability — c_custkey (unique, int, *key suffix)
    // beats the equally-unique c_name string
    "q_identity_full" -> { (s, d) =>
      import s.implicits._
      val r = graft.infer.IdentityInferencer.infer(
        t(s, d)("customer").select("c_custkey", "c_name", "c_nationkey",
          "c_mktsegment"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        maxSampleSize = 2000)
      r.identity.zipWithIndex
        .map { case (f, i) => (r.strategy, i.toLong, f) }
        .toDF("strategy", "pos", "field").orderBy("pos")
    },

    // §2.11 stream-stream INTERVAL join: two watermarked streams of the
    // same event feed (even/odd split), per-user join within a 30-minute
    // event-time bound, append-mode sink — with complete input the
    // streaming answer equals the static interval join the oracle runs
    "q_stream_join" -> { (s, d) =>
      val root = GraftQueries.scratch(s, "sjoin", d)
      deleteRecursively(new java.io.File(root))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val inDir = java.nio.file.Paths.get(s"$root/in")
      java.nio.file.Files.createDirectories(inDir)
      copyParquetInto(s"$d/events.parquet", inDir, "events")
      val batchSchema = graft.fixtures.TpchGraph.table(s, d, "events").schema
      def src() = graft.fixtures.TpchGraph.normalizeEventTs(
        s.readStream.schema(batchSchema).parquet(inDir.toString))
      val a = src().where(col("event_id") % 2 === 0)
        .select(col("user_id"), col("ts").as("a_ts"))
        .withWatermark("a_ts", "365 days")
      val b = src().where(col("event_id") % 2 === 1)
        .select(col("user_id").as("user_id_b"), col("ts").as("b_ts"))
        .withWatermark("b_ts", "365 days")
      val joined = a.join(b,
        col("user_id") === col("user_id_b") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 30 MINUTES"))
      // state-partition count from input size (4 state stores per
      // partition for an interval join — see withStreamShufflePartitions)
      GraftQueries.withStreamShufflePartitions(s,
        GraftQueries.parquetInputBytes(s"$d/events.parquet")) {
        val q = joined.writeStream.format("parquet")
          .option("path", s"$root/out").option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.read.parquet(s"$root/out")
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },

    // §2.3 assigned identity mode (identity_uuid.py keep-present /
    // mint-when-empty): even custkeys arrive with a closed-form UUID that
    // must survive untouched; odd custkeys arrive empty and mint — minted
    // values are engine-deterministic but not SQL-replicable, so the
    // oracle checks the KEPT flag and UUID validity per row
    "q_assigned_identity" -> { (s, d) =>
      val m = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: t
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: session
          |                properties: [sid, user]
          |                identity: [sid]
          |                assigned: true
          |        edge_config:
          |            edges: []
          |ingestion_model:
          |    resources:
          |    -   name: r
          |        pipeline:
          |        -   vertex: session
          |""".stripMargin)
      val mhex = md5(col("c_custkey").cast("string"))
      val presentUuid = concat_ws("-",
        substring(mhex, 1, 8), substring(mhex, 9, 4), substring(mhex, 13, 4),
        substring(mhex, 17, 4), substring(mhex, 21, 12))
      val base = t(s, d)("customer").where(col("c_custkey") <= 1000)
      val rows = base.select(
        when(col("c_custkey") % 2 === 0, presentUuid).otherwise(lit(null))
          .as("sid"),
        col("c_name").as("user"))
      val g = graft.pipeline.PipelineCompiler.compile(m.schema,
        m.resource("r"), rows)
      // the vertex frame carries only declared properties — join the
      // expected closed-form UUID back by the unique user name
      val expect = base.select(col("c_name").as("user"),
        presentUuid.as("_expect"))
      g.vertex("session").join(broadcast(expect), Seq("user"))
        .select(col("user"),
          (col("sid") === col("_expect")).as("kept"),
          col("sid").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
            .as("valid"))
        .orderBy("user")
    },

    // §2.13 manifest projection (ProjectManifestOp / select_induced):
    // slice a manifest to a vertex/edge subgraph — endpoint-closed edges,
    // induced prune of isolated requested vertices, pipeline cascade — then
    // RUN the projected pipeline; the dropped segment vertex/edge must not
    // appear even though the original pipeline declared them
    "q_project_manifest" -> { (s, d) =>
      import graft.model.EdgeKey
      val m = graft.manifest.ManifestLoader.fromYamlString(
        """schema:
          |    metadata:
          |        name: proj
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: customer
          |                properties: [c_name]
          |                identity: [c_custkey]
          |            -   name: nation
          |                properties: []
          |                identity: [n_id]
          |            -   name: segment
          |                properties: []
          |                identity: [seg]
          |        edge_config:
          |            edges:
          |            -   source: customer
          |                target: nation
          |                relation: in_nation
          |            -   source: customer
          |                target: segment
          |                relation: in_segment
          |ingestion_model:
          |    resources:
          |    -   name: customer
          |        pipeline:
          |        -   vertex: customer
          |        -   vertex: nation
          |            from:
          |                n_id: c_nationkey
          |            mapped_only: true
          |        -   vertex: segment
          |            from:
          |                seg: c_mktsegment
          |            mapped_only: true
          |        -   source: customer
          |            target: nation
          |        -   source: customer
          |            target: segment
          |""".stripMargin)
      val p = graft.evolve.Project.projectManifest(m,
        keepVertices = Some(Seq("customer", "nation")))
      val g = graft.pipeline.PipelineCompiler.compile(p.schema,
        p.resource("customer"), t(s, d)("customer"))
      val vRows = p.schema.vertices.map(v =>
        g.vertex(v.name).agg(countDistinct(col(v.idColumns.head)).as("cnt"))
          .withColumn("coll", lit(v.name)))
      val eRows = p.schema.edges.map(e =>
        g.edge(EdgeKey(e.source, e.target, e.relation))
          .agg(count(lit(1)).as("cnt")).withColumn("coll", lit(e.relation)))
      (vRows ++ eRows).reduce(_.unionByName(_))
        .select(col("coll"), col("cnt")).orderBy("coll")
    },

    // extension: spectral audio fingerprint — 64-sample windows, integer
    // Walsh–Hadamard transform (exact; Hadamard signs = popcount parity,
    // so SQL replays it via bit_count), peak band per window, 4-gram
    // shingles (the constellation-hash idea in exact integer math)
    "q_audio_fingerprint" -> { (s, d) =>
      import graft.ext.Multimodal
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 80)
      val wav = Multimodal.synthesizeWavTones(ids, "doc_id", n = 320,
        sampleRate = 8000)
      Multimodal.audioFingerprint(wav, "doc_id").orderBy("doc_id", "w")
    },

    // extension: audio near-duplicate pairs — the audio face of the dedup
    // family (text shingles / image dHash): exact Jaccard over df-capped
    // fingerprint gram sets (sizes + intersections in the same capped
    // universe), candidates meet on a shared gram (banded, never
    // all-pairs); id folding (seedMod=40) plants exact dups
    "q_audio_neardup" -> { (s, d) =>
      import graft.ext.Multimodal
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 80)
      val wav = Multimodal.synthesizeWavTones(ids, "doc_id", n = 320,
        sampleRate = 8000, seedMod = 40)
      Multimodal.audioNearDups(wav, "doc_id", "media", minJaccard = 0.9)
        .orderBy("id_a", "id_b")
    },

    // extension: MP4 / ISO-BMFF box-tree parse — ftyp/mvhd/tkhd/mdhd/hdlr/
    // stsd/stts/stsz/stss over a two-track (video+audio) synthesized file;
    // one output row per track (the frame-sampling planner's shape)
    "q_mp4_meta" -> { (s, d) =>
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 150)
      val packed = MediaContainers.synthesizeMp4(ids, "doc_id")
      MediaContainers.mp4MetaFrame(packed, "doc_id")
        .select(col("doc_id"), col("major_brand"), col("track_id"),
          col("handler"), col("codec"), col("timescale"), col("n_samples"),
          col("sample_bytes"), col("n_keyframes"),
          round(col("duration_ms"), 2).as("duration_ms"),
          col("width"), col("height"))
        .orderBy("doc_id", "track_id")
    })

  val oracles: Map[String, String] = Map(

    // closed-form replay of synthesizeMp3: bitrate index 2+id%13 into the
    // MPEG1-LIII / MPEG2-LII&III tables, 576 vs 1152 samples/frame,
    // ID3v2 = 10 + (1 + id%50) when id%5=0, Xing declares walked count
    "q_mp3_meta" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |p AS (SELECT doc_id,
        |  doc_id % 3 = 0 AS mpeg2,
        |  CAST(2 + doc_id % 13 AS INT) AS br_idx,
        |  CAST(20 + doc_id % 30 AS BIGINT) AS nf FROM d),
        |q AS (SELECT doc_id, nf,
        |  CASE WHEN doc_id % 5 = 0 THEN 10 + 1 + doc_id % 50 ELSE 0 END AS id3_bytes,
        |  CASE WHEN mpeg2 THEN 22050 ELSE 44100 END AS sample_rate,
        |  CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END AS channels,
        |  CASE WHEN mpeg2
        |    THEN list_value(16,24,32,40,48,56,64,80,96,112,128,144,160)[br_idx - 1]
        |    ELSE list_value(40,48,56,64,80,96,112,128,160,192,224,256,320)[br_idx - 1]
        |  END AS bitrate,
        |  CASE WHEN mpeg2 THEN 576 ELSE 1152 END AS spf FROM p)
        |SELECT doc_id,
        |  CAST(id3_bytes AS BIGINT) AS id3_bytes,
        |  nf AS n_frames,
        |  CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(channels AS BIGINT) AS channels,
        |  round(CAST(bitrate AS DOUBLE), 2) AS bitrate_kbps,
        |  round(nf * spf * 1000.0 / sample_rate, 2) AS duration_ms,
        |  CASE WHEN doc_id % 5 = 0 THEN 'VBR' ELSE 'CBR' END AS mode,
        |  CASE WHEN doc_id % 5 = 0 THEN nf ELSE NULL END AS xing_frames
        |FROM q ORDER BY doc_id""".stripMargin,

    // the strict-flavor tree reduces to: p_size > 20 AND p_size IN (30, 35, 1)
    // (the cross-type NOT leaf is always true; 30.0/true coerce under IN)
    "q_filter_python_flavor" ->
      """SELECT p_partkey, p_size FROM part
        |WHERE p_size > 20 AND p_size IN (30, 35, 1)
        |ORDER BY p_partkey""".stripMargin,

    // the G.711 expansion formulas verbatim: μ-law complement/bias/shift,
    // A-law xor-0x55 segment cases — over the same closed-form byte stream
    "q_g711_decode" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |i AS (SELECT unnest(generate_series(0, 239)) AS i),
        |b AS (SELECT doc_id, (doc_id * 31 + i * 7) % 256 AS byte FROM d, i),
        |c AS (SELECT doc_id, 255 - byte AS ub, xor(byte, 85) AS ab FROM b),
        |vals AS (
        |  SELECT doc_id, 'ulaw' AS codec,
        |    CASE WHEN ub >= 128
        |      THEN 132 - ((((ub & 15) << 3) + 132) << ((ub & 112) >> 4))
        |      ELSE ((((ub & 15) << 3) + 132) << ((ub & 112) >> 4)) - 132
        |    END AS v
        |  FROM c
        |  UNION ALL
        |  SELECT doc_id, 'alaw',
        |    CASE WHEN (ab & 128) != 0 THEN t ELSE -t END
        |  FROM (SELECT doc_id, ab,
        |      CASE WHEN ((ab & 112) >> 4) = 0 THEN ((ab & 15) << 4) + 8
        |           WHEN ((ab & 112) >> 4) = 1 THEN ((ab & 15) << 4) + 264
        |           ELSE (((ab & 15) << 4) + 264) * (1 << (((ab & 112) >> 4) - 1))
        |      END AS t
        |    FROM c))
        |SELECT doc_id, codec, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(240 AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_pcm,
        |  CAST(min(v) AS BIGINT) AS min_pcm,
        |  CAST(max(v) AS BIGINT) AS max_pcm
        |FROM vals GROUP BY doc_id, codec ORDER BY doc_id, codec""".stripMargin,

    // the published IMA recurrence as a per-block recursive CTE: step-table
    // list literal, nibble from the closed form, clamp to [-32768,32767]
    // and [0,88]; fact-chunk trim = the b*33+j < 97 filter
    "q_adpcm_decode" ->
      """WITH RECURSIVE d AS (SELECT doc_id FROM documents WHERE doc_id < 150),
        |blk AS (SELECT doc_id, unnest(generate_series(0, 2)) AS b FROM d),
        |r AS (
        |  SELECT doc_id, b, 0 AS j,
        |    CAST((doc_id * 13 + b * 101) % 1024 - 512 AS INTEGER) AS pred,
        |    CAST((doc_id + b * 7) % 40 AS INTEGER) AS idx
        |  FROM blk
        |  UNION ALL
        |  SELECT doc_id, b, j + 1,
        |    CAST(GREATEST(-32768, LEAST(32767,
        |      CASE WHEN (nib & 8) != 0 THEN pred - diff ELSE pred + diff END))
        |      AS INTEGER),
        |    CAST(GREATEST(0, LEAST(88, idx +
        |      CASE WHEN (nib & 7) < 4 THEN -1 ELSE 2 * ((nib & 7) - 3) END))
        |      AS INTEGER)
        |  FROM (
        |    SELECT doc_id, b, j, pred, idx, nib,
        |      (s >> 3) + CASE WHEN (nib & 4) != 0 THEN s ELSE 0 END
        |               + CASE WHEN (nib & 2) != 0 THEN s >> 1 ELSE 0 END
        |               + CASE WHEN (nib & 1) != 0 THEN s >> 2 ELSE 0 END AS diff
        |    FROM (
        |      SELECT doc_id, b, j, pred, idx,
        |        CAST((doc_id * 7 + b * 3 + j * 5) % 16 AS INTEGER) AS nib,
        |        ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,
        |          50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,
        |          230,253,279,307,337,371,408,449,494,544,598,658,724,796,
        |          876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,
        |          2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,
        |          7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,
        |          20350,22385,24623,27086,29794,32767])[idx + 1] AS s
        |      FROM r WHERE j < 32) q1) q2)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(97 AS BIGINT) AS n_samples,
        |  CAST(sum(pred) AS BIGINT) AS sum_pcm,
        |  CAST(min(pred) AS BIGINT) AS min_pcm,
        |  CAST(max(pred) AS BIGINT) AS max_pcm
        |FROM r WHERE b * 33 + j < 97
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the unary winner is fully determined by the data contract (unique
    // integer key column with the semantic suffix)
    "q_identity_full" ->
      """SELECT 'unary' AS strategy, CAST(0 AS BIGINT) AS pos,
        |  'c_custkey' AS field""".stripMargin,

    // the static interval join the streaming answer converges to
    "q_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events),
        |a AS (SELECT user_id, ts AS a_ts FROM e WHERE event_id % 2 = 0),
        |b AS (SELECT user_id, ts AS b_ts FROM e WHERE event_id % 2 = 1)
        |SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM a JOIN b ON a.user_id = b.user_id
        |  AND b.b_ts >= a.a_ts
        |  AND b.b_ts <= a.a_ts + INTERVAL 30 MINUTE
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    // kept = the present (even-key) closed-form UUID survived untouched;
    // odd keys minted an engine-deterministic UUID the oracle checks only
    // for validity
    "q_assigned_identity" ->
      """SELECT c_name AS user, (c_custkey % 2 = 0) AS kept, true AS valid
        |FROM customer WHERE c_custkey <= 1000
        |ORDER BY user""".stripMargin,

    // the projected manifest keeps customer/nation/in_nation only; segment
    // and in_segment are gone, so the replay is plain counts over customer
    "q_project_manifest" ->
      """SELECT 'customer' AS coll, COUNT(DISTINCT c_custkey) AS cnt FROM customer
        |UNION ALL
        |SELECT 'in_nation', COUNT(DISTINCT (c_custkey, c_nationkey)) FROM customer
        |UNION ALL
        |SELECT 'nation', COUNT(DISTINCT c_nationkey) FROM customer
        |ORDER BY coll""".stripMargin,

    // full integer replay of the fingerprint pipeline: closed-form PCM,
    // WHT via bit_count parity signs, band energies, peak argmax
    // (energy desc, band asc), 4-gram assembly
    "q_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 80),
        |i AS (SELECT unnest(generate_series(0, 319)) AS i),
        |x AS (SELECT doc_id, i,
        |        CAST(CASE WHEN (i // (2 + doc_id % 13)) % 2 = 0
        |          THEN 700 ELSE -700 END
        |          + (i * (doc_id + 3)) % 400 - 200 AS BIGINT) AS xv
        |      FROM d, i),
        |w AS (SELECT unnest(generate_series(0, 8)) AS w),
        |k AS (SELECT unnest(generate_series(0, 63)) AS k),
        |c AS (SELECT doc_id, w, k,
        |        sum(xv * (1 - 2 * (bit_count(j & k) % 2))) AS c
        |      FROM (SELECT x.doc_id, w.w AS w, x.i - w.w * 32 AS j, x.xv
        |            FROM x, w WHERE x.i >= w.w * 32 AND x.i < w.w * 32 + 64), k
        |      GROUP BY doc_id, w, k),
        |e AS (SELECT doc_id, w, k // 8 AS b, sum(abs(c)) AS e
        |      FROM c GROUP BY doc_id, w, k // 8),
        |p AS (SELECT doc_id, w, b AS peak FROM (
        |        SELECT doc_id, w, b,
        |          row_number() OVER (PARTITION BY doc_id, w
        |                             ORDER BY e DESC, b ASC) AS rn
        |        FROM e WHERE b >= 1) q WHERE rn = 1)
        |SELECT p0.doc_id, p0.w,
        |  p0.peak + p1.peak * 8 + p2.peak * 64 + p3.peak * 512 AS gram
        |FROM p p0
        |JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.w = p0.w + 1
        |JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.w = p0.w + 2
        |JOIN p p3 ON p3.doc_id = p0.doc_id AND p3.w = p0.w + 3
        |ORDER BY p0.doc_id, p0.w""".stripMargin,

    // same fingerprint replay over the FOLDED id space (seed = id % 40),
    // then exact Jaccard over the df-CAPPED distinct-gram sets (sizes and
    // intersections share the capped universe — audioNearDups contract)
    "q_audio_neardup" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 80),
        |i AS (SELECT unnest(generate_series(0, 319)) AS i),
        |x AS (SELECT doc_id, i,
        |        CAST(CASE WHEN (i // (2 + (doc_id % 40) % 13)) % 2 = 0
        |          THEN 700 ELSE -700 END
        |          + (i * ((doc_id % 40) + 3)) % 400 - 200 AS BIGINT) AS xv
        |      FROM d, i),
        |w AS (SELECT unnest(generate_series(0, 8)) AS w),
        |k AS (SELECT unnest(generate_series(0, 63)) AS k),
        |c AS (SELECT doc_id, w, k,
        |        sum(xv * (1 - 2 * (bit_count(j & k) % 2))) AS c
        |      FROM (SELECT x.doc_id, w.w AS w, x.i - w.w * 32 AS j, x.xv
        |            FROM x, w WHERE x.i >= w.w * 32 AND x.i < w.w * 32 + 64), k
        |      GROUP BY doc_id, w, k),
        |e AS (SELECT doc_id, w, k // 8 AS b, sum(abs(c)) AS e
        |      FROM c GROUP BY doc_id, w, k // 8),
        |p AS (SELECT doc_id, w, b AS peak FROM (
        |        SELECT doc_id, w, b,
        |          row_number() OVER (PARTITION BY doc_id, w
        |                             ORDER BY e DESC, b ASC) AS rn
        |        FROM e WHERE b >= 1) q WHERE rn = 1),
        |g AS (SELECT DISTINCT p0.doc_id AS id,
        |        p0.peak + p1.peak * 8 + p2.peak * 64 + p3.peak * 512 AS gram
        |      FROM p p0
        |      JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.w = p0.w + 1
        |      JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.w = p0.w + 2
        |      JOIN p p3 ON p3.doc_id = p0.doc_id AND p3.w = p0.w + 3),
        |kept AS (SELECT id, gram FROM g WHERE gram IN (
        |        SELECT gram FROM g GROUP BY gram HAVING count(*) <= 10000)),
        |sz AS (SELECT id, count(*) AS n FROM kept GROUP BY id),
        |pr AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        |       FROM kept a JOIN kept b ON a.gram = b.gram AND a.id < b.id
        |       GROUP BY a.id, b.id)
        |SELECT id_a, id_b,
        |  round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM pr
        |JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
        |WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    // closed-form frame grid (2 + id%4 frames at 24 fps); the PSNR gate is
    // the lossy-codec banded check, same shape as q_jpeg_decode
    "q_mjpeg_decode" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 60),
        |f AS (SELECT doc_id,
        |  unnest(generate_series(0, CAST(1 + doc_id % 4 AS BIGINT))) AS frame_idx
        |  FROM d)
        |SELECT doc_id, frame_idx, CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height, CAST(24.0 AS DOUBLE) AS fps,
        |  true AS psnr_ok
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // closed-form replay of synthesizeMp4's two tracks: 24 fps video at
    // timescale 90000 (delta 3750, keyframe per second) + AAC-framed audio
    // at 44100 (delta 1024)
    "q_mp4_meta" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 10 AS secs
        |  FROM documents WHERE doc_id < 150)
        |SELECT doc_id, 'isom' AS major_brand, CAST(1 AS BIGINT) AS track_id,
        |  'vide' AS handler, 'avc1' AS codec, CAST(90000 AS BIGINT) AS timescale,
        |  CAST(secs * 24 AS BIGINT) AS n_samples,
        |  CAST((500 + doc_id % 100) * secs * 24 AS BIGINT) AS sample_bytes,
        |  CAST(secs AS BIGINT) AS n_keyframes,
        |  round(secs * 24 * 3750 * 1000.0 / 90000, 2) AS duration_ms,
        |  CAST(320 AS DOUBLE) AS width, CAST(240 AS DOUBLE) AS height
        |FROM d
        |UNION ALL
        |SELECT doc_id, 'isom', CAST(2 AS BIGINT), 'soun', 'mp4a',
        |  CAST(44100 AS BIGINT),
        |  CAST(secs * 43 AS BIGINT),
        |  CAST((200 + doc_id % 50) * secs * 43 AS BIGINT),
        |  CAST(0 AS BIGINT),
        |  round(secs * 43 * 1024 * 1000.0 / 44100, 2),
        |  CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
        |FROM d
        |ORDER BY doc_id, track_id""".stripMargin)
}
