package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.MediaContainers

/** Round-7 battery entries: real container-level parsing for compressed
  * audio/video media columns — MPEG audio (MP3) frame-header walking and
  * MP4 / ISO-BMFF box-tree metadata (`ext/MediaContainers.scala`). The
  * synthesized payloads are genuine container bytes with closed-form
  * parameters, so the pack→parse round-trip has an exact DuckDB oracle —
  * the same discipline as the WAV/PNG queries.
  */
object GraftQueriesR7 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

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
