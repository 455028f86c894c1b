package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 battery additions.
  *
  * q_mp3_decode — full MPEG-1 Layer III decode (ext/Mp3Layer3: bit
  * reservoir, side info, table-15 Huffman spectrum, requantization,
  * IMDCT, 32-band polyphase synthesis) over REAL frames produced by the
  * in-repo encoder (ext/Mp3Encoder) from deterministic per-id tones. The
  * fidelity leg is the delay+gain-fitted PSNR against the regenerated
  * tone (`psnr_ok`, threshold 20 dB — single tones measure ~25-27 dB
  * through the 4-bit table-15 quantizer); the structural fields replay in
  * closed form in the oracle like the other codec queries
  * (q_mjpeg_decode's `psnr_ok: true` pattern).
  */
object GraftQueriesR8 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    "q_mp3_decode" -> { (s, d) =>
      val ids = t(s, d)("documents").select(col("doc_id")).where(col("doc_id") < 60)
      graft.ext.Multimodal.mp3DecodeFrame(
        graft.ext.Multimodal.synthesizeMp3Audio(ids, "doc_id", nGranules = 6),
        "doc_id", nGranules = 6, minPsnrDb = 20.0)
        .orderBy("doc_id")
    },

    // §2.10 the reference's direction dialect, battery-pinned: OUT from a
    // raw-id anchor follows a directed CROSS-TYPE edge from EITHER side
    // (customer→nation outbound AND orders→customer served inbound,
    // db/traversal.py:246-265), and the anchor itself is never in the
    // result container. Executed-parity corners live in
    // ReferenceQueryParitySpec; this row keeps the dialect under the
    // DuckDB gate too.
    "q_neighbor_out" -> { (s, d) =>
      import graft.query._
      import graft.model._
      val cust = t(s, d)("customer"); val nat = t(s, d)("nation")
      val ord = t(s, d)("orders")
      val vs = Map("customer" -> cust, "nation" -> nat, "orders" -> ord)
      val es = Map(
        EdgeKey("customer", "nation", "in_nation") -> cust.select(
          col("c_custkey").as("src_c_custkey"),
          col("c_nationkey").as("dst_n_nationkey")),
        EdgeKey("orders", "customer", "placed_by") -> ord.select(
          col("o_orderkey").as("src_o_orderkey"),
          col("o_custkey").as("dst_c_custkey")))
      val reader = new GraphReader(graft.fixtures.TpchGraph.schema,
        n => vs.getOrElse(n, throw new NoSuchElementException(s"no vertex collection: $n")),
        k => es.get(k), QueryCaps.Hard.copy(timeoutSeconds = 600))
      val out = reader.neighbors(
        NeighborQuery.byId("customer", "7", direction = Direction.Out))
      out.vertices.toSeq.sortBy(_._1).map { case (n, df) =>
        df.agg(count(lit(1)).as("cnt")).withColumn("vtype", lit(n))
      }.reduce(_.unionByName(_)).select("vtype", "cnt").orderBy("vtype")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_mp3_decode" ->
      """SELECT doc_id, CAST(44100 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels, CAST(6 AS BIGINT) AS n_granules,
        |  CAST(3456 AS BIGINT) AS n_samples, true AS psnr_ok
        |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin,

    "q_neighbor_out" ->
      """SELECT 'customer' AS vtype, CAST(0 AS BIGINT) AS cnt
        |UNION ALL SELECT 'nation', CAST(1 AS BIGINT)
        |UNION ALL SELECT 'orders', count(*) FROM orders WHERE o_custkey = 7
        |ORDER BY vtype""".stripMargin
  )
}
