package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over embedding columns — the canonical
  * "cluster 100 TB of vectors" primitive under corpus domain discovery,
  * SemDeDup cell seeding and data-map visualization.
  *
  * Reference scope: the reference engine has no clustering operator; this is
  * a north-star extension in the house fixed-point style
  * ([[graft.graph.GraphAlgos.pageRankFixed]], [[Corpus.perceptronTrain]]):
  *
  *   - Coordinates quantize to integer micro-units BEFORE any aggregation,
  *     so per-cluster sums are exact longs — accumulation order (partition
  *     count, AQE re-plans, speculative retries) cannot move the result,
  *     and a SQL engine replays the run bit-for-bit.
  *   - Init is data-deterministic: the k rows with the smallest
  *     `md5(id)` seed the centroids (cluster ordinal = md5 rank), so reruns
  *     and engines agree without a stored model.
  *   - Assignment is a narrow per-row expression against PLAN-LITERAL
  *     centroids (k·dim integer terms, whole-stage codegen — no broadcast
  *     table, no UDF); argmin ties break on the cluster ordinal via an
  *     exact struct `array_min`.
  *   - The update is ONE map-side-combinable groupBy per round producing
  *     k·(dim+1) longs on the driver; new centroid = ⌊sum/count⌋ with the
  *     division done in double (sums bounded « 2^53, so both engines
  *     compute the identical IEEE quotient). Empty clusters keep their
  *     previous centroid.
  *
  * Scale shape: `rounds` full passes over a persisted quantized projection
  * of the corpus — the same pass count any k-means does — with per-round
  * shuffle bounded at k·(dim+1) longs per partition. At 100 TB the
  * projection (id + dim longs) is the only thing re-read; centroids travel
  * inside the plan.
  */
object Clustering {

  private val Scale = 1e6

  /** Quantized projection: (id, qv: array<long>) with qv = round(v·1e6)
    * over the first `dim` coordinates.
    */
  private def quantize(df: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame =
    df.select(col(idCol).as("id"),
      transform(slice(col(vecCol), 1, dim),
        x => round(x.cast("double") * Scale, 0).cast("long")).as("qv"))

  /** Squared-L2 argmin against literal centroids: adds `cluster` (int) and
    * `dist_q` (long, quantized-unit squared distance).
    */
  private def assign(pts: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val entries = cents.zipWithIndex.map { case (cv, ci) =>
      val dist = cv.indices.map { i =>
        val d = element_at(col("qv"), i + 1) - lit(cv(i)); d * d
      }.reduce(_ + _)
      struct(dist.as("d"), lit(ci).as("c"))
    }
    pts.withColumn("_m", array_min(array(entries.toIndexedSeq: _*)))
      .withColumn("cluster", col("_m.c"))
      .withColumn("dist_q", col("_m.d"))
      .drop("_m")
  }

  /** Fixed-round Lloyd k-means. Returns the final assignment
    * (id, cluster, dist_q) under the round-`rounds` centroids.
    */
  def kmeansFixed(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, rounds: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(dim >= 1 && rounds >= 1, "dim and rounds must be >= 1")
    val pts = quantize(df, idCol, vecCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed: k smallest md5(id) — a driver-small collect, not a fit pass
    var cents: Array[Array[Long]] = pts
      .select(col("qv"), md5(col("id").cast("string")).as("h"))
      .orderBy("h").limit(k)
      .collect().map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"need at least $k rows to seed $k clusters")
    for (_ <- 1 to rounds) {
      val sums = (1 to dim).map(i =>
        sum(element_at(col("qv"), i)).as(s"s$i")) :+ count(lit(1)).as("n")
      val upd = assign(pts, cents).groupBy("cluster")
        .agg(sums.head, sums.tail: _*).collect()
        .map { r =>
          val n = r.getLong(dim + 1)
          r.getInt(0) -> Array.tabulate(dim)(i =>
            math.floor(r.getLong(i + 1).toDouble / n).toLong)
        }.toMap
      cents = Array.tabulate(k)(c => upd.getOrElse(c, cents(c)))
    }
    val out = assign(pts, cents).select(col("id").as(idCol),
      col("cluster"), col("dist_q"))
    pts.unpersist()
    out
  }

  /** DuckDB replay of [[kmeansFixed]] — rounds unrolled as CTE pairs
    * (assignment, update), identical quantization/init/argmin/division.
    */
  def kmeansOracleSql(table: String, idCol: String, vecCol: String,
      k: Int, dim: Int, rounds: Int): String = {
    def distSql(p: String, c: String) =
      s"""list_sum(list_transform(generate_series(1, $dim),
         |      i -> ($p.qv[i] - $c.cv[i]) * ($p.qv[i] - $c.cv[i])))""".stripMargin
    val rounds_ = (1 to rounds).map { r =>
      s"""a$r AS (SELECT id, qv, cluster FROM (
         |    SELECT p.id, p.qv, c.cluster,
         |      row_number() OVER (PARTITION BY p.id ORDER BY
         |        ${distSql("p", "c")}, c.cluster) AS rn
         |    FROM pts p CROSS JOIN c${r - 1} c) WHERE rn = 1),
         |u$r AS (SELECT cluster, i,
         |    CAST(floor(SUM(qv[i]) * 1.0 / COUNT(*)) AS BIGINT) AS v
         |  FROM a$r, range(1, ${dim + 1}) t(i) GROUP BY cluster, i),
         |c$r AS (SELECT c${r - 1}.cluster, COALESCE(uv.cv, c${r - 1}.cv) AS cv
         |  FROM c${r - 1} LEFT JOIN (SELECT cluster, list(v ORDER BY i) AS cv
         |    FROM u$r GROUP BY cluster) uv USING (cluster))""".stripMargin
    }.mkString(",\n")
    s"""WITH pts AS (SELECT $idCol AS id,
       |    list_transform(generate_series(1, $dim),
       |      i -> CAST(round(CAST($vecCol[i] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv
       |  FROM $table),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS cluster,
       |    qv AS cv
       |  FROM (SELECT qv, md5(CAST(id AS VARCHAR)) AS h FROM pts ORDER BY h LIMIT $k)),
       |$rounds_,
       |fin AS (SELECT id, cluster, CAST(dist AS BIGINT) AS dist_q FROM (
       |    SELECT p.id, c.cluster, ${distSql("p", "c")} AS dist,
       |      row_number() OVER (PARTITION BY p.id ORDER BY
       |        ${distSql("p", "c")}, c.cluster) AS rn
       |    FROM pts p CROSS JOIN c$rounds c) WHERE rn = 1)
       |SELECT id AS $idCol, CAST(cluster AS INTEGER) AS cluster, dist_q
       |FROM fin ORDER BY $idCol""".stripMargin
  }
}
