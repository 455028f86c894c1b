package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph analytics over edge frames — extensions beyond the
  * reference's read-query surface (BFS/traversals live in
  * [[graft.query.GraphReader]]; connected components in
  * [[graft.ext.Dedup.connectedComponents]]).
  *
  * Determinism contract: PageRank runs in FIXED-POINT integer arithmetic
  * (rank mass in micro-units, damping and degree division as integer
  * `div`). Floating PageRank cannot be cross-engine hash-compared — the
  * per-node contribution sum is a float reduction whose rounding depends
  * on accumulation order — but integer sums are order-free, so every
  * iteration is reproducible to the last unit in any SQL engine. The
  * deliberate cost: each division floors away < 1 unit of mass per edge
  * (bounded drift, identical in every engine).
  */
object GraphAlgos {

  /** Fixed-point PageRank: `iterations` synchronous updates of
    * rank(v) = base + Σ_{u→v} (rank(u)·damping÷100)÷outdeg(u), all in
    * integer micro-units of `scale` total mass. Dangling-node mass is
    * dropped (the standard simplification); `base` is the uniform
    * teleport share (scale÷n)·(100−damping)÷100.
    *
    * Scale shape: one distinct + count for the node set, a degree groupBy,
    * then per iteration ONE pass over the edges — the per-source outflow
    * share (rank·damping÷100÷outdeg) is precomputed as an n-row table
    * (rank ⋈ degree, both keyed by node) and joined to the edges once;
    * when n fits the broadcast budget (`broadcastNodeLimit`) that join is
    * a broadcast, so the big edge frame never re-shuffles across
    * iterations and the dst aggregation partial-combines map-side. Each
    * iteration's rank frame is persisted so the lineage stays flat (the
    * iterated-join anti-pattern at scale is lineage blowup, not the joins).
    */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampingPct: Int = 85,
      scale: Long = 1000000000000L,
      broadcastNodeLimit: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val init = scale / n
    val base = (init * (100L - dampingPct)) / 100L
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(init))
    for (_ <- 1 to iterations) {
      // n-row share table first (rank ⋈ degree are both node-keyed), then
      // ONE join against the big edge frame — broadcast below the limit
      val share = ranks.withColumnRenamed("node", "src").join(deg, Seq("src"))
        .select(col("src"),
          expr(s"(rank * $dampingPct div 100) div outdeg").as("m"))
      val shareSide = if (n <= broadcastNodeLimit) broadcast(share) else share
      val contrib = e.join(shareSide, Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("m")).as("m"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("m"), lit(0L))).as("rank"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count(): Unit
      // the superseded iteration's cache is dead weight once `next` is
      // materialized — drop it so k iterations hold O(1) cached frames
      if (ranks.storageLevel.useMemory || ranks.storageLevel.useDisk)
        ranks.unpersist(blocking = false): Unit
      ranks = next
    }
    // the returned frame is materialized; the building blocks would
    // otherwise stay cached for the session lifetime on every call
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    ranks
  }

  /** The DuckDB-dialect oracle for [[pageRankFixed]] over an `edges(src,
    * dst)` relation — iterations unrolled as chained CTEs with the same
    * integer `//` arithmetic. Kept next to the implementation so the two
    * can never drift silently.
    */
  def pageRankOracleSql(edgesSql: String, iterations: Int,
      dampingPct: Int = 85, scale: Long = 1000000000000L): String = {
    val head =
      s"""WITH E AS ($edgesSql),
         |nodes AS (SELECT src AS node FROM E UNION SELECT dst FROM E),
         |nn AS (SELECT count(*) AS c FROM nodes),
         |deg AS (SELECT src, count(*) AS outdeg FROM E GROUP BY 1),
         |r0 AS (SELECT node, ($scale // c) AS rank FROM nodes CROSS JOIN nn)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (SELECT nd.node,
         |  ((($scale // c) * ${100L - dampingPct}) // 100) + coalesce(s.m, 0) AS rank
         |  FROM nodes nd CROSS JOIN nn
         |  LEFT JOIN (SELECT e.dst AS node,
         |      sum((r.rank * $dampingPct // 100) // d.outdeg) AS m
         |    FROM E e JOIN r${i - 1} r ON r.node = e.src
         |    JOIN deg d ON d.src = e.src GROUP BY 1) s ON s.node = nd.node)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }
}
