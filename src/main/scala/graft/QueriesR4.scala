package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Clustering, Events, Factorize, Privacy, Regression, Stats, Url}
import graft.fixtures.TpchGraph
import graft.graph.GraphAlgos

/** Round-4 operator additions, same contract as [[GraftQueries]]: one
  * battery entry per operator, each with a full DuckDB oracle. Split into
  * its own file to keep `Queries.scala` reviewable; [[SparkEntry]] merges
  * both maps.
  */
object GraftQueriesR4 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    graft.fixtures.TpchGraph.table(s, dir, name)

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** The messy-URL synthesis shared by q_url_canon and its oracle: a
    * deterministic function of (doc_id, source) exercising every
    * canonicalization rule — mixed-case scheme/host, default and
    * non-default ports, duplicate slashes, trailing slash, tracking
    * params, unsorted params, fragments.
    */
  private def messyUrl: org.apache.spark.sql.Column =
    concat(
      when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTP")).otherwise(lit("https")),
      lit("://WWW.Ex"), col("source"), lit(".COM"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(":80"))
        .otherwise(when(pmod(col("doc_id"), lit(3)) === 1, lit(":8080"))
          .otherwise(lit(""))),
      lit("/A//b"), pmod(col("doc_id"), lit(5)).cast("string"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=x&b=2&a="), pmod(col("doc_id"), lit(7)).cast("string"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("#frag")).otherwise(lit("")))

  private val messyUrlSql: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END ||
      |'://WWW.Ex' || source || '.COM' ||
      |CASE WHEN doc_id % 3 = 0 THEN ':80'
      |     WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END ||
      |'/A//b' || (doc_id % 5)::VARCHAR ||
      |CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
      |'?utm_source=x&b=2&a=' || (doc_id % 7)::VARCHAR ||
      |CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(

    // extension: distributed linear regression — ONE partial-aggregated
    // Gram-matrix pass (ten integer sums cross the exchange, nothing else),
    // exact BigInt normal-equation solve on the driver, OLS + ridge from
    // the same sufficient statistics. y = extendedprice (whole dollars),
    // x1 = quantity, x2 = discount (percent points).
    "q_ols" -> { (s, d) =>
      val li = t(s, d)("lineitem").select(
        round(col("l_quantity")).cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_extendedprice")).cast("long").as("y"))
      val g = Regression.gram2(li, "x1", "x2", "y")
      val models = Seq(
        ("ols", Regression.solve2(g)),
        ("ridge", Regression.solve2(g, BigInt(20) * g.n * g.n)))
      import s.implicits._
      models.map { case (m, (b0, b1, b2, r2)) =>
        (m, b0, b1, b2, r2, g.n.toLong)
      }.toDF("model", "_b0", "_b1", "_b2", "_r2", "n")
        .select(col("model"),
          round(col("_b0"), 4).as("b0"), round(col("_b1"), 4).as("b1"),
          round(col("_b2"), 4).as("b2"), round(col("_r2"), 6).as("r2"),
          col("n"))
        .orderBy("model")
    },

    // extension: grid-bucketed DBSCAN over the first two embedding dims —
    // eps-neighbors via a 3×3 cell-keyed join (bounded by local density,
    // never all-pairs), core/border/noise roles, clusters = hash-min
    // connected components of the core graph
    "q_dbscan" -> { (s, d) =>
      Clustering.dbscanGrid(t(s, d)("embeddings"), "vec_id", "embedding",
        eps = 50000L, minPts = 10)
        .orderBy("vec_id")
    },

    // extension: Holt double exponential smoothing (level + trend) per
    // event type over daily value totals — exact rational-coefficient
    // integer recurrence, parallel across series, one array fold per
    // series; 7-day-ahead linear forecast
    "q_holt" -> { (s, d) =>
      Events.holtSmooth(
        TpchGraph.eventsTable(s, d).where(col("value").isNotNull),
        "event_type", "ts", "value", horizon = 7)
        .orderBy("event_type")
    },

    // §2.1 FileDataSource breadth: ORC round-trip through the same format
    // dispatch as csv/jsonl/parquet (columnar interchange beyond the
    // reference's chunker formats)
    "q_file_orc" -> { (s, d) =>
      val dir = GraftQueries.scratch(s, "file", d)
      deleteRecursively(new java.io.File(s"$dir/supplier_orc"))
      t(s, d)("supplier").write.mode("overwrite").orc(s"$dir/supplier_orc")
      graft.sources.FileSource.read(s, s"$dir/supplier_orc", format = Some("orc"))
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey").cast("long").as("s_nationkey"))
        .orderBy("s_suppkey")
    },

    // extension: butterfly (bipartite 4-cycle) census over the
    // part-supplier incidence graph — wedges pivot on the low-degree side
    "q_butterflies" -> { (s, d) =>
      GraphAlgos.butterflyCensus(t(s, d)("lineitem"), "l_partkey", "l_suppkey")
    },

    // extension: URL canonicalization + canonical-key dedup — the
    // web-corpus normalization pass (case, default ports, dup slashes,
    // trailing slash, tracking params, param order, fragments)
    "q_url_canon" -> { (s, d) =>
      t(s, d)("documents").select(col("doc_id"), col("source"))
        .select(Url.canonicalize(messyUrl).as("url"))
        .groupBy("url").agg(count(lit(1)).as("n_dups"))
        .orderBy("url")
    },

    // extension: HITS hubs & authorities over the supplier→part incidence
    // graph — integer L1-normalized fixed point, 2 rounds
    "q_hits" -> { (s, d) =>
      GraphAlgos.hitsFixed(GraftQueries.supplierPartFwd(s, d), "src", "dst",
        iterations = 2)
        .orderBy(col("authority").desc, col("node")).limit(100)
    },

    // extension: isotonic (PAV) calibration of return probability against
    // the discount level — minimax identity over the bin table, so the
    // sequential pool-adjacent-violators scan becomes joins/aggregates
    "q_isotonic" -> { (s, d) =>
      Stats.isotonicCalibration(
        t(s, d)("lineitem").select(
          round(col("l_discount") * 100).cast("long").as("disc_pct"),
          (col("l_returnflag") === "R").cast("int").as("ret")),
        "disc_pct", "ret")
        .orderBy("score")
    },

    // extension: differentially-private histogram release — per-type event
    // counts + inverse-CDF Laplace noise (ε = 0.5) from the house
    // md5-uniform, reproducible and engine-replicable
    "q_dp_histogram" -> { (s, d) =>
      Privacy.dpNoisyCounts(TpchGraph.eventsTable(s, d), "event_type",
        epsilonX10 = 5)
        .orderBy("event_type")
    },

    // extension: rank-1 ALS over the customer×part demand matrix — two
    // exact-integer alternations, factors stay distributed; output is the
    // reconstruction RMSE + matrix shape
    "q_als" -> { (s, d) =>
      val ratings = t(s, d)("orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d)("lineitem").select(
          col("l_orderkey").as("o_orderkey"), col("l_partkey"),
          col("l_quantity")), Seq("o_orderkey"))
        .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
        .agg(max(round(col("l_quantity")).cast("long")).as("r"))
      val (x, yf) = Factorize.als1(ratings, "u", "i", "r", rounds = 2)
      Factorize.als1Rmse(ratings, "u", "i", "r", x, yf)
        .crossJoin(broadcast(x.agg(count(lit(1)).as("n_users"))))
        .crossJoin(broadcast(yf.agg(count(lit(1)).as("n_items"))))
        .select(col("n_ratings"), col("n_users"), col("n_items"), col("rmse"))
    },

    // extension: leave-one-out target encoding of part id against the
    // return flag — leakage-free smoothed category feature as one exact
    // integer ratio per row
    "q_target_encode" -> { (s, d) =>
      Stats.targetEncodeLoo(
        t(s, d)("lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), (col("l_returnflag") === "R").cast("int").as("ret")),
        "l_partkey", "ret", m = 20)
        .select(col("l_orderkey"), col("l_linenumber"), col("enc"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // extension: Theil–Sen robust daily-revenue trend per event type —
    // median of per-series pairwise slopes, deterministic median pick
    "q_theilsen" -> { (s, d) =>
      val daily = TpchGraph.eventsTable(s, d).where(col("value").isNotNull)
        .select(col("event_type").as("_g"),
          floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("x"),
          round(col("value") * 100).cast("long").as("_v"))
        .groupBy("_g", "x").agg(sum("_v").as("y"))
      Stats.theilSenSlope(daily, "_g", "x", "y")
        .withColumnRenamed("_g", "event_type")
        .orderBy("event_type")
    },

    // extension: SAX-style symbolic series words — PAA segment means over
    // exact cents, per-series equi-width alphabet, engine-exact
    "q_sax" -> { (s, d) =>
      Events.saxWords(
        TpchGraph.eventsTable(s, d).where(col("value").isNotNull),
        "event_type", "ts", "value", segments = 6, alphabet = 4)
        .orderBy("event_type")
    },

    // extension: Poisson GLM (log link) of orders-per-customer against
    // nation — the count-data face of the regression family: one profile
    // aggregate, exact-integer Newton steps on the driver
    "q_poisson_glm" -> { (s, d) =>
      val cnt = t(s, d)("orders").groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("y"))
      val data = t(s, d)("customer")
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("x"))
        .join(cnt, Seq("c_custkey"), "left")
        .select(col("x"), coalesce(col("y"), lit(0L)).as("y"))
      Regression.poissonGlm(data, "x", "y", rounds = 3)
        .orderBy("x")
    },

    // extension: least-squares gradient boosting (3 stump rounds, lr 0.5)
    // on extendedprice — integer predictions keep residuals exact across
    // rounds; per-round stump + decreasing quantized training SSE
    "q_lsboost" -> { (s, d) =>
      graft.ext.Tree.lsBoost(t(s, d)("lineitem"),
        Seq("l_quantity", "l_discount"), col("l_extendedprice"),
        nBins = 16, rounds = 3, lrPct = 50)
        .orderBy("round")
    },

    // extension: hive-style partitioned layout + partition pruning — the
    // directory-level analogue of q_skipping's file stats: a year-
    // partitioned write, then a pruned read (the filter eliminates whole
    // directories before any file I/O; see PlanAudit for the scan)
    "q_partition_prune" -> { (s, d) =>
      val dir = GraftQueries.scratch(s, "file", d)
      val target = s"$dir/orders_by_year"
      deleteRecursively(new java.io.File(target))
      t(s, d)("orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.partitionBy("o_year").parquet(target)
      s.read.parquet(target)
        .where(col("o_year") === 1995)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice")).cast("long")).as("total_dollars"))
        .orderBy("o_orderpriority")
    },

    // extension: link-prediction AUC over the part co-order graph —
    // deterministic 10% edge holdout, common-neighbor scores in the train
    // graph, tie-aware Mann–Whitney AUC from score histograms
    "q_link_auc" -> { (s, d) =>
      // distinct BEFORE the self-join: duplicate (order, part) rows would
      // square in the pair fanout, and linkPredictionAuc dedups anyway
      val li = t(s, d)("lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val pairs = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      GraphAlgos.linkPredictionAuc(pairs, "a", "b")
    },

    // extension: single change-point per series by binary segmentation —
    // argmax of the exact variance-reduction objective over boundaries
    "q_changepoint" -> { (s, d) =>
      Events.changePoint(
        TpchGraph.eventsTable(s, d).where(col("value").isNotNull),
        "event_type", "ts", "value")
        .orderBy("event_type")
    },

    // extension: split-conformal next-day interval on the per-type daily
    // revenue trend — distribution-free 90% coverage from the calibration
    // quantile of absolute fit residuals
    "q_conformal" -> { (s, d) =>
      val daily = TpchGraph.eventsTable(s, d).where(col("value").isNotNull)
        .select(col("event_type").as("g"),
          floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("x"),
          round(col("value") * 100).cast("long").as("_v"))
        .groupBy("g", "x")
        .agg(((sum("_v") - pmod(sum("_v"), lit(100L))) / lit(100L))
          .cast("long").as("y"))
      Stats.conformalNextInterval(daily, "g", "x", "y", alphaPct = 10)
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")
    },

    // extension: rich-club coefficient profile — do high-degree nodes of
    // the supplier–part graph preferentially interconnect?
    "q_rich_club" -> { (s, d) =>
      GraphAlgos.richClub(GraftQueries.supplierPartFwd(s, d), "src", "dst",
        ks = Seq(5, 10, 20, 40))
        .orderBy("k")
    },

    // extension: dominant covariance eigenvector by integer power
    // iteration — one sufficient-statistics pass, exact BigInt driver
    // iteration with norm-free renormalization (no sqrt, no eigensolver)
    "q_power_iter" -> { (s, d) =>
      Stats.powerIteration(t(s, d)("embeddings"), "embedding",
        dims = 8, iters = 3)
        .orderBy("dim_i")
    },

    // extension: bounded-radius Local Outlier Factor over the same
    // eps-cell candidate join as q_dbscan — staged integer quantization
    // (milli-distances, 10¹²-unit lrd, milli-unit factor)
    "q_lof" -> { (s, d) =>
      Clustering.lofGrid(t(s, d)("embeddings"), "vec_id", "embedding",
        eps = 50000L, minNbrs = 5)
        .orderBy("vec_id")
    },

    // extension: depth-2 decision-tree training — two levels of the
    // histogram split method + leaf class counts, splits ride the plan as
    // broadcast 1/2-row frames
    "q_tree2" -> { (s, d) =>
      graft.ext.Tree.depth2Tree(t(s, d)("lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        col("l_returnflag") === "R", nBins = 16)
        .orderBy("node")
    },

    // extension: per-group classical OLS over the same daily series as
    // q_theilsen — five integer sufficient statistics per group, no joins
    "q_groupreg" -> { (s, d) =>
      val daily = TpchGraph.eventsTable(s, d).where(col("value").isNotNull)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("x"),
          round(col("value") * 100).cast("long").as("_v"))
        .groupBy("event_type", "x").agg(sum("_v").as("y"))
      Stats.groupedOls(daily, "event_type", "x", "y")
        .orderBy("event_type")
    },

    // extension: sampled-source truncated Brandes betweenness over the
    // undirected supplier–part graph — 3 simultaneous sources, depth 3,
    // scale-quantized integer dependencies (no double accumulation)
    "q_betweenness" -> { (s, d) =>
      GraphAlgos.betweennessSampled(GraftQueries.supplierPartFwd(s, d), "src", "dst",
        seeds = Seq("s1", "s2", "s3"), maxDepth = 3)
        .orderBy(col("bc_q").desc, col("node")).limit(50)
    })

  // ---------------------------------------------------------------- oracles

  private val olsGramSql =
    """WITH q AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
      |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
      |    CAST(round(l_extendedprice) AS BIGINT) AS y FROM lineitem),
      |g AS (SELECT count(*)::HUGEINT AS n,
      |  sum(x1)::HUGEINT AS sx1, sum(x2)::HUGEINT AS sx2, sum(y)::HUGEINT AS sy,
      |  sum(x1*x1)::HUGEINT AS sx1x1, sum(x2*x2)::HUGEINT AS sx2x2,
      |  sum(x1*x2)::HUGEINT AS sx1x2, sum(x1*y)::HUGEINT AS sx1y,
      |  sum(x2*y)::HUGEINT AS sx2y, sum(y*y)::HUGEINT AS syy FROM q)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q_ols" ->
      s"""$olsGramSql,
         |${Regression.solve2Sql("0::HUGEINT", "0")},
         |${Regression.solve2Sql("20::HUGEINT*n*n", "1")}
         |SELECT * FROM (
         |  SELECT 'ols' AS model, round(b0, 4) AS b0, round(b1, 4) AS b1,
         |    round(b2, 4) AS b2, round(r2, 6) AS r2, n::BIGINT AS n FROM m0
         |  UNION ALL
         |  SELECT 'ridge', round(b0, 4), round(b1, 4), round(b2, 4),
         |    round(r2, 6), n::BIGINT FROM m1)
         |ORDER BY model""".stripMargin,

    "q_dbscan" -> Clustering.dbscanOracleSql(
      "embeddings", "vec_id", "embedding", eps = 50000L, minPts = 10),

    "q_holt" -> Events.holtOracleSql(
      "(SELECT * FROM events WHERE value IS NOT NULL)",
      "event_type", "CAST(ts AS TIMESTAMP)", "value", horizon = 7),

    "q_file_orc" ->
      """SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
        |FROM supplier ORDER BY 1""".stripMargin,

    "q_butterflies" -> GraphAlgos.butterflyCensusOracleSql(
      "SELECT l_partkey AS a, l_suppkey AS b FROM lineitem"),

    "q_url_canon" ->
      s"""WITH u AS (SELECT ${Url.canonicalizeSql(messyUrlSql)} AS url
         |  FROM documents)
         |SELECT url, count(*) AS n_dups FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_hits" ->
      s"""${GraphAlgos.hitsOracleSql(
            "SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem",
            iterations = 2)}
         |SELECT a2.node, a2.authority, h2.hub
         |FROM a2 JOIN h2 ON h2.node = a2.node
         |ORDER BY a2.authority DESC, a2.node LIMIT 100""".stripMargin,

    "q_isotonic" -> Stats.isotonicOracleSql("lineitem",
      "CAST(round(l_discount * 100) AS BIGINT)",
      "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"),

    "q_dp_histogram" -> Privacy.dpNoisyCountsOracleSql(
      "events", "event_type", epsilonX10 = 5),

    "q_als" ->
      s"""${Factorize.als1OracleSql(
            """SELECT o.o_custkey AS u, l.l_partkey AS i,
              |  max(CAST(round(l.l_quantity) AS BIGINT)) AS r
              |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              |GROUP BY 1, 2""".stripMargin, rounds = 2)},
         |nu AS (SELECT count(*)::BIGINT AS n_users FROM x2),
         |ni AS (SELECT count(*)::BIGINT AS n_items FROM y2)
         |SELECT n_ratings, n_users, n_items, rmse
         |FROM metrics CROSS JOIN nu CROSS JOIN ni""".stripMargin,

    "q_target_encode" -> (Stats.targetEncodeLooSql("lineitem", "l_partkey",
      "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END", m = 20,
      cols = Seq("l_orderkey", "l_linenumber")) + "\nORDER BY 1, 2"),

    "q_theilsen" ->
      s"""SELECT _g AS event_type, n_pairs, ts_slope FROM (
         |${Stats.theilSenOracleSql(
             """SELECT event_type AS _g,
               |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS x,
               |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
               |FROM events WHERE value IS NOT NULL GROUP BY 1, 2""".stripMargin)}
         |) ORDER BY 1""".stripMargin,

    "q_sax" -> (Events.saxOracleSql(
      "(SELECT * FROM events WHERE value IS NOT NULL)",
      "event_type", "CAST(ts AS TIMESTAMP)", "value",
      segments = 6, alphabet = 4) + "\nORDER BY 1"),

    "q_lof" -> Clustering.lofOracleSql("embeddings", "vec_id", "embedding",
      eps = 50000L, minNbrs = 5),

    "q_power_iter" -> Stats.powerIterationOracleSql("embeddings", "embedding",
      dims = 8, iters = 3),

    "q_poisson_glm" -> Regression.poissonGlmOracleSql(
      """SELECT CAST(c.c_nationkey AS BIGINT) AS x,
        |  coalesce(o.y, 0)::BIGINT AS y
        |FROM customer c LEFT JOIN (SELECT o_custkey, count(*)::BIGINT AS y
        |  FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey""".stripMargin,
      rounds = 3),

    "q_lsboost" -> graft.ext.Tree.lsBoostOracleSql("lineitem",
      Seq("l_quantity", "l_discount"), "l_extendedprice",
      nBins = 16, rounds = 3, lrPct = 50),

    "q_partition_prune" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
        |  sum(CAST(round(o_totalprice) AS BIGINT))::BIGINT AS total_dollars
        |FROM orders WHERE year(o_orderdate) = 1995
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_link_auc" -> GraphAlgos.linkPredictionAucOracleSql(
      """SELECT CAST(x.l_partkey AS VARCHAR) AS a,
        |  CAST(y.l_partkey AS VARCHAR) AS b
        |FROM lineitem x JOIN lineitem y
        |ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey""".stripMargin),

    "q_changepoint" -> Events.changePointOracleSql(
      "(SELECT * FROM events WHERE value IS NOT NULL)",
      "event_type", "CAST(ts AS TIMESTAMP)", "value"),

    "q_conformal" ->
      s"""SELECT g AS event_type, n_obs, x_star, yhat, lo, hi, conf_pct FROM (
         |${Stats.conformalOracleSql(
             """SELECT event_type AS g,
               |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS x,
               |  ((sum(CAST(round(value * 100) AS BIGINT))
               |    - (sum(CAST(round(value * 100) AS BIGINT)) % 100)) / 100)::BIGINT AS y
               |FROM events WHERE value IS NOT NULL GROUP BY 1, 2""".stripMargin,
             alphaPct = 10)}
         |) ORDER BY 1""".stripMargin,

    "q_rich_club" -> GraphAlgos.richClubOracleSql(
      "SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem",
      ks = Seq(5, 10, 20, 40)),

    "q_tree2" -> graft.ext.Tree.depth2TreeOracleSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      "CAST(l_returnflag = 'R' AS BIGINT)", nBins = 16),

    "q_groupreg" ->
      s"""SELECT g AS event_type, n_obs, slope, intercept, r2 FROM (
         |${Stats.groupedOlsOracleSql(
             """SELECT event_type AS g,
               |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS x,
               |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
               |FROM events WHERE value IS NOT NULL GROUP BY 1, 2""".stripMargin)}
         |) ORDER BY 1""".stripMargin,

    "q_betweenness" ->
      s"""SELECT node, bc_q FROM (
         |${GraphAlgos.betweennessOracleSql(
             "SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem",
             seeds = Seq("s1", "s2", "s3"), maxDepth = 3)}
         |) ORDER BY bc_q DESC, node LIMIT 50""".stripMargin)
}
