package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Regression, Stats}
import graft.fixtures.TpchGraph
import graft.graph.GraphAlgos

/** Round-5 operator additions, same contract as [[GraftQueries]] /
  * [[GraftQueriesR4]]: one battery entry per operator, each with a full
  * DuckDB oracle. [[SparkEntry]] merges all maps.
  */
object GraftQueriesR5 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    graft.fixtures.TpchGraph.table(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Shared TextRank token-pair construction: content words (≥ 4 letters)
    * co-occurring within a 3-token window, symmetrized. The DuckDB twin is
    * [[textrankEdgesSql]].
    */
  private def textrankEdges(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      filter(split(trim(lower(col("text"))), "\\s+"),
        w => w.rlike("^[a-z]{4,}$")).as("t"))
    val pos = toks.select(col("doc_id"), posexplode(col("t")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "w")
    val pairs = pos.as("x").join(pos.as("y"),
        col("x.doc_id") === col("y.doc_id") &&
          (col("y.p") - col("x.p")).between(1, 3) &&
          col("x.w") =!= col("y.w"))
      .select(col("x.w").as("src"), col("y.w").as("dst"))
    pairs.union(pairs.select(col("dst"), col("src")))
      .withColumn("w", lit(1L))
  }

  private val textrankPairsSub: String =
    """(SELECT x.w AS src, y.w AS dst
      |   FROM (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS p
      |         FROM (SELECT doc_id,
      |                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                   w -> regexp_matches(w, '^[a-z]{4,}$')) AS t
      |               FROM documents)) x
      |   JOIN (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS p
      |         FROM (SELECT doc_id,
      |                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                   w -> regexp_matches(w, '^[a-z]{4,}$')) AS t
      |               FROM documents)) y
      |   ON x.doc_id = y.doc_id AND y.p - x.p BETWEEN 1 AND 3
      |      AND x.w <> y.w)""".stripMargin

  private val textrankEdgesSql: String =
    s"""SELECT src, dst, 1::BIGINT AS w FROM $textrankPairsSub pr
       |UNION ALL
       |SELECT dst, src, 1::BIGINT FROM $textrankPairsSub pr""".stripMargin

  val all: Map[String, Q] = Map(

    // extension: logistic regression (binomial GLM, logit link) of the
    // return probability against the discount level — the Platt-scaling /
    // propensity face of the GLM family; ONE profile aggregate, exact
    // BigInt IRLS on the driver, micro-quantized sigmoids
    "q_logit_glm" -> { (s, d) =>
      Regression.logitGlm(
        t(s, d)("lineitem").select(
          round(col("l_discount") * 100).cast("long").as("x"),
          (col("l_returnflag") === "R").cast("long").as("y")),
        "x", "y", rounds = 3)
        .orderBy("x")
    },

    // extension: k-fold cross-validated OLS (price ~ quantity) — per-fold
    // training stats are total − fold (one aggregate pass), per-fold solves
    // on the driver, one broadcast-scored eval pass; leakage-free by
    // construction, folds stable under reruns (md5 draw)
    "q_cv_folds" -> { (s, d) =>
      Regression.cvFoldOls(
        t(s, d)("lineitem").select(
          concat(col("l_orderkey"), lit("-"), col("l_linenumber")).as("k"),
          round(col("l_quantity")).cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y")),
        "k", "x", "y", k = 5)
        .orderBy("fold")
    },

    // extension: community quality of the brand partition over the part
    // co-order graph — per-community intra/cut/volume counts, conductance,
    // and exact-integer Newman modularity (is "brand" a real community
    // structure in what customers co-buy?)
    "q_community_quality" -> { (s, d) =>
      // distinct before the self-join — communityQuality canonicalizes
      // to distinct pairs anyway, so this only shrinks the fanout
      val li = t(s, d)("lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val pairs = li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("src"), col("y.p").as("dst"))
      GraphAlgos.communityQuality(pairs, "src", "dst",
        t(s, d)("part").select(col("p_partkey"), col("p_brand")),
        "p_partkey", "p_brand")
        .orderBy("community")
    },

    // extension: TextRank keyword extraction — content-word co-occurrence
    // graph (3-token window) + weighted fixed-point PageRank; the
    // graph-centrality cousin of RAKE over the same corpus
    "q_textrank" -> { (s, d) =>
      GraphAlgos.weightedPageRankFixed(
        textrankEdges(t(s, d)("documents")),
        "src", "dst", "w", iterations = 2)
        .orderBy(col("rank").desc, col("node")).limit(30)
    },

    // extension: strongly connected components of the directed
    // above-uniform event-type transition graph (edges where a transition
    // exceeds its source's uniform share) — iterated forward-backward
    // min-label agreement, every locally-minimal SCC assigned per peel
    "q_scc" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = TpchGraph.eventsTable(s, d)
        .withColumn("_prev", lag(col("event_type"), 1).over(w))
        .where(col("_prev").isNotNull)
        .groupBy(col("_prev").as("f"), col("event_type").as("t"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy("f").agg(sum("n").as("tot"))
      val edges = tr.join(broadcast(tot), Seq("f"))
        .where(col("n") * lit(5L) > col("tot"))
        .select(col("f").as("src"), col("t").as("dst"))
      GraphAlgos.sccFixed(edges, "src", "dst", peelRounds = 3, propRounds = 4)
        .orderBy("node")
    },

    // extension: two-sample Kolmogorov–Smirnov drift test — click vs
    // purchase value distributions in exact integer cents; D's numerator
    // is an exact integer over the distinct-value domain
    "q_ks_test" -> { (s, d) =>
      Stats.ksTest(
        TpchGraph.eventsTable(s, d).where(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "cents", "click", "purchase")
    },

    // extension: mutual information / entropy profile of brand ×
    // return-flag — the information-theoretic effect size next to q_chi2's
    // independence test; nano-quantized nats, exact integer sums
    "q_mutual_info" -> { (s, d) =>
      Stats.mutualInfo(
        t(s, d)("lineitem").select("l_partkey", "l_returnflag")
          .join(broadcast(t(s, d)("part").select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey")),
        "p_brand", "l_returnflag")
    },

    // extension: ATT by exact stratified matching — effect of a deep
    // discount (≥ 5%) on line revenue, controlling for quantity strata;
    // common-support drop, micro-quantized control means, one division
    "q_att_matching" -> { (s, d) =>
      Stats.attMatched(
        t(s, d)("lineitem").select(
          (col("l_discount") >= 0.05).as("treat"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_quantity")).cast("long").as("qty")),
        "treat", "price_c", "qty")
    },

    // extension: discrete AdaBoost (2 stump rounds) predicting returns
    // from quantity/price/discount — integer odds-ratio weights keep the
    // weighted round exactly replayable; per-round stump + alpha +
    // ensemble training error
    "q_adaboost" -> { (s, d) =>
      graft.ext.Tree.adaBoost2(t(s, d)("lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        col("l_returnflag") === "R", nBins = 16)
        .orderBy("round")
    },

    // extension: Holt–Winters additive triple smoothing — level + trend +
    // 7-slot weekly seasonality per event type, exact integer recurrence,
    // 7-day-ahead forecast including the seasonal component
    "q_holt_winters" -> { (s, d) =>
      graft.ext.Events.holtWinters(
        TpchGraph.eventsTable(s, d).where(col("value").isNotNull),
        "event_type", "ts", "value", horizon = 7)
        .orderBy("event_type")
    },

    // extension: lift / gains table over the q_logit_glm propensity —
    // discount levels ranked by fitted return probability, per-level lift
    // vs the base rate and cumulative capture of responders; exact counts,
    // one division per output value
    "q_lift_curve" -> { (s, d) =>
      val cells = t(s, d)("lineitem")
        .groupBy(round(col("l_discount") * 100).cast("long").as("x"))
        .agg(count(lit(1)).as("n"),
          sum((col("l_returnflag") === "R").cast("long")).as("pos"))
      val glm = Regression.logitGlm(
        t(s, d)("lineitem").select(
          round(col("l_discount") * 100).cast("long").as("x"),
          (col("l_returnflag") === "R").cast("long").as("y")),
        "x", "y", rounds = 3).select(col("x"), col("p_hat"))
      val tot = cells.agg(sum("n").as("nt"), sum("pos").as("post"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("p_hat").desc, col("x"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      // ratios round half-up via EXACT integer arithmetic
      // ((num·2e4 + den) div 2·den) — engines disagree on double
      // round(x, 4) exactly at a decimal tie (Spark rounds the shortest
      // decimal rendering, DuckDB the binary value)
      def r4(num: org.apache.spark.sql.Column,
          den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        Stats.halfUpQ4(num, den) / lit(10000.0)
      cells.join(broadcast(glm), Seq("x")).crossJoin(broadcast(tot))
        .withColumn("cum_pos", sum(col("pos")).over(w))
        .withColumn("cum_n", sum(col("n")).over(w))
        .select(col("x"), col("n"), col("pos"), col("p_hat"),
          r4(col("pos") * col("nt"), col("n") * col("post")).as("lift"),
          r4(col("cum_pos"), col("post")).as("cum_capture"),
          r4(col("cum_n"), col("nt")).as("cum_frac"))
        .orderBy(col("p_hat").desc, col("x"))
    },

    // TPC-H Q10 shape: top-20 customers by returned-item revenue — the
    // global top-k compiles to TakeOrderedAndProject (per-partition heaps,
    // never a full sort); customer/nation dims join after the aggregate
    "q_tpch_returned_topk" -> { (s, d) =>
      val rev = t(s, d)("lineitem").where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
        .join(t(s, d)("orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(sum("rev_c").as("revenue_cents"))
      rev.join(t(s, d)("customer").select("c_custkey", "c_name", "c_nationkey"),
          Seq("c_custkey"))
        .join(broadcast(t(s, d)("nation")
          .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
          Seq("c_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey")).limit(20)
    },

    // TPC-H Q19 shape: revenue under an OR-of-ANDs compound predicate
    // (brand × quantity-band × size-band) — the disjunction stays inside
    // ONE broadcast-join filter pass, no unions
    "q_tpch_compound_pred" -> { (s, d) =>
      val li = t(s, d)("lineitem").select(col("l_partkey"),
        col("l_quantity"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
      val p = t(s, d)("part").select("p_partkey", "p_brand", "p_size")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)
            && col("p_size").between(1, 5)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)
            && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30)
            && col("p_size").between(1, 15)))
        .agg(count(lit(1)).as("n_items"), sum("rev_c").as("revenue_cents"))
    },

    // extension: ACF + PACF profile (lags 1..5) of daily revenue per
    // event type — the ARIMA order-identification pair; exact integer
    // autocovariances, bit-identical Durbin–Levinson in fixed-order
    // doubles
    "q_pacf" -> { (s, d) =>
      val daily = TpchGraph.eventsTable(s, d).where(col("value").isNotNull)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("day"),
          round(col("value") * 100).cast("long").as("_v"))
        .groupBy("event_type", "day").agg(sum("_v").as("cents"))
      graft.ext.Events.acfPacf(daily, "event_type", "day", "cents", maxLag = 5)
        .orderBy("event_type", "lag")
    },

    // extension: exact Shapley decomposition of the 2-feature OLS —
    // for a linear model φᵢ(row) = bᵢ·(xᵢ − x̄ᵢ) IS the Shapley value,
    // so mean |φᵢ| = |b_q|·Σ|n·xᵢ − Sᵢ| / (n²·1e6) is exact-integer up
    // to one division; per-feature attribution share
    "q_shapley_ols" -> { (s, d) =>
      val li = t(s, d)("lineitem").select(
        round(col("l_quantity")).cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_extendedprice")).cast("long").as("y"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val g = Regression.gram2(li, "x1", "x2", "y")
      val (_, b1, b2, _) = Regression.solve2(g)
      def q6(v: Double) = BigDecimal(v * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
      val (b1q, b2q) = (q6(b1), q6(b2))
      val absRow = li.agg(
        sum(abs(lit(g.n.toLong) * col("x1") - lit(g.sx1.toLong))).as("d1"),
        sum(abs(lit(g.n.toLong) * col("x2") - lit(g.sx2.toLong))).as("d2"))
        .head()
      li.unpersist(blocking = false)
      val c1 = b1q.abs * BigInt(absRow.getAs[Long]("d1"))
      val c2 = b2q.abs * BigInt(absRow.getAs[Long]("d2"))
      val den = g.n * g.n * BigInt(1000000)
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def contrib(c: BigInt) = r6(c.toDouble / den.toDouble)
      def share(c: BigInt) = r6(c.toDouble / (c1 + c2).toDouble)
      import s.implicits._
      Seq(
        ("x1_quantity", r6(b1), contrib(c1), share(c1)),
        ("x2_discount_pct", r6(b2), contrib(c2), share(c2)))
        .toDF("feature", "b", "mean_abs_contrib", "share")
        .orderBy("feature")
    },

    // TPC-H Q7 shape: bilateral shipping volume between two nations by
    // year — fact joins customer+supplier dims (shuffle) and nation twice
    // (broadcast); the pair filter applies right after the dim joins
    "q_tpch_nation_volume" -> { (s, d) =>
      val li = t(s, d)("lineitem").select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"))
      val o = t(s, d)("orders").select("o_orderkey", "o_custkey")
      val c = t(s, d)("customer").select("c_custkey", "c_nationkey")
      val sup = t(s, d)("supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, d)("nation").select("n_nationkey", "n_name")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n.select(col("n_nationkey").as("c_nationkey"),
          col("n_name").as("cust_nation"))), Seq("c_nationkey"))
        .join(broadcast(n.select(col("n_nationkey").as("s_nationkey"),
          col("n_name").as("supp_nation"))), Seq("s_nationkey"))
        .where(col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
          col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3") &&
          col("cust_nation") =!= col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", "l_year")
        .agg(count(lit(1)).as("n_items"), sum("rev_c").as("revenue_cents"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    },

    // extension: sequential-pattern support mining — for every ordered
    // event-type pair (a, b): in how many users does b occur AFTER some
    // a? Per-user (type → min/max ts) profile, a 25-cell per-user type
    // self-join, exact support counts + support share
    "q_seq_support" -> { (s, d) =>
      val prof = TpchGraph.eventsTable(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(unix_micros(col("ts"))).as("first_us"),
          max(unix_micros(col("ts"))).as("last_us"))
      val nUsers = TpchGraph.eventsTable(s, d)
        .agg(count_distinct(col("user_id")).as("n_users"))
      prof.as("x").join(prof.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") =!= col("y.event_type") &&
            col("y.last_us") > col("x.first_us"))
        .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
        .agg(count(lit(1)).as("support"))
        .crossJoin(broadcast(nUsers))
        .select(col("a"), col("b"), col("support"),
          round(col("support").cast("double") / col("n_users").cast("double"),
            4).as("support_frac"))
        .orderBy("a", "b")
    },

    // extension: classifier fairness profile across market segments —
    // "urgent priority predicts a return" as the model under audit;
    // selection rate / TPR / FPR per segment + demographic-parity gap,
    // all exact-integer half-up rates
    "q_fairness" -> { (s, d) =>
      val ret = t(s, d)("lineitem").where(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
      val o = t(s, d)("orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("p"))
        .join(ret, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("y", col("l_orderkey").isNotNull)
      val c = t(s, d)("customer").select("c_custkey", "c_mktsegment")
      Stats.fairnessProfile(
        o.join(c, col("o_custkey") === col("c_custkey")),
        "c_mktsegment", "p", "y")
        .orderBy("c_mktsegment")
    },

    // extension: AR(2) Yule–Walker fit + one-step forecast of daily
    // revenue per event type — the model-fitting leg after q_pacf
    // identifies the order; bit-identical fixed-order doubles over the
    // same exact integer autocovariances
    "q_ar2_forecast" -> { (s, d) =>
      val daily = TpchGraph.eventsTable(s, d).where(col("value").isNotNull)
        .select(col("event_type"),
          floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("day"),
          round(col("value") * 100).cast("long").as("_v"))
        .groupBy("event_type", "day").agg(sum("_v").as("cents"))
      graft.ext.Events.ar2Forecast(daily, "event_type", "day", "cents")
        .orderBy("event_type")
    },

    // extension: IPW average treatment effect — the ATE companion to
    // q_att_matching over the same (discount, quantity-stratum) design;
    // exact stratum propensities, micro-quantized arm means, one division
    "q_ipw_ate" -> { (s, d) =>
      Stats.ateIpw(
        t(s, d)("lineitem").select(
          (col("l_discount") >= 0.05).as("treat"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_quantity")).cast("long").as("qty")),
        "treat", "price_c", "qty")
    },

    // extension: end-to-end curation pipeline in ONE plan — exact dedup
    // (keep min doc id per normalized-content hash) → minimum-length
    // quality gate → deterministic 90/10 hash split → per-(lang, split)
    // doc/token accounting; the composition every training-data run
    // executes, here as a single Catalyst plan with no intermediate
    // materialization
    "q_curation_pipeline" -> { (s, d) =>
      import graft.ext.{Corpus, Dedup}
      val docs = t(s, d)("documents")
      val deduped = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      val toks = filter(split(trim(lower(col("text"))), "\\s+"),
        w => length(w) > 0)
      val gated = deduped.where(size(toks) >= 30)
      Corpus.hashSplit(gated, "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks)).cast("long").as("total_tokens"))
        .orderBy("lang", "split")
    },

    // extension: inter-event burstiness per event type — B = (σ−μ)/(σ+μ)
    // over integer-second gaps (B→−1 periodic, 0 Poisson, →1 bursty);
    // exact integer gap sums, one fixed-order sqrt expression
    "q_burstiness" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("ts"), col("event_id"))
      val gaps = TpchGraph.eventsTable(s, d)
        .withColumn("_us", unix_micros(col("ts")))
        .withColumn("_prev", lag(col("_us"), 1).over(w))
        .where(col("_prev").isNotNull)
        .select(col("event_type"),
          (((col("_us") - col("_prev")) -
            pmod(col("_us") - col("_prev"), lit(1000000L))) /
            lit(1000000L)).cast("long").as("gap_s"))
      gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"), sum("gap_s").as("_sg"),
          sum(col("gap_s") * col("gap_s")).as("_sgg"))
        .select(col("event_type"), col("n_gaps"),
          round((col("_sg").cast("double") / col("n_gaps")), 2).as("mean_gap_s"),
          round(
            (sqrt(col("_sgg").cast("double") / col("n_gaps") -
              (col("_sg").cast("double") / col("n_gaps")) *
                (col("_sg").cast("double") / col("n_gaps"))) -
              col("_sg").cast("double") / col("n_gaps")) /
            (sqrt(col("_sgg").cast("double") / col("n_gaps") -
              (col("_sg").cast("double") / col("n_gaps")) *
                (col("_sg").cast("double") / col("n_gaps"))) +
              col("_sg").cast("double") / col("n_gaps")), 4)
            .plus(lit(0.0)).as("burstiness"))
        .orderBy("event_type")
    },

    // extension: Markov conditional entropy of the event stream —
    // H(next | current) = H(pair) − H(current) over per-user transition
    // pairs; how predictable is the next action? (composes q_mutual_info's
    // machinery on the q_markov pair construction)
    "q_markov_entropy" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = TpchGraph.eventsTable(s, d)
        .withColumn("_prev", lag(col("event_type"), 1).over(w))
        .where(col("_prev").isNotNull)
        .select(col("_prev").as("cur"), col("event_type").as("nxt"))
      Stats.mutualInfo(pairs, "cur", "nxt")
        .select(col("n"), col("n_cells"),
          col("h_a").as("h_cur"), col("h_b").as("h_next"),
          col("h_ab").as("h_pair"), col("mi"),
          round(col("h_ab") - col("h_a"), 6).as("h_next_given_cur"))
    },

    // extension: Brier score + skill of the q_logit_glm propensity —
    // probability-forecast quality vs the base-rate predictor; the
    // quantized p makes every squared error an exact integer
    "q_brier" -> { (s, d) =>
      val glm = Regression.logitGlm(
        t(s, d)("lineitem").select(
          round(col("l_discount") * 100).cast("long").as("x"),
          (col("l_returnflag") === "R").cast("long").as("y")),
        "x", "y", rounds = 3).select(col("x"), col("p_hat"))
      val rows = t(s, d)("lineitem").select(
        round(col("l_discount") * 100).cast("long").as("x"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      val scored = rows.join(broadcast(glm), Seq("x"))
        .withColumn("p_q", round(col("p_hat") * 10000).cast("long"))
      val agg = scored.agg(count(lit(1)).as("n"), sum("y").as("sy"),
        sum((col("p_q") - col("y") * 10000) *
          (col("p_q") - col("y") * 10000)).as("se"))
      val withBase = agg
        .withColumn("p0_q",
          round(col("sy").cast("double") / col("n") * 10000).cast("long"))
      val base = scored.crossJoin(broadcast(withBase.select("p0_q")))
        .agg(sum((col("p0_q") - col("y") * 10000) *
          (col("p0_q") - col("y") * 10000)).as("se0"))
      withBase.crossJoin(broadcast(base))
        .select(col("n"),
          round(col("se").cast("double") /
            (col("n") * lit(100000000L)).cast("double"), 6).as("brier"),
          round(col("se0").cast("double") /
            (col("n") * lit(100000000L)).cast("double"), 6).as("brier_base"),
          round(lit(1.0) - col("se").cast("double") /
            col("se0").cast("double"), 4).as("brier_skill"))
    },

    // extension: Dirichlet-smoothed query-likelihood retrieval — the
    // language-model scorer next to q_bm25 over the same corpus; zero-tf
    // terms get smoothed mass, so every doc scores
    "q_query_likelihood" -> { (s, d) =>
      graft.ext.Corpus.queryLikelihood(t(s, d)("documents"),
        "doc_id", "text", Seq("spark", "vector", "window"))
        .orderBy(col("ql").desc, col("doc_id")).limit(20)
    },

    // extension: Matryoshka dimension-truncation recall — cosine top-k
    // with the first 16 of 64 dims vs the full-dimension ground truth;
    // the MRL question "how much ANN quality do truncated embeddings
    // keep" answered exactly on the bounded query set
    "q_matryoshka_recall" -> { (s, d) =>
      import graft.ext.Similarity
      val emb = t(s, d)("embeddings")
      val q = emb.where(col("vec_id") < 10)
      val full = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val qT = q.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      val cT = emb.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      val trunc = Similarity.bruteForceTopK(qT, cT, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = full.join(trunc, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)) / lit(5.0), 4).as("recall"))
        .orderBy("query_id")
    },

    // extension: IPF raking of the (event_type × weekday) cell table —
    // rows rake to uniform shares, columns preserve their observed
    // totals; exact integer scaling passes, unrolled oracle
    "q_ipf_rake" -> { (s, d) =>
      Stats.ipfRake(
        TpchGraph.eventsTable(s, d).select(col("event_type"),
          dayofweek(col("ts")).as("dow")),
        "event_type", "dow", rounds = 2)
        .orderBy("event_type", "dow")
    },

    // extension: winsorized mean per group — the outlier-robust location
    // estimate (clamp to the exact 5th/95th percentile cents, then an
    // exact integer mean); thresholds from ONE percentile aggregate,
    // clamped sums are order-free integers
    "q_winsorized_mean" -> { (s, d) =>
      val li = t(s, d)("lineitem").select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val thr = li.groupBy("l_returnflag")
        .agg(round(percentile(col("cents"), lit(0.05))).cast("long").as("lo_c"),
          round(percentile(col("cents"), lit(0.95))).cast("long").as("hi_c"))
      li.join(broadcast(thr), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("lo_c"), col("hi_c"),
          col("cents"),
          greatest(col("lo_c"), least(col("hi_c"), col("cents"))).as("w_c"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          max("lo_c").as("_lo"), max("hi_c").as("_hi"),
          sum("w_c").as("_sw"), sum("cents").as("_sr"))
        .select(col("l_returnflag"), col("n"),
          round(col("_lo") / 100.0, 2).as("lo"),
          round(col("_hi") / 100.0, 2).as("hi"),
          round(col("_sw").cast("double") / col("n") / 100.0, 2)
            .as("winsorized_mean"),
          round(col("_sr").cast("double") / col("n") / 100.0, 2)
            .as("raw_mean"))
        .orderBy("l_returnflag")
    },

    // TPC-H Q9 shape: product profit by supplier nation × year — profit =
    // discounted revenue − 60%-of-retail supply cost (the partsupp-free
    // adaptation); fact joins part (broadcast) + supplier + nation
    // (broadcast), exact cents end-to-end
    "q_tpch_profit" -> { (s, d) =>
      val li = t(s, d)("lineitem").select(col("l_partkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("o_year"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("rev_c"), col("l_quantity"))
      val p = t(s, d)("part").select(col("p_partkey"), col("p_retailprice"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .withColumn("cost_c",
          round(col("l_quantity") * col("p_retailprice") * lit(0.6) * 100)
            .cast("long"))
        .join(t(s, d)("supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d)("nation")
          .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
          Seq("s_nationkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum(col("rev_c") - col("cost_c")).as("profit_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("nation", "o_year")
    },

    // extension: moment-based skewness + excess kurtosis per group —
    // the profiling stats beside mean/median/mode/MAD; four EXACT integer
    // raw-moment sums (decimal(38) / HUGEINT) cross the exchange, central
    // moments and the two ratios are fixed-order double expressions
    "q_skew_kurtosis" -> { (s, d) =>
      val c = round(col("l_extendedprice")).cast("long").cast("decimal(38,0)")
      val agg = t(s, d)("lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(c).as("s1"), sum(c * c).as("s2"),
          sum(c * c * c).as("s3"), sum(c * c * c * c).as("s4"))
      val n = col("n").cast("double")
      val mu = col("s1").cast("double") / n
      val m2 = col("s2").cast("double") / n - mu * mu
      val m3 = col("s3").cast("double") / n -
        lit(3.0) * mu * (col("s2").cast("double") / n) +
        lit(2.0) * mu * mu * mu
      val m4 = col("s4").cast("double") / n -
        lit(4.0) * mu * (col("s3").cast("double") / n) +
        lit(6.0) * mu * mu * (col("s2").cast("double") / n) -
        lit(3.0) * mu * mu * mu * mu
      agg.select(col("l_returnflag"), col("n"),
          round(mu, 2).as("mean"),
          round(sqrt(m2), 2).as("stddev"),
          round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 4).as("skewness"),
          round(m4 / (m2 * m2) - lit(3.0), 4).as("kurtosis_excess"))
        .orderBy("l_returnflag")
    },

    // TPC-H Q2 shape: cheapest supplier per part — exact integer unit
    // price (price_c·100 div q100), per-part struct-min argmin (ties to
    // the smallest suppkey), supplier dim joined AFTER the argmin
    "q_tpch_min_cost_supp" -> { (s, d) =>
      val unit = t(s, d)("lineitem").select(col("l_partkey"), col("l_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_quantity") * 100).cast("long").as("q100"))
        .where(col("q100") > 0)
        .withColumn("unit_c",
          ((col("price_c") * 100 - pmod(col("price_c") * 100, col("q100"))) /
            col("q100")).cast("long"))
      unit.groupBy("l_partkey")
        .agg(min(struct(col("unit_c"), col("l_suppkey"))).as("_m"))
        .select(col("l_partkey").as("p_partkey"),
          col("_m.l_suppkey").as("s_suppkey"),
          col("_m.unit_c").as("min_unit_cents"))
        .join(t(s, d)("supplier").select("s_suppkey", "s_name"),
          Seq("s_suppkey"))
        .orderBy("p_partkey").limit(50)
        .select("p_partkey", "s_suppkey", "s_name", "min_unit_cents")
    },

    // TPC-H Q16 shape: supplier diversity per brand/size band — distinct
    // supplier counting after a broadcast part join
    "q_tpch_supplier_cnt" -> { (s, d) =>
      t(s, d)("lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(t(s, d)("part")
          .select(col("p_partkey"), col("p_brand"),
            (col("p_size") - pmod(col("p_size"), lit(10))).as("size_band"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "size_band")
        .agg(count_distinct(col("l_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand", "size_band")
    },

    // TPC-H Q21 shape: the sole late supplier — multi-supplier orders
    // where EXACTLY ONE supplier shipped > 60 days after the order date;
    // the correlated EXISTS/NOT-EXISTS pair becomes one per-(order,
    // supplier) aggregate + one per-order rollup, then a per-supplier
    // count (no correlated subqueries, two keyed aggregates)
    "q_tpch_sole_late" -> { (s, d) =>
      val perOS = t(s, d)("lineitem")
        .join(t(s, d)("orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max((col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAY")).cast("int"))
          .as("late"))
      val perO = perOS.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
      perOS.where(col("late") === 1)
        .join(perO.where(col("n_supp") > 1 && col("n_late") === 1),
          Seq("l_orderkey"))
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).as("n_waiting_orders"))
        .orderBy(col("n_waiting_orders").desc, col("s_suppkey")).limit(20)
    },

    // TPC-H Q4 shape: late-shipment order-priority census — orders with
    // any lineitem shipped > 30 days after the order date, counted per
    // priority; the EXISTS becomes a conditioned left-semi join (one
    // shuffle on orderkey, no row duplication before the aggregate)
    "q_tpch_late_priority" -> { (s, d) =>
      val o = t(s, d)("orders")
      val li = t(s, d)("lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late_orders"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q13 shape: customer order-count distribution — left join keeps
    // zero-order customers, two cascaded counting aggregates; the histogram
    // that powers "how engaged is the customer base"
    "q_tpch_cust_dist" -> { (s, d) =>
      t(s, d)("customer").select("c_custkey")
        .join(t(s, d)("orders").select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("c_count").desc)
    },

    // TPC-H Q17 shape: small-quantity revenue — lineitems below 20% of
    // their part's average quantity; the per-part aggregate joins back on
    // the SAME key it grouped on, so Catalyst reuses the exchange (one
    // lineitem shuffle total); the avg comparison is the exact integer
    // cross-multiplication 5·q·n < Σq, no division
    "q_tpch_small_qty" -> { (s, d) =>
      val li = t(s, d)("lineitem").select(col("l_partkey"),
        round(col("l_quantity") * 100).cast("long").as("q100"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val byPart = li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum("q100").as("sq"))
      li.join(byPart, Seq("l_partkey"))
        .where(col("q100") * lit(5L) * col("n") < col("sq"))
        .agg(count(lit(1)).as("n_small"), sum("price_c").as("revenue_cents"))
    },

    // TPC-H Q22 shape: well-funded idle customers — above the average
    // positive balance (1-row broadcast), no RECENT orders (anti join on
    // the distinct custkey set of orders since 2000; every customer has
    // SOME order in this data, so the window keeps the anti-join
    // non-vacuous); per-nation counts; the exact comparison is the
    // cross-multiplication bal·n > Σbal, no division
    "q_tpch_idle_cust" -> { (s, d) =>
      val cust = t(s, d)("customer").select(col("c_custkey"),
        col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c"))
      val pos = cust.where(col("bal_c") > 0)
        .agg(count(lit(1)).as("n_pos"), sum("bal_c").as("sum_pos"))
      cust.join(t(s, d)("orders")
            .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select(col("o_custkey").as("c_custkey")).distinct(),
          Seq("c_custkey"), "left_anti")
        .crossJoin(broadcast(pos))
        .where(col("bal_c") * col("n_pos") > col("sum_pos"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_custs"), sum("bal_c").as("total_bal_cents"))
        .orderBy("c_nationkey")
    },

    // TPC-H Q15 shape: top supplier by 1996 revenue — per-supplier revenue
    // aggregate, 1-row broadcast max, equality filter, then the supplier
    // dim join; ties all surface (deterministic)
    "q_tpch_top_supplier" -> { (s, d) =>
      val rev = t(s, d)("lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_suppkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("rev_c"))
        .groupBy("l_suppkey").agg(sum("rev_c").as("total_rev_cents"))
      val mx = rev.agg(max("total_rev_cents").as("_mx"))
      rev.crossJoin(broadcast(mx))
        .where(col("total_rev_cents") === col("_mx"))
        .join(t(s, d)("supplier")
            .select(col("s_suppkey").as("l_suppkey"), col("s_name")),
          Seq("l_suppkey"))
        .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
          col("total_rev_cents"))
        .orderBy("s_suppkey")
    })

  // ---------------------------------------------------------------- oracles

  val oracles: Map[String, String] = Map(

    "q_logit_glm" -> Regression.logitGlmOracleSql(
      """SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
        |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |FROM lineitem""".stripMargin,
      rounds = 3),

    "q_cv_folds" -> Regression.cvFoldOlsSql(
      """SELECT l_orderkey || '-' || l_linenumber AS key,
        |  CAST(round(l_quantity) AS BIGINT) AS x,
        |  CAST(round(l_extendedprice) AS BIGINT) AS y
        |FROM lineitem""".stripMargin,
      k = 5),

    "q_community_quality" -> (GraphAlgos.communityQualityOracleSql(
      """SELECT CAST(x.l_partkey AS VARCHAR) AS src,
        |  CAST(y.l_partkey AS VARCHAR) AS dst
        |FROM lineitem x JOIN lineitem y
        |ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey""".stripMargin,
      "SELECT CAST(p_partkey AS VARCHAR) AS node, p_brand AS community FROM part")
      + "\nORDER BY community"),

    "q_textrank" ->
      s"""${GraphAlgos.weightedPageRankOracleSql(textrankEdgesSql,
            iterations = 2)}
         |SELECT node, rank::BIGINT AS rank FROM r2
         |ORDER BY rank DESC, node LIMIT 30""".stripMargin,

    "q_scc" -> {
      val trSub =
        """(SELECT prev AS f, event_type AS t, count(*)::BIGINT AS n
          |   FROM (SELECT user_id, event_type,
          |           lag(event_type) OVER (PARTITION BY user_id
          |             ORDER BY ts, event_id) AS prev
          |         FROM events) s
          |   WHERE prev IS NOT NULL GROUP BY 1, 2)""".stripMargin
      GraphAlgos.sccOracleSql(
        s"""SELECT tr.f AS src, tr.t AS dst
           |FROM $trSub tr
           |JOIN (SELECT f, sum(n)::BIGINT AS tot FROM $trSub tr2 GROUP BY 1)
           |  tot ON tot.f = tr.f
           |WHERE tr.n * 5 > tot.tot""".stripMargin,
        peelRounds = 3, propRounds = 4) + "\nORDER BY node"
    },

    "q_ks_test" -> Stats.ksTestOracleSql(
      """SELECT event_type AS g,
        |  CAST(round(value * 100) AS BIGINT) AS v
        |FROM events WHERE value IS NOT NULL
        |  AND event_type IN ('click', 'purchase')""".stripMargin,
      "click", "purchase"),

    "q_mutual_info" -> Stats.mutualInfoOracleSql(
      """SELECT p.p_brand AS a, l.l_returnflag AS b
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey""".stripMargin),

    "q_att_matching" -> Stats.attMatchedOracleSql(
      """SELECT CAST(round(l_quantity) AS BIGINT) AS x,
        |  l_discount >= 0.05 AS t,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |FROM lineitem""".stripMargin),

    "q_adaboost" -> (graft.ext.Tree.adaBoost2OracleSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      "l_returnflag = 'R'", nBins = 16) + "\nORDER BY round"),

    "q_holt_winters" -> graft.ext.Events.holtWintersOracleSql(
      "(SELECT * FROM events WHERE value IS NOT NULL)",
      "event_type", "CAST(ts AS TIMESTAMP)", "value", horizon = 7),

    "q_lift_curve" -> {
      val glmSql = Regression.logitGlmOracleSql(
        """SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
          |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          |FROM lineitem""".stripMargin,
        rounds = 3)
      s"""WITH cells AS (SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
         |    count(*)::BIGINT AS n,
         |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
         |      AS pos
         |  FROM lineitem GROUP BY 1),
         |glm AS (SELECT x, p_hat FROM ($glmSql) g),
         |tot AS (SELECT sum(n)::BIGINT AS nt, sum(pos)::BIGINT AS post
         |  FROM cells),
         |cum AS (SELECT c.x, c.n, c.pos, g.p_hat, t.nt, t.post,
         |    sum(c.pos) OVER (ORDER BY g.p_hat DESC, c.x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
         |    sum(c.n) OVER (ORDER BY g.p_hat DESC, c.x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
         |  FROM cells c JOIN glm g ON g.x = c.x CROSS JOIN tot t)
         |SELECT x, n, pos, p_hat,
         |  ((pos * nt * 20000 + n * post) // (n * post * 2)) / 10000.0
         |    AS lift,
         |  ((cum_pos * 20000 + post) // (post * 2)) / 10000.0
         |    AS cum_capture,
         |  ((cum_n * 20000 + nt) // (nt * 2)) / 10000.0 AS cum_frac
         |FROM cum ORDER BY p_hat DESC, x""".stripMargin
    },

    "q_tpch_returned_topk" ->
      """WITH rev AS (SELECT o.o_custkey AS c_custkey,
        |    sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |      AS BIGINT))::BIGINT AS revenue_cents
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_returnflag = 'R' GROUP BY 1)
        |SELECT r.c_custkey, c.c_name, n.n_name, r.revenue_cents
        |FROM rev r JOIN customer c ON c.c_custkey = r.c_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |ORDER BY r.revenue_cents DESC, r.c_custkey LIMIT 20""".stripMargin,

    "q_tpch_compound_pred" ->
      """SELECT count(*)::BIGINT AS n_items,
        |  sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |    AS BIGINT))::BIGINT AS revenue_cents
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
        |    AND p.p_size BETWEEN 1 AND 5)
        |  OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
        |    AND p.p_size BETWEEN 1 AND 10)
        |  OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
        |    AND p.p_size BETWEEN 1 AND 15)""".stripMargin,

    "q_pacf" -> (graft.ext.Events.acfPacfOracleSql(
      """SELECT event_type AS k, day AS t, cents AS x FROM (
        |  SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2)""".stripMargin,
      maxLag = 5, keyAlias = "event_type") + "\nORDER BY event_type, lag"),

    "q_shapley_ols" -> (
      """WITH q AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
        |    CAST(round(l_discount * 100) AS BIGINT) AS x2,
        |    CAST(round(l_extendedprice) AS BIGINT) AS y FROM lineitem),
        |g AS (SELECT count(*)::HUGEINT AS n,
        |  sum(x1)::HUGEINT AS sx1, sum(x2)::HUGEINT AS sx2, sum(y)::HUGEINT AS sy,
        |  sum(x1*x1)::HUGEINT AS sx1x1, sum(x2*x2)::HUGEINT AS sx2x2,
        |  sum(x1*x2)::HUGEINT AS sx1x2, sum(x1*y)::HUGEINT AS sx1y,
        |  sum(x2*y)::HUGEINT AS sx2y, sum(y*y)::HUGEINT AS syy FROM q),
        |""".stripMargin +
      Regression.solve2Sql("0::HUGEINT", "0") +
      """,
        |bq AS (SELECT CAST(round(b1 * 1e6, 0) AS HUGEINT) AS b1q,
        |    CAST(round(b2 * 1e6, 0) AS HUGEINT) AS b2q, b1, b2 FROM m0),
        |ad AS (SELECT sum(abs(g.n * q.x1 - g.sx1))::HUGEINT AS d1,
        |    sum(abs(g.n * q.x2 - g.sx2))::HUGEINT AS d2
        |  FROM q CROSS JOIN g),
        |cc AS (SELECT abs(bq.b1q) * ad.d1 AS c1, abs(bq.b2q) * ad.d2 AS c2,
        |    bq.b1, bq.b2, (g.n * g.n * 1000000::HUGEINT) AS den
        |  FROM bq CROSS JOIN ad CROSS JOIN g)
        |SELECT 'x1_quantity' AS feature, round(b1, 6) AS b,
        |  round(c1::DOUBLE / den::DOUBLE, 6) AS mean_abs_contrib,
        |  round(c1::DOUBLE / (c1 + c2)::DOUBLE, 6) AS share FROM cc
        |UNION ALL
        |SELECT 'x2_discount_pct', round(b2, 6),
        |  round(c2::DOUBLE / den::DOUBLE, 6),
        |  round(c2::DOUBLE / (c1 + c2)::DOUBLE, 6) FROM cc
        |ORDER BY feature""".stripMargin),

    "q_tpch_nation_volume" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |  year(l.l_shipdate)::INT AS l_year,
        |  count(*)::BIGINT AS n_items,
        |  sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |    AS BIGINT))::BIGINT AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |WHERE cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND cn.n_name <> sn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_seq_support" ->
      """WITH prof AS (SELECT user_id, event_type,
        |    min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY 1, 2),
        |nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM events)
        |SELECT x.event_type AS a, y.event_type AS b,
        |  count(*)::BIGINT AS support,
        |  round(count(*)::DOUBLE / nu.n_users::DOUBLE, 4) AS support_frac
        |FROM prof x JOIN prof y ON y.user_id = x.user_id
        |  AND y.event_type <> x.event_type AND y.last_us > x.first_us
        |CROSS JOIN nu
        |GROUP BY 1, 2, nu.n_users ORDER BY 1, 2""".stripMargin,

    "q_fairness" -> (Stats.fairnessProfileSql(
      """SELECT c.c_mktsegment AS grp,
        |  o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS p,
        |  EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') AS y
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey""".stripMargin,
      groupAlias = "c_mktsegment") + "\nORDER BY c_mktsegment"),

    "q_ar2_forecast" -> (graft.ext.Events.ar2ForecastOracleSql(
      """SELECT event_type AS k, day AS t, cents AS x FROM (
        |  SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2)""".stripMargin,
      keyAlias = "event_type") + "\nORDER BY event_type"),

    "q_ipw_ate" -> Stats.ateIpwOracleSql(
      """SELECT CAST(round(l_quantity) AS BIGINT) AS x,
        |  l_discount >= 0.05 AS t,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |FROM lineitem""".stripMargin),

    "q_ipf_rake" -> (Stats.ipfRakeOracleSql(
      """SELECT event_type AS r, CAST(dayofweek(ts) + 1 AS VARCHAR) AS c
        |FROM events""".stripMargin,
      rounds = 2, scale = 1000L,
      rowAlias = "event_type", colAlias = "dow")
      + "\nORDER BY event_type, dow"),

    "q_skew_kurtosis" ->
      """WITH src AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice) AS HUGEINT) AS c FROM lineitem),
        |a AS (SELECT l_returnflag, count(*)::BIGINT AS n,
        |    sum(c)::HUGEINT AS s1, sum(c*c)::HUGEINT AS s2,
        |    sum(c*c*c)::HUGEINT AS s3, sum(c*c*c*c)::HUGEINT AS s4
        |  FROM src GROUP BY 1),
        |m AS (SELECT l_returnflag, n,
        |    s1::DOUBLE / n::DOUBLE AS mu,
        |    s2::DOUBLE / n::DOUBLE AS r2,
        |    s3::DOUBLE / n::DOUBLE AS r3,
        |    s4::DOUBLE / n::DOUBLE AS r4
        |  FROM a),
        |cm AS (SELECT l_returnflag, n, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM m)
        |SELECT l_returnflag, n, round(mu, 2) AS mean,
        |  round(sqrt(m2), 2) AS stddev,
        |  round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 4) AS skewness,
        |  round(m4 / (m2 * m2) - 3.0, 4) AS kurtosis_excess
        |FROM cm ORDER BY l_returnflag""".stripMargin,

    "q_tpch_profit" ->
      """SELECT n.n_name AS nation, year(l.l_shipdate)::INT AS o_year,
        |  sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
        |        AS BIGINT)
        |    - CAST(round(l.l_quantity * p.p_retailprice * 0.6 * 100)
        |        AS BIGINT))::BIGINT AS profit_cents,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_winsorized_mean" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |thr AS (SELECT l_returnflag,
        |    CAST(round(quantile_cont(cents::DOUBLE, 0.05)) AS BIGINT) AS lo_c,
        |    CAST(round(quantile_cont(cents::DOUBLE, 0.95)) AS BIGINT) AS hi_c
        |  FROM li GROUP BY 1),
        |w AS (SELECT li.l_returnflag, thr.lo_c, thr.hi_c, li.cents,
        |    greatest(thr.lo_c, least(thr.hi_c, li.cents)) AS w_c
        |  FROM li JOIN thr USING (l_returnflag))
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(max(lo_c) / 100.0, 2) AS lo,
        |  round(max(hi_c) / 100.0, 2) AS hi,
        |  round(sum(w_c)::DOUBLE / count(*) / 100.0, 2) AS winsorized_mean,
        |  round(sum(cents)::DOUBLE / count(*) / 100.0, 2) AS raw_mean
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_matryoshka_recall" -> {
      def bf(name: String, dims: Int) =
        s"""$name AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
           |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q
           |  JOIN embeddings c ON c.vec_id <> q.vec_id
           |  QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |    round(list_sum(list_transform(generate_series(1, $dims),
           |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
           |      (sqrt(list_sum(list_transform(generate_series(1, $dims),
           |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
           |       sqrt(list_sum(list_transform(generate_series(1, $dims),
           |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))), 4)
           |    DESC, c.vec_id) <= 5)""".stripMargin
      s"""WITH ${bf("full_", 64)},
         |${bf("trunc_", 16)},
         |hits AS (SELECT f.query_id, count(*)::BIGINT AS n_hits
         |  FROM full_ f JOIN trunc_ t
         |  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
         |  GROUP BY 1)
         |SELECT q.vec_id AS query_id,
         |  coalesce(h.n_hits, 0)::BIGINT AS n_hits,
         |  round(coalesce(h.n_hits, 0) / 5.0, 4) AS recall
         |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) q
         |LEFT JOIN hits h ON h.query_id = q.vec_id
         |ORDER BY q.vec_id""".stripMargin
    },

    "q_brier" -> {
      val glmSql = Regression.logitGlmOracleSql(
        """SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
          |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          |FROM lineitem""".stripMargin,
        rounds = 3)
      s"""WITH glm AS (SELECT x, p_hat FROM ($glmSql) g),
         |rows_ AS (SELECT CAST(round(l_discount * 100) AS BIGINT) AS x,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         |  FROM lineitem),
         |scored AS (SELECT r.x, r.y,
         |    CAST(round(g.p_hat * 10000) AS BIGINT) AS p_q
         |  FROM rows_ r JOIN glm g ON g.x = r.x),
         |agg AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
         |    sum((p_q - y * 10000) * (p_q - y * 10000))::BIGINT AS se
         |  FROM scored),
         |wb AS (SELECT *, CAST(round(sy::DOUBLE / n * 10000) AS BIGINT)
         |    AS p0_q FROM agg),
         |base AS (SELECT sum((wb.p0_q - s.y * 10000)
         |    * (wb.p0_q - s.y * 10000))::BIGINT AS se0
         |  FROM scored s CROSS JOIN wb)
         |SELECT wb.n,
         |  round(wb.se::DOUBLE / (wb.n * 100000000)::DOUBLE, 6) AS brier,
         |  round(base.se0::DOUBLE / (wb.n * 100000000)::DOUBLE, 6)
         |    AS brier_base,
         |  round(1.0 - wb.se::DOUBLE / base.se0::DOUBLE, 4) AS brier_skill
         |FROM wb CROSS JOIN base""".stripMargin
    },

    "q_query_likelihood" -> (graft.ext.Corpus.queryLikelihoodOracleSql(
      "documents", "doc_id", "text", Seq("spark", "vector", "window"))
      + "\nORDER BY ql DESC, doc_id LIMIT 20"),

    "q_burstiness" ->
      """WITH g AS (SELECT event_type,
        |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id)) // 1000000 AS gap_s
        |  FROM events),
        |a AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
        |    sum(gap_s)::BIGINT AS sg, sum(gap_s * gap_s)::BIGINT AS sgg
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps,
        |  round(sg::DOUBLE / n_gaps, 2) AS mean_gap_s,
        |  round((sqrt(sgg::DOUBLE / n_gaps - (sg::DOUBLE / n_gaps)
        |      * (sg::DOUBLE / n_gaps)) - sg::DOUBLE / n_gaps)
        |    / (sqrt(sgg::DOUBLE / n_gaps - (sg::DOUBLE / n_gaps)
        |      * (sg::DOUBLE / n_gaps)) + sg::DOUBLE / n_gaps), 4) + 0.0
        |    AS burstiness
        |FROM a ORDER BY event_type""".stripMargin,

    "q_markov_entropy" -> {
      val inner = Stats.mutualInfoOracleSql(
        """SELECT prev AS a, event_type AS b FROM (
          |  SELECT event_type, lag(event_type) OVER (PARTITION BY user_id
          |    ORDER BY ts, event_id) AS prev
          |  FROM events) s WHERE prev IS NOT NULL""".stripMargin)
      s"""SELECT n, n_cells, h_a AS h_cur, h_b AS h_next, h_ab AS h_pair,
         |  mi, round(h_ab - h_a, 6) AS h_next_given_cur
         |FROM ($inner) g""".stripMargin
    },

    // 0.9 cumulative split threshold = first 8 md5 hex of 0.9 → 'e6666666'
    // (Corpus.hexThreshold); token count = whitespace tokens of
    // trim(lower(text)) — the established parity idiom
    "q_curation_pipeline" ->
      """WITH keep AS (SELECT min(doc_id) AS doc_id
        |  FROM documents
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
        |dd AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        |tk AS (SELECT *, len(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'),
        |    w -> len(w) > 0)) AS n_tok
        |  FROM dd),
        |gated AS (SELECT * FROM tk WHERE n_tok >= 30),
        |sp AS (SELECT *, CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6666666'
        |    THEN 'train' ELSE 'val' END AS split
        |  FROM gated)
        |SELECT lang, split, count(*)::BIGINT AS n_docs,
        |  sum(n_tok)::BIGINT AS total_tokens
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tpch_min_cost_supp" ->
      """WITH unit AS (SELECT l_partkey, l_suppkey,
        |    (CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
        |      // CAST(round(l_quantity * 100) AS BIGINT) AS unit_c
        |  FROM lineitem WHERE CAST(round(l_quantity * 100) AS BIGINT) > 0),
        |am AS (SELECT l_partkey AS p_partkey,
        |    min(struct_pack(unit_c := unit_c, sk := l_suppkey)) AS m
        |  FROM unit GROUP BY 1)
        |SELECT am.p_partkey, am.m.sk AS s_suppkey, s.s_name,
        |  am.m.unit_c AS min_unit_cents
        |FROM am JOIN supplier s ON s.s_suppkey = am.m.sk
        |ORDER BY am.p_partkey LIMIT 50""".stripMargin,

    "q_tpch_supplier_cnt" ->
      """SELECT p.p_brand, (p.p_size - p.p_size % 10)::INT AS size_band,
        |  count(DISTINCT l.l_suppkey)::BIGINT AS n_suppliers,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tpch_sole_late" ->
      """WITH pos AS (SELECT l.l_orderkey, l.l_suppkey,
        |    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |      THEN 1 ELSE 0 END)::INT AS late
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |po AS (SELECT l_orderkey, count(*)::BIGINT AS n_supp,
        |    sum(late)::BIGINT AS n_late FROM pos GROUP BY 1)
        |SELECT pos.l_suppkey AS s_suppkey,
        |  count(*)::BIGINT AS n_waiting_orders
        |FROM pos JOIN po ON po.l_orderkey = pos.l_orderkey
        |WHERE pos.late = 1 AND po.n_supp > 1 AND po.n_late = 1
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin,

    "q_tpch_late_priority" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_cust_dist" ->
      """SELECT c_count, count(*)::BIGINT AS n_customers FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
        |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY 2 DESC, 1 DESC""".stripMargin,

    "q_tpch_small_qty" ->
      """WITH li AS (SELECT l_partkey,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS q100,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem),
        |a AS (SELECT l_partkey, count(*)::BIGINT AS n, sum(q100)::BIGINT AS sq
        |  FROM li GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_small,
        |  sum(li.price_c)::BIGINT AS revenue_cents
        |FROM li JOIN a USING (l_partkey)
        |WHERE li.q100 * 5 * a.n < a.sq""".stripMargin,

    "q_tpch_idle_cust" ->
      """WITH cust AS (SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |p AS (SELECT count(*)::BIGINT AS n_pos, sum(bal_c)::BIGINT AS sum_pos
        |  FROM cust WHERE bal_c > 0)
        |SELECT c_nationkey, count(*)::BIGINT AS n_custs,
        |  sum(bal_c)::BIGINT AS total_bal_cents
        |FROM cust CROSS JOIN p
        |WHERE bal_c * n_pos > sum_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = cust.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |      AS BIGINT))::BIGINT AS total_rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(total_rev_cents) AS _mx FROM rev)
        |SELECT r.l_suppkey AS s_suppkey, s.s_name, r.total_rev_cents
        |FROM rev r CROSS JOIN mx
        |JOIN supplier s ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_rev_cents = mx._mx
        |ORDER BY 1""".stripMargin)
}
