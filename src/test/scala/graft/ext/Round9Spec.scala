package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantics + plan-shape checks for this round's operators: fixed-point
  * k-means, interval-overlap join, column profiling, grid resample with
  * forward fill, NDCG@k, MaxSim late interaction, embedding drift.
  */
class Round9Spec extends AnyFunSuite with SparkSpec {

  private def assertNoProduct(plan: String, clue: String): Unit = {
    assert(!plan.contains("CartesianProduct"),
      s"$clue planned a cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$clue planned a nested loop:\n${plan.take(1500)}")
  }

  test("kmeansFixed separates two obvious blobs and is deterministic") {
    import spark.implicits._
    // blob A around (0, 0), blob B around (10, 10) — any sane k-means
    // assignment puts each blob in one cluster
    val vecs = ((0L until 20L).map(i => (i, Array(0.0f + i % 3 * 0.1f, 0.1f * (i % 2)))) ++
      (20L until 40L).map(i => (i, Array(10.0f + i % 3 * 0.1f, 10.0f + 0.1f * (i % 2)))))
      .toDF("id", "vec")
    val out = Clustering.kmeansFixed(vecs, "id", "vec", k = 2, dim = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val aClusters = (0L until 20L).map(out).toSet
    val bClusters = (20L until 40L).map(out).toSet
    assert(aClusters.size == 1 && bClusters.size == 1 && aClusters != bClusters)
    val again = Clustering.kmeansFixed(vecs, "id", "vec", k = 2, dim = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == out)
  }

  test("kmeansFixed assignment plan has no joins at all (literal centroids)") {
    import spark.implicits._
    val vecs = (0L until 30L).map(i => (i, Array(i.toFloat, (i % 5).toFloat)))
      .toDF("id", "vec")
    val plan = Clustering.kmeansFixed(vecs, "id", "vec", k = 3, dim = 2, rounds = 1)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "kmeansFixed")
    assert(!plan.contains("Join"), // centroids ride the plan, not a join
      s"kmeansFixed joined for centroids:\n${plan.take(1500)}")
  }

  test("intervalOverlap matches brute force, each pair exactly once") {
    import spark.implicits._
    val left = Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 20L, 30L), (4L, 31L, 31L))
      .toDF("l_id", "l_s", "l_e")
    val right = Seq((10L, 9L, 25L), (11L, 0L, 4L), (12L, 31L, 40L), (13L, 50L, 60L))
      .toDF("r_id", "r_s", "r_e")
    val got = RangeJoin.intervalOverlap(left, right, "l_s", "l_e", "r_s", "r_e",
      bucketWidth = 7L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = for {
      (li, ls, le) <- Seq((1L, 0L, 10L), (2L, 5L, 6L), (3L, 20L, 30L), (4L, 31L, 31L))
      (ri, rs, re) <- Seq((10L, 9L, 25L), (11L, 0L, 4L), (12L, 31L, 40L), (13L, 50L, 60L))
      if ls <= re && rs <= le
    } yield (li, ri)
    assert(got.sorted.toSeq == brute.sorted)
    assert(got.length == got.distinct.length, "pair emitted more than once")
  }

  test("intervalOverlap plan is a keyed join, no product") {
    import spark.implicits._
    val left = (0L until 50L).map(i => (i, i * 3, i * 3 + 10)).toDF("l_id", "l_s", "l_e")
    val right = (0L until 50L).map(i => (i, i * 4, i * 4 + 8)).toDF("r_id", "r_s", "r_e")
    val plan = RangeJoin.intervalOverlap(left, right, "l_s", "l_e", "r_s", "r_e", 16L)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "intervalOverlap")
  }

  test("profile counts rows, nulls, distincts, min/max per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a")))
      .toDF("num", "str")
    val rows = Corpus.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = rows("num")
    assert(num.getAs[Long]("n_rows") == 4 && num.getAs[Long]("n_nulls") == 1)
    assert(num.getAs[Long]("n_distinct") == 2)
    assert(num.getAs[String]("min_value") == "1" && num.getAs[String]("max_value") == "2")
    val str = rows("str")
    assert(str.getAs[Long]("n_nulls") == 1 && str.getAs[Long]("n_distinct") == 2)
    assert(str.getAs[String]("min_value") == "a" && str.getAs[String]("max_value") == "c")
  }

  test("resampleFill fills gaps forward and spans min..max buckets per key") {
    import spark.implicits._
    // key 1: observations in buckets 0 and 3 (step=10s) — buckets 1, 2
    // carry the bucket-0 value; bucket-3 last observation (ts 35) wins
    val df = Seq(
      (1L, 5_000_000L, 100L, 1.0), (1L, 30_000_000L, 101L, 2.0),
      (1L, 35_000_000L, 102L, 3.0),
      (2L, 0L, 103L, 9.0))
      .toDF("k", "us", "id", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Events.resampleFill(df, "k", "ts", "v", "id", stepSeconds = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 0L)) == 1.0 && out((1L, 10L)) == 1.0 && out((1L, 20L)) == 1.0)
    assert(out((1L, 30L)) == 3.0) // last obs in the bucket, not the first
    assert(out((2L, 0L)) == 9.0)
    assert(out.size == 5)
  }

  test("ndcgAtK: perfect ranking scores 1.0, all-miss scores 0.0") {
    import spark.implicits._
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"))
      .toDF("id", "lab")
    // query 1 (label x, 2 other x-rows): both relevant at ranks 1-2 = ideal
    val perfect = Seq((1L, 1L, 2L), (1L, 2L, 3L))
      .toDF("query_id", "rank", "neighbor_id")
    val p = Similarity.ndcgAtK(perfect, labels, "id", "lab", k = 2)
      .collect().head.getDouble(1)
    assert(p == 1.0)
    val miss = Seq((1L, 1L, 4L), (1L, 2L, 5L))
      .toDF("query_id", "rank", "neighbor_id")
    val m = Similarity.ndcgAtK(miss, labels, "id", "lab", k = 2)
      .collect().head.getDouble(1)
    assert(m == 0.0)
  }

  test("maxSim: per-query-token best doc token, summed") {
    import spark.implicits._
    val q = Seq((0L, 100L, Array(1.0f, 0.0f)), (0L, 101L, Array(0.0f, 1.0f)))
      .toDF("qid", "qtok", "vec")
    val docs = Seq(
      (1L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), // doc 1 matches both
      (2L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f))) // doc 2 matches one
      .toDF("did", "vec")
    val out = Similarity.maxSimScores(q, docs, "qid", "qtok", "vec",
      "did", "vec", topK = 2)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(out(1L) == 2.0) // cos 1.0 + 1.0
    assert(out(2L) == 1.0) // cos 1.0 + 0.0
  }

  test("embeddingDrift reports per-dim means and the absolute shift") {
    import spark.implicits._
    val ref = Seq(Tuple1(Array(1.0f, 2.0f)), Tuple1(Array(3.0f, 2.0f))).toDF("v")
    val cand = Seq(Tuple1(Array(5.0f, 2.0f))).toDF("v")
    val out = Similarity.embeddingDrift(ref, cand, "v", dim = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getAs[Double]("mean_ref") == 2.0)
    assert(out(1).getAs[Double]("mean_new") == 5.0)
    assert(out(1).getAs[Double]("abs_shift") == 3.0)
    assert(out(2).getAs[Double]("abs_shift") == 0.0)
  }

  test("cmsJoinSize upper-bounds and approximates the true join size") {
    import spark.implicits._
    val a = (0L until 200L).map(i => Tuple1(i % 40)).toDF("k") // each key ×5
    val b = (0L until 40L).map(Tuple1(_)).toDF("k")            // each key ×1
    val est = Sketch.cmsJoinSize(a, "k", b, "k", depth = 4, width = 512)
      .collect().head.getLong(0)
    assert(est >= 200L, s"CMS inner product must upper-bound the join: $est")
    assert(est <= 400L, s"width 512 over 40 keys should be near-exact: $est")
  }

  test("histogramEquiWidth bins cover min..max, counts sum to rows") {
    import spark.implicits._
    val df = (0 until 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val rows = Corpus.histogramEquiWidth(df, "v", nBins = 10)
      .orderBy("bin").collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum == 100)
    assert(rows.head.getAs[Double]("bin_lo") == 0.0)
    assert(rows.last.getAs[Double]("bin_hi") == 99.0)
    // the max value clamps into the last bin, not a phantom bin 10
    assert(rows.map(_.getAs[Int]("bin")).toSeq == (0 until 10))
  }

  test("temporalReachability respects time: late edges unusable upstream") {
    import spark.implicits._
    // a -(t5)-> b -(t3)-> c : c is NOT reachable (3 < arrival-at-b 5);
    // a -(t1)-> d -(t2)-> e : e reachable at 2
    val edges = Seq(
      ("a", "b", 5L), ("b", "c", 3L), ("a", "d", 1L), ("d", "e", 2L))
      .toDF("src", "dst", "t")
    val out = graft.graph.GraphAlgos.temporalReachability(
      edges, "src", "dst", "t", source = "a", startTime = 0L, maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 0L, "b" -> 5L, "d" -> 1L, "e" -> 2L))
  }

  test("temporalReachability keeps the later usable parallel edge") {
    import spark.implicits._
    // b reached at 4; b->c exists at t2 (unusable) and t9 (usable)
    val edges = Seq(("a", "b", 4L), ("b", "c", 2L), ("b", "c", 9L))
      .toDF("src", "dst", "t")
    val out = graft.graph.GraphAlgos.temporalReachability(
      edges, "src", "dst", "t", source = "a", startTime = 0L, maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("c") == 9L)
  }

  test("simpsonDiversity: uniform beats concentrated; singleton is 0") {
    import spark.implicits._
    val df = (Seq.fill(10)(("u", "a")) ++ Seq.fill(10)(("u", "b")) ++
      Seq.fill(18)(("c", "a")) ++ Seq.fill(2)(("c", "b")) ++
      Seq(("s", "only"))).toDF("grp", "item")
    val out = Corpus.simpsonDiversity(df, "grp", "item")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("u") > out("c"), s"uniform ${out("u")} <= skewed ${out("c")}")
    assert(out("s") == 0.0)
    // uniform 2×10: 1 − 2·(10·9)/(20·19) = 1 − 180/380
    assert(out("u") == BigDecimal(1.0 - 180.0 / 380.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("giniIndex: equal masses near 0, one-item-takes-all near 1") {
    import spark.implicits._
    val df = Seq(
      ("eq", "a", 50L), ("eq", "b", 50L), ("eq", "c", 50L), ("eq", "d", 50L),
      ("sk", "a", 1L), ("sk", "b", 1L), ("sk", "c", 1L), ("sk", "d", 997L))
      .toDF("grp", "item", "v")
    val out = Corpus.giniIndex(df, "grp", "item", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("eq") == 0.0)
    assert(out("sk") > 0.7, s"skewed gini ${out("sk")}")
  }

  test("goldenRecords fuses fields independently across a transitive cluster") {
    import spark.implicits._
    // cluster {1,2,3} via pairs (1,2), (2,3) — transitive; 4 is alone.
    // Priorities: 3 is most trusted but has a null city — city comes from
    // 2 (next priority), name from 3. Per-field fusion, not whole-row.
    val recs = Seq(
      (1L, 1L, Some("n1"), Some("c1")),
      (2L, 5L, Some("n2"), Some("c2")),
      (3L, 9L, Some("n3"), None),
      (4L, 2L, Some("n4"), Some("c4")))
      .toDF("id", "prio", "name", "city")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Dedup.goldenRecords(recs, "id", pairs, "a", "b", "prio",
      Seq("name", "city"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(out(1L) == ((3L, "n3", "c2"))) // mixed-member golden row
    assert(out(4L) == ((1L, "n4", "c4")))
  }

  test("kAnonymityProfile reports class sizes, below-k mass, l-diversity") {
    import spark.implicits._
    // classes: (a,1)x3 sens {x,y}, (b,1)x1 sens {x} — k=2: 1 row below
    val df = Seq(
      ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "x"),
      ("b", 1, "x"))
      .toDF("q1", "q2", "sens")
    val r = graft.ext.Privacy.kAnonymityProfile(df, Seq("q1", "q2"), "sens", k = 2)
      .collect().head
    assert(r.getAs[Long]("n_classes") == 2 && r.getAs[Long]("n_rows") == 4)
    assert(r.getAs[Long]("min_class_size") == 1)
    assert(r.getAs[Long]("n_rows_below_k") == 1)
    assert(r.getAs[Double]("pct_rows_below_k") == 0.25)
    assert(r.getAs[Long]("min_l_diversity") == 1)
  }

  test("tableChecksum: order-invariant, null-vs-string distinct") {
    import spark.implicits._
    val a = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    val b = Seq((2L, None), (1L, Some("x"))).toDF("id", "v") // reordered
    val c = Seq((1L, Some("x")), (2L, Some("NULL"))).toDF("id", "v")
    def ck(df: org.apache.spark.sql.DataFrame) =
      Sketch.tableChecksum(df, Seq("id", "v")).collect().head.getLong(1)
    assert(ck(a) == ck(b))
    assert(ck(a) != ck(c)) // a real "NULL" string is not a null
  }

  test("lagAutocorr: perfect periodicity scores 1, constant scores 0") {
    import spark.implicits._
    // period-2 series x = 3,1,3,1,... over 40 buckets (step 10s):
    // lag-2 pairs are identical -> r = 1.0; lag-1 would be -1.
    val rows = (0 until 40).flatMap { b =>
      val n = if (b % 2 == 0) 3 else 1
      (0 until n).map(i => ("p", b * 10L * 1000000L + i))
    } ++ (0 until 10).map(b => ("const", b * 10L * 1000000L + 1L))
    val df = rows.toDF("k", "us").withColumn("ts", timestamp_micros(col("us")))
    val out = graft.ext.Events.lagAutocorr(df, "k", "ts", stepSeconds = 10L,
      lag = 2).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("p") == 1.0)
    assert(out("const") == 0.0) // zero variance -> guarded 0
  }

  test("funnelWithin: a step outside the window breaks the chain") {
    import spark.implicits._
    def ts(sec: Long) = sec * 1000000L
    // u1 converts within windows; u2's B is 2h after A (window 1h)
    val rows = Seq(
      (1L, ts(0), "A"), (1L, ts(600), "B"), (1L, ts(1200), "C"),
      (2L, ts(0), "A"), (2L, ts(7200), "B"), (2L, ts(7300), "C"))
    val df = rows.toDF("u", "us", "ty")
      .withColumn("t", timestamp_micros(col("us")))
    val out = graft.ext.Events.funnelWithin(df, "u", "t", "ty",
      Seq("A", "B", "C"), windowHours = 1L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) == 2L) // both saw A
    assert(out(2) == 1L) // only u1's B was inside the hour
    assert(out(3) == 1L)
  }

  test("linearAttribution: equal split, lookback bound, (none) bucket") {
    import spark.implicits._
    def ts(sec: Long) = sec * 1000000L
    val rows = Seq(
      // u1: two touches inside lookback -> 0.5 each of value 10
      (1L, 1L, ts(100), "view", 0.0), (1L, 2L, ts(200), "click", 0.0),
      (1L, 3L, ts(300), "buy", 10.0),
      // u2: touch outside the 1h lookback -> (none) gets all 20
      (2L, 4L, ts(0), "view", 0.0), (2L, 5L, ts(7200), "buy", 20.0))
    val df = rows.toDF("u", "id", "us", "ty", "v")
      .withColumn("t", timestamp_micros(col("us")))
    val out = graft.ext.Events.linearAttribution(df, "u", "t", "ty", "v", "id",
      Seq("view", "click"), "buy", lookbackHours = 1L)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("view") == 5.0 && out("click") == 5.0)
    assert(out("(none)") == 20.0)
  }

  test("rfmScores: monotone metrics score monotone 1..5") {
    import spark.implicits._
    def ts(day: Long) = day * 86400L * 1000000L
    // 5 users: user i has i events, each value i, last activity day i
    val rows = (1L to 5L).flatMap(i =>
      (1L to i).map(j => (i, ts(i) + j, i.toDouble)))
    val df = rows.toDF("u", "us", "v")
      .withColumn("t", timestamp_micros(col("us")))
    val out = graft.ext.Events.rfmScores(df, "u", "t", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    // user 5: most recent, most frequent, highest spend -> (5,5,5)
    assert(out(5L) == ((5, 5, 5)))
    assert(out(1L)._1 == 1) // oldest activity -> worst recency score
    assert((1L to 4L).forall(i => out(i)._2 < out(i + 1)._2))
  }

  test("Quality.check counts violations per rule on dirty data") {
    import spark.implicits._
    import graft.ext.Quality
    import graft.ext.Quality._
    val dirty = Seq(
      (Some(1L), Some("A"), 5.0), (Some(1L), Some("A"), 5.0), // dup id 1
      (None, Some("B"), -2.0),                                // null id, neg
      (Some(3L), Some("Z"), 99999.0),                         // bad status
      (Some(9L), Some("A"), 1.0))                             // missing FK
      .toDF("id", "status", "amount")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val out = Quality.check(dirty, Seq(
      NotNull("id"), Unique(Seq("id")), InSet("status", Seq("A", "B")),
      InRange("amount", 0.0, 1000.0),
      ForeignKey(Seq("id"), dim, Seq("k"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("not_null(id)") == ((1L, false)))
    assert(out("unique(id)") == ((1L, false)))    // one extra row of id 1
    assert(out("in_set(status)") == ((1L, false)))
    assert(out("in_range(amount)") == ((2L, false))) // -2 and 99999
    assert(out("foreign_key(id)") == ((1L, false)))  // id 9
    val clean = Quality.check(dim.toDF("id"), Seq(NotNull("id")))
      .collect().head
    assert(clean.getBoolean(2))
  }

  test("bestSplits finds the separating threshold of a clean feature") {
    import spark.implicits._
    // feature a separates perfectly at 50; feature b is pure noise
    val rows = (0 until 100).map { i =>
      (i.toDouble, (i % 7).toDouble, if (i < 50) 0L else 1L)
    }
    val df = rows.toDF("a", "b", "y")
    val out = Tree.bestSplits(df, Seq("a", "b"), col("y") === 1, nBins = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("weighted_gini") == 0.0) // perfect separation
    assert(a.getAs[Double]("split_value") == 49.5)  // boundary of bin 4
    val b = out("b")
    assert(b.getAs[Double]("weighted_gini") > 0.4)  // noise cannot split
  }

  test("naiveBayes learns trivially separable vocabularies") {
    import spark.implicits._
    val docs = ((0 until 20).map(i => (i.toLong, "apple fruit sweet", "food")) ++
      (20 until 40).map(i => (i.toLong, "gear engine piston", "machine")))
      .toDF("id", "text", "cls")
    val model = Corpus.naiveBayesTrain(docs, "id", "text", "cls", dim = 32)
    val preds = Corpus.naiveBayesScore(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0 until 20).forall(i => preds(i.toLong) == "food"))
    assert((20 until 40).forall(i => preds(i.toLong) == "machine"))
    // scoring is deterministic across runs
    val again = Corpus.naiveBayesScore(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == preds)
  }

  test("naiveBayes refuses a data-scale class axis (measured gate)") {
    import spark.implicits._
    val docs = (0 until 10).map(i => (i.toLong, "w", s"cls$i"))
      .toDF("id", "text", "cls")
    val err = intercept[IllegalArgumentException] {
      Corpus.naiveBayesTrain(docs, "id", "text", "cls", dim = 8,
        localClassLimit = 3L)
    }
    assert(err.getMessage.contains("localClassLimit"))
  }

  test("proximityJoin matches brute force, negative coordinates included") {
    import spark.implicits._
    val l = Seq((1L, 0.0, 0.0), (2L, -0.3, 0.1), (3L, 5.0, -5.0))
      .toDF("lid", "lat", "lon")
    val r = Seq((10L, 0.15, 0.1), (11L, -0.4, 0.0), (12L, 5.05, -5.05),
      (13L, 2.0, 2.0)).toDF("rid", "rlat", "rlon")
    val radius = 250000L // 0.25 degrees in micro-degrees
    val got = Geo.proximityJoin(l, r, "lat", "lon", "rlat", "rlon", radius)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    def q(x: Double) = math.round(x * 1e6)
    val brute = for {
      (li, la, lo) <- Seq((1L, 0.0, 0.0), (2L, -0.3, 0.1), (3L, 5.0, -5.0))
      (ri, ra, ro) <- Seq((10L, 0.15, 0.1), (11L, -0.4, 0.0),
        (12L, 5.05, -5.05), (13L, 2.0, 2.0))
      dl = q(la) - q(ra); dn = q(lo) - q(ro)
      if dl * dl + dn * dn <= radius * radius
    } yield (li, ri)
    assert(got.sorted.toSeq == brute.sorted)
    assert(got.length == got.distinct.length)
  }

  test("crossCorrelation peaks at the true lead") {
    import spark.implicits._
    // series B is series A shifted by +3 buckets: xcorr peaks at lag 3
    val rows = (0 until 60).flatMap { b =>
      val n = if (b % 5 == 0) 4 else 1
      (0 until n).map(i => ("A", b * 10L * 1000000L + i)) ++
        (0 until n).map(i => ("B", (b + 3) * 10L * 1000000L + i))
    }
    val df = rows.toDF("ty", "us").withColumn("ts", timestamp_micros(col("us")))
    val out = graft.ext.Events.crossCorrelation(df, "ts", "ty", "A", "B",
      stepSeconds = 10L, maxLag = 5)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(3) == out.values.max)
    assert(out(3) > 0.9)
  }

  test("kTruss keeps the K4, peels pendant and bridge edges") {
    import spark.implicits._
    // K4 on {a,b,c,d} (every edge in 2 triangles) + pendant d-e + a
    // second triangle {e,f,g} bridged at e: 4-truss = the K4 only
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("e", "f"), ("e", "g"), ("f", "g"))
      .toDF("src", "dst")
    val out = graft.graph.GraphAlgos.kTruss(edges, "src", "dst", k = 4,
      maxRounds = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")))
    assert(out.values.forall(_ == 2L)) // K4: every edge closes 2 triangles
    // 3-truss additionally keeps the e-f-g triangle but not the bridge
    val t3 = graft.graph.GraphAlgos.kTruss(edges, "src", "dst", k = 3,
      maxRounds = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(t3.contains(("e", "f")) && t3.contains(("f", "g")))
    assert(!t3.contains(("d", "e"))) // bridge closes no triangle
  }
}
