package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic md5-based sketches (HLL, count-min) plus the new
  * span-dedup / BM25 / weighted-sample / int8-quantization curation ops.
  */
class SketchSpec extends SparkSpec {

  test("hllCounts estimates distinct counts within HLL error bounds") {
    import spark.implicits._
    // group A: 100 distinct values, group B: 5000 distinct values
    val df = ((0 until 100).map(i => ("a", s"v$i")) ++
      (0 until 5000).map(i => ("b", s"w$i"))).toDF("g", "v")
    val est = Sketch.hllCounts(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // standard error ~ 1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    assert(math.abs(est("a") - 100.0) / 100.0 < 0.2, s"got ${est("a")}")
    assert(math.abs(est("b") - 5000.0) / 5000.0 < 0.2, s"got ${est("b")}")
  }

  test("hllCounts is insensitive to duplication and partitioning") {
    import spark.implicits._
    val base = (0 until 1000).map(i => ("g", s"v$i")).toDF("g", "v")
    val dup = base.union(base).union(base).repartition(7)
    val e1 = Sketch.hllCounts(base, Seq("g"), "v").collect()(0).getDouble(1)
    val e2 = Sketch.hllCounts(dup, Seq("g"), "v").collect()(0).getDouble(1)
    assert(e1 == e2) // registers are max-merged: duplicates change nothing
  }

  test("hllUnionCounts: merged registers equal the union's own sketch") {
    import spark.implicits._
    val a = (0 until 800).map(i => ("g", s"v$i")).toDF("g", "v")      // 0..799
    val b = (400 until 1200).map(i => ("g", s"v$i")).toDF("g", "v")   // 400..1199
    val ra = Sketch.hllRegisters(a, Nil, "v")
    val rb = Sketch.hllRegisters(b, Nil, "v")
    val merged = Sketch.hllUnionCounts(ra, rb).collect()(0).getDouble(0)
    val direct = Sketch.hllCounts(a.union(b), Seq("g"), "v")
      .collect()(0).getDouble(1)
    assert(merged == direct) // mergeability is exact, not approximate
    assert(math.abs(merged - 1200.0) / 1200.0 < 0.2)
  }

  test("cmsEstimate never underestimates and is exact sans collisions") {
    import spark.implicits._
    val df = (Seq.fill(500)("hot") ++ (0 until 100).map(i => s"k$i")).toDF("k")
    val probes = Seq("hot", "k0", "absent").toDF("k")
    val est = Sketch.cmsEstimate(df, "k", probes, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 500L)     // CMS overestimates only
    assert(est("k0") >= 1L)
    assert(est("hot") <= 500L + 100L) // collisions bounded by other mass
    assert(est("absent") <= 100L + 500L)
  }

  test("spanDedup keeps first occurrence globally and reassembles") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),     // spans of 2: [alpha beta][gamma delta]
      (2L, "alpha beta epsilon zeta"),    // first span duplicates doc 1
      (3L, "gamma delta alpha beta")      // both spans duplicate doc 1/2... by span text
    ).toDF("id", "text")
    val out = Corpus.spanDedup(df, "id", "text", spanWords = 2)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_kept") == 2)
    assert(out(0).getAs[String]("dedup_text") == "alpha beta gamma delta")
    assert(out(1).getAs[Long]("n_kept") == 1)
    assert(out(1).getAs[String]("dedup_text") == "epsilon zeta")
    // doc 3's spans are "gamma delta" (seen in doc 1) and "alpha beta"
    // (seen in doc 1) — nothing survives
    assert(out(2).getAs[Long]("n_kept") == 0)
    assert(out(2).getAs[String]("dedup_text") == "")
  }

  test("spanDedup dedups case-insensitively but outputs original casing") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello World again today"),
      (2L, "hello world again today")).toDF("id", "text") // same spans, case-folded
    val out = Corpus.spanDedup(df, "id", "text", spanWords = 2)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("dedup_text") == "Hello World again today")
    assert(out(1).getAs[Long]("n_kept") == 0) // doc 2 is a case-variant dup
  }

  test("bm25 ranks the term-dense doc first and is idempotent") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark spark joins the cluster"),
      (2L, "spark appears once here"),
      (3L, "no relevant terms at all")).toDF("id", "text")
    val out = Corpus.bm25(df, "id", "text", Seq("spark")).orderBy(desc("bm25"))
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 has no hit
    assert(rows(0).getDouble(1) > rows(1).getDouble(1))
    val again = Corpus.bm25(df, "id", "text", Seq("spark")).orderBy(desc("bm25"))
    assert(out.collect().toSeq == again.collect().toSeq)
  }

  test("weightedSample favors heavy rows and is deterministic") {
    import spark.implicits._
    // 10 heavy rows (w=1000) among 1000 light rows (w=1)
    val df = ((0L until 10L).map(i => (i, 1000.0)) ++
      (10L until 1010L).map(i => (i, 1.0))).toDF("id", "w")
    val s1 = Corpus.weightedSample(df, "id", "w", 20).select("id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Corpus.weightedSample(df, "id", "w", 20).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)                       // reproducible
    assert((0L until 10L).toSet.intersect(s1).size >= 8) // heavies dominate
  }

  test("quantizeInt8 maps per-dimension extremes to 0 and 255") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(1.0f, 20.0f)),
      (3L, Array(0.5f, 15.0f))).toDF("id", "vec")
    val codes = Similarity.quantizeInt8(df, "id", "vec").orderBy("id")
      .collect().map(_.getSeq[Int](1))
    assert(codes(0) == Seq(0, 0))
    assert(codes(1) == Seq(255, 255))
    assert(codes(2) == Seq(128, 128)) // 0.5 → round(127.5) = 128 (half-up)
  }

  test("quantizeInt8 constant dimension maps to code 0") {
    import spark.implicits._
    val df = Seq((1L, Array(3.0f, 1.0f)), (2L, Array(3.0f, 2.0f))).toDF("id", "vec")
    val codes = Similarity.quantizeInt8(df, "id", "vec").orderBy("id")
      .collect().map(_.getSeq[Int](1))
    assert(codes(0)(0) == 0 && codes(1)(0) == 0)
  }

  test("hllTrailingCounts: window merge equals a from-scratch window sketch") {
    import spark.implicits._
    // days 10..12, each with its own users plus overlap across days
    val rows = (0 until 300).map(i => (10L, s"u$i")) ++
      (150 until 450).map(i => (11L, s"u$i")) ++
      (400 until 500).map(i => (12L, s"u$i"))
    val df = rows.toDF("day", "v")
    val out = Sketch.hllTrailingCounts(df, "day", "v", window = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("estimate")).toMap
    assert(out.keySet == Set(10L, 11L, 12L)) // only observed end-days
    // window ending at 12 covers days 10..12 = ALL values: its estimate
    // must equal the single sketch over the whole frame
    val whole = Sketch.hllCounts(df, Nil, "v").collect()(0).getAs[Double]("estimate")
    assert(out(12L) == whole)
    // day-10 window is just day 10's own sketch
    val d10 = Sketch.hllCounts(df.where($"day" === 10L), Nil, "v")
      .collect()(0).getAs[Double]("estimate")
    assert(out(10L) == d10)
  }
}
