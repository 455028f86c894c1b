package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher-style quality rules, duplicate-n-gram char fraction, distributed
  * sequence packing, and unigram LM scoring.
  */
class GopherPackSpec extends SparkSpec {

  test("dupNgramCharFrac: hand-computed bigram coverage") {
    import spark.implicits._
    // bigrams of "a b a b c": [a b, b a, a b, b c] — "a b" occurs twice,
    // dup chars = 2 × 3 = 6 over 9 normalized chars
    val df = Seq("a b a b c", "x y z", "").toDF("t")
      .select(TextAnalysis.dupNgramCharFrac(col("t"), 2).as("f"))
    assert(df.as[Double].collect().toSeq == Seq(0.6667, 0.0, 0.0))
  }

  test("dupNgramCharFrac caps at 1.0 on fully repetitive text") {
    import spark.implicits._
    val df = Seq(Seq.fill(20)("spam").mkString(" ")).toDF("t")
      .select(TextAnalysis.dupNgramCharFrac(col("t"), 2).as("f"))
    assert(df.as[Double].head() == 1.0)
  }

  test("gopherRules: clean doc passes, short/repetitive/stopword-free fail") {
    import spark.implicits._
    val good = (Seq("the", "results", "of", "this", "experiment") ++
      (1 to 60).map(i => s"word$i")).mkString(" ")
    val short = "the of tiny"
    val spammy = ("the of " + Seq.fill(60)("buy now").mkString(" "))
    val noStop = (1 to 60).map(i => s"token$i").mkString(" ")
    val df = Seq(good, short, spammy, noStop).toDF("t")
      .select(TextAnalysis.gopherRules(col("t")).as("g"))
      .select("g.n_words", "g.r_words", "g.r_stopwords", "g.r_dup_bigram", "g.pass")
    val rows = df.collect()
    assert(rows(0).getBoolean(4), "clean doc should pass")
    assert(!rows(1).getBoolean(1) && !rows(1).getBoolean(4), "short doc fails word count")
    assert(!rows(2).getBoolean(3) && !rows(2).getBoolean(4), "repetitive doc fails dup-bigram")
    assert(!rows(3).getBoolean(2) && !rows(3).getBoolean(4), "stopword-free doc fails")
  }

  test("gopherRules: bullet and ellipsis line rules") {
    import spark.implicits._
    val sw = "the be to of and that have with"
    val bullets = (s"$sw intro\n" + (1 to 60).map(i => s"- item$i").mkString("\n"))
    val ellipses = ((1 to 10).map(i => s"$sw line$i...").mkString("\n"))
    val df = Seq(bullets, ellipses).toDF("t")
      .select(TextAnalysis.gopherRules(col("t")).as("g"))
      .select("g.r_bullet", "g.r_ellipsis")
    val rows = df.collect()
    assert(!rows(0).getBoolean(0), "91% bullet lines exceeds 0.9")
    assert(!rows(1).getBoolean(1), "all-ellipsis lines exceed 0.3")
  }

  test("packSequences: starts form the exact prefix sum of the global order") {
    import spark.implicits._
    val docs = (0 until 200)
      .map(i => (i.toLong, (0 to i % 7).map(j => s"w$j").mkString(" ")))
      .toDF("id", "text")
    val budget = 16
    val packed = Corpus.packSequences(docs, "id", "text", budget, nShards = 4)
      .withColumn("start", col("seq_id") * budget + col("seq_offset"))
      .cache()
    // every doc assigned exactly once
    assert(packed.count() == 200)
    // walking the global layout order, each start = previous start + tokens
    val rows = packed
      .withColumn("ord", md5(concat(lit("o:"), col("id").cast("string"))))
      .orderBy("shard", "ord", "id")
      .select("start", "n_tokens").as[(Long, Long)].collect()
    rows.sliding(2).foreach { case Array((s1, n1), (s2, _)) =>
      assert(s2 == s1 + n1, "contiguous concat-then-chunk layout")
    case _ => }
    assert(rows.head._1 == 0L)
    // offsets stay inside the budget; some doc straddles a boundary
    assert(packed.where(col("seq_offset") >= budget).count() == 0)
    assert(packed.where(col("seq_offset") + col("n_tokens") > budget).count() > 0)
  }

  test("packSequences is deterministic across reruns") {
    import spark.implicits._
    val docs = (0 until 50).map(i => (i.toLong, s"a b c d e")).toDF("id", "text")
    val a = Corpus.packSequences(docs, "id", "text", 8, nShards = 4)
    val b = Corpus.packSequences(docs, "id", "text", 8, nShards = 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("prototypicality: centroid members score 1.0, outliers lower") {
    import spark.implicits._
    val a = Seq(1.0f, 0.0f); val b = Seq(0.0f, 1.0f)
    val df = Seq(
      (1L, 0, a), (2L, 0, a),            // label 0: all identical → proto 1.0
      (3L, 1, a), (4L, 1, b)             // label 1: split → both below 1.0
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.prototypicality(df, "vec_id", "label", "embedding")
      .orderBy("vec_id").as[(Long, Int, Double)].collect().toSeq
    assert(got(0)._3 == 1.0 && got(1)._3 == 1.0)
    // centroid of label 1 is (0.5, 0.5): cos = 0.5/(1 · √0.5) = 0.7071
    assert(got(2)._3 == 0.7071 && got(3)._3 == 0.7071)
  }

  test("unigramLmScore: hand-computed negative mean log-likelihood") {
    import spark.implicits._
    // counts over corpus: a=2 b=2 c=1, total=5
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("id", "text")
    val scores = Corpus.unigramLmScore(df, "id", "text")
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val s1 = BigDecimal(-math.log(2.0 / 5)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val s2 = BigDecimal((-math.log(2.0 / 5) - math.log(1.0 / 5)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(scores.map(_._1) == Seq(1L, 2L))
    assert(scores(0)._2 == s1.toDouble && scores(1)._2 == s2.toDouble)
  }

  test("mixturePlan: the scarcest domain binds the budget") {
    import spark.implicits._
    // domain A: 4 docs × 5 tokens = 20 available; domain B: 1 doc × 5 = 5.
    // weights 50/50, maxEpochs 2 → budget = min(2·20/0.5, 2·5/0.5) = 20,
    // so each domain plans 10 tokens: A at 0.5 epochs, B at the 2.0 cap
    val docs = ((1 to 4).map(i => (s"a$i", "A")) :+ (("b1", "B")))
      .map { case (id, dom) => (id, dom, "one two three four five") }
      .toDF("id", "domain", "text")
    val plan = Corpus.mixturePlan(docs, "domain", "text",
      Map("A" -> 0.5, "B" -> 0.5), maxEpochs = 2.0)
      .orderBy("domain")
      .select("domain", "available_tokens", "planned_tokens", "epochs")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(plan == Seq(("A", 20L, 10L, 0.5), ("B", 5L, 10L, 2.0)))
  }

  test("mixturePlan raises when a target domain has no corpus tokens") {
    import spark.implicits._
    val docs = Seq(("1", "A", "x y"), ("2", "B", "   ")).toDF("id", "domain", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.mixturePlan(docs, "domain", "text",
        Map("A" -> 0.5, "B" -> 0.25, "code" -> 0.25), maxEpochs = 2.0)
    }
    assert(e.getMessage.contains("B") && e.getMessage.contains("code"),
      s"both the token-less and the absent domain are reported: ${e.getMessage}")
  }

  test("mixturePlan drops unplanned domains and normalizes weights") {
    import spark.implicits._
    val docs = Seq(("1", "A", "x y"), ("2", "B", "x y"), ("3", "C", "x y"))
      .toDF("id", "domain", "text")
    val plan = Corpus.mixturePlan(docs, "domain", "text",
      Map("A" -> 2.0, "B" -> 2.0), maxEpochs = 1.0)
    assert(plan.where(col("domain") === "C").count() == 0)
    assert(plan.select("target_frac").distinct().head().getDouble(0) == 0.5)
  }

  test("unigramLmScore ranks rare-token docs above common-token docs") {
    import spark.implicits._
    val common = (1 to 50).map(_ => "the cat sat")
    val docs = (common :+ "zyx qwv jkl").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val top = Corpus.unigramLmScore(docs, "id", "text")
      .orderBy(col("lm_score").desc).select("id").as[Long].head()
    assert(top == 50L, "the rare-token doc has the highest (worst) score")
  }
}
