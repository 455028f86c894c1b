package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape assertions for the curation operators: the properties that
  * matter at 100 TB — column pruning reaching the scan, the prefix-sum
  * broadcast staying a broadcast (never a shuffle of the corpus side), the
  * LM totals staying a broadcast nested-loop over one row.
  */
class CurationPlanSpec extends SparkSpec {

  private lazy val docsParquet: String = {
    import spark.implicits._
    val path = "target/curation-plan-docs"
    (0L until 200L).map(i => (i, s"the quick doc $i of words", s"src${i % 3}", i))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(path)
    path
  }

  test("gopherRules scan prunes to (doc_id, text) only") {
    val df = spark.read.parquet(docsParquet)
      .select(col("doc_id"), TextAnalysis.gopherRules(col("text")).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected 2-column pruned scan in:\n${plan.take(2000)}")
  }

  test("packSequences joins shard bases by broadcast, not by shuffling the corpus") {
    val docs = spark.read.parquet(docsParquet).select("doc_id", "text")
    val packed = Corpus.packSequences(docs, "doc_id", "text", budget = 64, nShards = 4)
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join of shard bases in:\n${plan.take(2000)}")
    // the corpus side shuffles ONCE on the shard key (the window); the
    // bases side adds its own tiny exchanges — but no second corpus-wide
    // hashpartitioning on the join key may appear
    val corpusShuffles = "Exchange hashpartitioning\\(shard".r.findAllIn(plan).size
    assert(corpusShuffles <= 2,
      s"expected at most 2 shard-keyed exchanges (window + bases agg), got $corpusShuffles")
  }

  test("unigramLmScore keeps the grand total as a one-row broadcast") {
    val docs = spark.read.parquet(docsParquet).select("doc_id", "text")
    val scored = Corpus.unigramLmScore(docs, "doc_id", "text")
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast nested-loop for the 1-row total in:\n${plan.take(2000)}")
  }

  test("funnel's step filter reaches the scan as a pushed predicate") {
    import spark.implicits._
    val evPath = "target/curation-plan-events"
    (0L until 200L).map(i => (i % 20, new java.sql.Timestamp(i * 1000),
      Seq("signup", "view", "purchase", "click")(i.toInt % 4)))
      .toDF("user_id", "ts", "event_type")
      .write.mode("overwrite").parquet(evPath)
    val ev = spark.read.parquet(evPath)
    val plan = Events.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "view")).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,signup)]")
      || plan.contains("EqualTo(event_type,signup)"),
      s"expected the step-type filter pushed to the scan in:\n${plan.take(3000)}")
  }

  test("pairSupport plans no cartesian product — the pair join is basket-keyed") {
    import spark.implicits._
    val baskets = (0L until 300L).map(i => (i % 60, s"item${i % 17}"))
      .toDF("basket", "item")
    val plan = Association.pairSupport(baskets, "basket", "item",
      minSupport = 1, topK = 10).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair join must be keyed on the basket id:\n${plan.take(2000)}")
  }

  test("zorderLayout plans a range exchange on the z-value") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toDouble, (i * 7 % 100).toDouble))
      .toDF("x", "y")
    val plan = Layout.zorderLayout(pts, Seq("x", "y"), bits = 6, numFiles = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning(zvalue"),
      s"expected range partitioning on zvalue in:\n${plan.take(2000)}")
  }

  test("hllCounts shuffles registers, not values: partial max before exchange") {
    import spark.implicits._
    val df = (0 until 500).map(i => ("g", s"v$i")).toDF("g", "v")
    val plan = Sketch.hllCounts(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    // partial_max over (g, bucket) must appear BELOW the exchange — the
    // map-side combine that bounds the shuffle at groups×256 rows
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(g")
    val partialIdx = plan.indexOf("partial_max")
    assert(exchangeIdx >= 0 && partialIdx >= 0,
      s"expected keyed exchange and partial max in:\n${plan.take(2000)}")
  }
}
