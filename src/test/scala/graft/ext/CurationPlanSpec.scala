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
}
