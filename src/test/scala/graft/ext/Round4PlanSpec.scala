package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Plan-shape assertions for the round's new operators — the 100 TB
  * properties: candidate generation stays keyed (never a cartesian /
  * nested-loop product), narrow ops stay exchange-free, and the bounded
  * top-k aggregate actually partial-aggregates before its exchange.
  */
class Round4PlanSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 100L).map(i => (i, s"alpha beta w$i gamma delta ${i % 7}"))
      .toDF("doc_id", "text")
  }

  private def assertNoProduct(plan: String, clue: String): Unit = {
    assert(!plan.contains("CartesianProduct"), s"$clue planned a cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$clue planned a nested loop:\n${plan.take(1500)}")
  }

  test("tfidfTopK: inverted-index joins are keyed, no product anywhere") {
    val plan = Corpus.tfidfTopK(docs, "doc_id", "text",
      docs.where(col("doc_id") < 5), "doc_id", "text", k = 3,
      maxDocFreqFrac = 1.0)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "tfidfTopK")
    // the top-k stage is the bounded-heap aggregate with a partial pass
    assert(plan.toLowerCase.contains("partial_topk_pairs"))
  }

  test("chunkDocs plans no exchange — narrow at any scale") {
    val plan = Corpus.chunkDocs(docs, "doc_id", "text", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n${plan.take(1500)}")
  }

  test("triangleCounts: wedge and closing joins are keyed") {
    import spark.implicits._
    val e = (0 until 60).flatMap(i => Seq((s"n$i", s"n${(i + 1) % 60}"),
      (s"n$i", s"n${(i + 7) % 60}"))).toDF("s", "t")
    val plan = graft.graph.GraphAlgos.triangleCounts(e, "s", "t")
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "triangleCounts")
  }

  test("imageNearDups: banded candidate join is an equi-join") {
    import spark.implicits._
    val imgs = (0 until 20).map { i =>
      val px = Array.tabulate(9 * 8 * 3)(j => ((i * 31 + j) % 256).toByte)
      (i.toLong, s"P6\n9 8\n255\n".getBytes("US-ASCII") ++ px)
    }.toDF("id", "media")
    val plan = Multimodal.imageNearDups(imgs, "id", "media", maxHamming = 3)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "imageNearDups")
  }

  test("intervalJoin (batch): key equi-join with range residual, not a loop") {
    import spark.implicits._
    val l = (0 until 50).map(i =>
      (i.toLong % 5, i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L)))
      .toDF("k", "lid", "lts")
    val r = (0 until 50).map(i =>
      (i.toLong % 5, i.toLong, new java.sql.Timestamp(1700000000000L + i * 61000L)))
      .toDF("k", "rid", "rts")
    val plan = graft.streaming.StreamIngest
      .intervalJoin(l, r, "k", "lts", "rts", 600)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "intervalJoin")
    assert(plan.contains("Join") && plan.contains("k#"),
      s"expected keyed join:\n${plan.take(1500)}")
  }

  test("c4LineClean plans no exchange — narrow at any scale") {
    val plan = docs.select(TextAnalysis.c4LineClean(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"line cleaning must not shuffle:\n${plan.take(1500)}")
  }

  test("importanceWeights: vocab scoring join is keyed, totals broadcast") {
    import spark.implicits._
    val d = docs.withColumn("tgt", col("doc_id") % 2 === 0)
    val plan = Corpus.importanceWeights(d, "doc_id", "text", "tgt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"importanceWeights planned a cartesian:\n${plan.take(1500)}")
    // the ONLY nested-loop allowed is the 1-row totals cross (broadcast,
    // O(vocab) work); the token-scoring join must be hash-keyed on the word
    assert(plan.contains("HashJoin [_tok") || plan.contains("SortMergeJoin [_tok"),
      s"token scoring should join keyed on the word:\n${plan.take(1500)}")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"only the scalar-totals cross may nested-loop, saw $nlj")
  }

  test("randomWalks: hop joins are keyed and the argmin partial-aggregates") {
    import spark.implicits._
    val e = (0 until 60).map(i => (s"n$i", s"n${(i * 13 + 1) % 60}")).toDF("s", "t")
    val walks = graft.graph.GraphAlgos.randomWalks(e, "s", "t",
      seeds = Seq("n0"), steps = 2, walksPerSeed = 2)
    val plan = walks.queryExecution.executedPlan.toString
    assertNoProduct(plan, "randomWalks")
    // per-hop argmin must combine map-side: a partial min over the
    // (hash, neighbor) struct ahead of the walk_id exchange
    val hop = e.join(walks.where(col("step") === 0)
      .select(col("walk_id"), col("node").as("s")), Seq("s"))
      .groupBy("walk_id")
      .agg(min(struct(md5(concat_ws(":", col("walk_id"), lit("1"), col("t"))),
        col("t"))).as("m"))
    val hopPlan = hop.queryExecution.executedPlan.toString
    assert(hopPlan.contains("partial_min") || hopPlan.contains("HashAggregate"),
      s"argmin should partial-aggregate:\n${hopPlan.take(1500)}")
  }
}
