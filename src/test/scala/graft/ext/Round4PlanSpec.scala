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
}
