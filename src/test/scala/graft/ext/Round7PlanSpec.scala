package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Plan-shape assertions for this round's operators — the 100 TB
  * properties: no cartesian/nested-loop candidate generation, narrow ops
  * stay exchange-free, small sides broadcast.
  */
class Round7PlanSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 80L).map(i => (i, s"alpha beta w$i gamma delta ${i % 7} end"))
      .toDF("doc_id", "text")
  }

  private def vecs = {
    import spark.implicits._
    (0L until 40L).map { i =>
      (i, (0 until 16).map(d =>
        if (d == 0) i.toFloat else ((i * 31 + d * 7) % 13 - 6).toFloat).toArray)
    }.toDF("id", "vec")
  }

  private def assertNoProduct(plan: String, clue: String): Unit = {
    assert(!plan.contains("CartesianProduct"),
      s"$clue planned a cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$clue planned a nested loop:\n${plan.take(1500)}")
  }

  test("exactSubstrDedup: gram/cover joins keyed, no product") {
    val plan = Corpus.exactSubstrDedup(docs, "doc_id", "text", minLen = 4)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "exactSubstrDedup")
  }

  test("perceptron scoring: margin pass is keyed aggregation, no product") {
    val labeled = docs.withColumn("lab", col("doc_id") % 2 === 0)
    val (w, _) = Corpus.perceptronTrain(labeled, "doc_id", "text", "lab",
      dim = 16, rounds = 1)
    val plan = Corpus.perceptronScore(labeled, "doc_id", "text", "lab", w, 16)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "perceptronScore")
  }

  test("adamicAdar: wedge self-join and anti-join are keyed") {
    import spark.implicits._
    val e = (0 until 50).flatMap(i => Seq((s"n$i", s"n${(i + 1) % 50}"),
      (s"n$i", s"n${(i + 9) % 50}"))).toDF("s", "t")
    val plan = graft.graph.GraphAlgos.adamicAdar(e, "s", "t")
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "adamicAdar")
  }

  test("pqEncode plans no exchange — narrow per-row math") {
    val cb = Similarity.pqCodebook(vecs, "id", "vec", m = 4, ksub = 8, dim = 16)
    val plan = Similarity.pqEncode(vecs, "id", "vec", cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"PQ encode must not shuffle:\n${plan.take(1500)}")
  }

  test("dictionaryTag: dictionary join is broadcast, no product") {
    val plan = TextAnalysis.dictionaryTag(docs, "doc_id", "text",
      Seq("alpha beta", "end")).queryExecution.executedPlan.toString
    assertNoProduct(plan, "dictionaryTag")
    assert(plan.contains("BroadcastHashJoin"),
      s"dictionary should broadcast:\n${plan.take(1500)}")
  }
}
