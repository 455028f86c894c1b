package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Plan-shape assertions for this round's operators — the 100 TB
  * properties: candidate generation stays keyed (the one deliberate
  * broadcast cross-product is bitext's bounded-contract exact path),
  * narrow probes stay exchange-free, iterative share tables broadcast.
  */
class Round8PlanSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 60L).map(i => (i, s"alpha beta w$i gamma delta ${i % 7} end"))
      .toDF("doc_id", "text")
  }

  private def assertNoProduct(plan: String, clue: String): Unit = {
    assert(!plan.contains("CartesianProduct"),
      s"$clue planned a cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$clue planned a nested loop:\n${plan.take(1500)}")
  }

  test("prefixJaccardPairs: candidates and verify are keyed joins") {
    val plan = Dedup.prefixJaccardPairs(docs, "doc_id", "text", minSim = 0.5)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "prefixJaccardPairs")
  }

  test("crossNearDups: band-bucket join keyed, no product") {
    val plan = Dedup.crossNearDups(
      docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4, minSim = 0.2)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "crossNearDups")
  }

  test("bitextMine: the ONLY product is the broadcast exact-candidate stage") {
    import spark.implicits._
    val vecs = (0L until 30L).map { i =>
      (i, (0 until 8).map(d => ((i * 13 + d * 5) % 11 - 5).toFloat).toArray)
    }.toDF("id", "vec")
    val plan = Similarity.bitextMine(
      vecs.where(col("id") % 2 === 0), vecs.where(col("id") % 2 === 1),
      "id", "vec", k = 3).queryExecution.executedPlan.toString
    // candidate stage is a BROADCAST nested loop by bounded contract —
    // a non-broadcast cartesian would ship both sides everywhere
    assert(!plan.contains("CartesianProduct"),
      s"bitextMine planned a non-broadcast cartesian:\n${plan.take(1500)}")
  }

  test("classTfidf: no non-broadcast product (1-row stats ride a broadcast)") {
    val plan = Corpus.classTfidf(docs, "text", "doc_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"classTfidf planned a cartesian:\n${plan.take(1500)}")
  }

  test("scd2History: ONE exchange — both windows share the partitioning") {
    import spark.implicits._
    val obs = (0L until 50L).map(i =>
      (i % 5, s"v${i % 3}", i * 1000L, i)).toDF("k", "v", "t", "tie")
    // AQE wraps the plan, so count exchanges in the rendered tree
    val plan = Events.scd2History(obs, "k", "t", "v", "tie")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"scd2History should reuse one keyed exchange, found $exchanges:\n$plan")
  }

  test("quantileFilterPerGroup: rank and count share one exchange") {
    import spark.implicits._
    val df = (0L until 60L).map(i => (i, s"g${i % 4}", i * 3 % 17))
      .toDF("id", "g", "score")
    val plan = Corpus.quantileFilterPerGroup(df, "g", "score", "id", 0.25)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"quantileFilterPerGroup should plan one exchange, found $exchanges:\n$plan")
  }

  test("fellegiSunterScore adds no exchange over its input") {
    import spark.implicits._
    import graft.infer.CrossResourceIdentity
    import graft.infer.CrossResourceIdentity.FsField
    val pairs = (0L until 20L).map(i => (i, i + 100L, i % 2 == 0))
      .toDF("id_a", "id_b", "ok")
    val plan = CrossResourceIdentity.fellegiSunterScore(pairs,
      Seq(FsField("x", col("ok"), 0.9, 0.3)), 0L, -1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "FS scoring is narrow per-row math")
  }

  test("personalizedPageRank share table broadcasts under the node limit") {
    import spark.implicits._
    val e = (0 until 40).map(i => (s"n$i", s"n${(i + 1) % 40}")).toDF("s", "t")
    val ranks = graft.graph.GraphAlgos.personalizedPageRankFixed(
      e, "s", "t", seeds = Seq("n0"), iterations = 1)
    // result frame is checkpointed; assert on the values instead: total
    // mass stays near scale (damping leaks only via dangling/rounding)
    val total = ranks.agg(sum("rank")).collect().head.getLong(0)
    assert(total > 900000000000L && total <= 1000000000000L,
      s"PPR mass out of range: $total")
    val seedRank = ranks.where(col("node") === "n0")
      .collect().head.getLong(1)
    val farRank = ranks.where(col("node") === "n20")
      .collect().head.getLong(1)
    assert(seedRank > farRank, "seed must outrank distant nodes")
  }
}
