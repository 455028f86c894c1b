package graft.graph

import graft.SparkSpec

/** Truncated Brandes betweenness on hand-checkable graphs (scale 10⁶). */
class BetweennessSpec extends SparkSpec {

  test("path graph: middle nodes carry the crossing pairs") {
    import spark.implicits._
    // a—b—c—d—e, every node a source, depth 4 = exact. Ordered-pair
    // counts through v: b,d → 6; c → 8; endpoints → 0 (absent or 0).
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val out = GraphAlgos.betweennessSampled(edges.toDF("s", "d"), "s", "d",
      seeds = Seq("a", "b", "c", "d", "e"), maxDepth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.getOrElse("a", 0L) == 0L && out.getOrElse("e", 0L) == 0L)
    assert(out("b") == 6000000L && out("d") == 6000000L)
    assert(out("c") == 8000000L)
  }

  test("4-cycle: two equal shortest paths split dependency via sigma") {
    import spark.implicits._
    // square a—b—d—c—a: every opposite pair has sigma = 2, so each
    // intermediate gets floor(scale/2) per source; all-source bc = scale.
    val edges = Seq(("a", "b"), ("b", "d"), ("d", "c"), ("c", "a"))
    val out = GraphAlgos.betweennessSampled(edges.toDF("s", "d"), "s", "d",
      seeds = Seq("a", "b", "c", "d"), maxDepth = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("a", "b", "c", "d").forall(v => out(v) == 1000000L))
  }

  test("linkPredictionAuc separates clique edges from chain/non-edges") {
    import spark.implicits._
    // 20-clique: any held-out clique edge keeps ~18 common neighbors;
    // a 30-node chain supplies near-zero-scoring structure + non-edges.
    val clique = for { i <- 0 until 20; j <- i + 1 until 20 }
      yield (f"c$i%02d", f"c$j%02d")
    val chain = (0 until 29).map(i => (f"x$i%02d", f"x${i + 1}%02d"))
    val out = GraphAlgos.linkPredictionAuc((clique ++ chain).toDF("a", "b"),
      "a", "b").collect().head
    assert(out.getAs[Long]("n_pos") > 5L)
    assert(out.getAs[Long]("n_neg") > 100L)
    val auc = out.getAs[Double]("auc")
    assert(auc > 0.8 && auc <= 1.0)
    // deterministic: a second run reproduces the exact AUC
    val again = GraphAlgos.linkPredictionAuc((clique ++ chain).toDF("a", "b"),
      "a", "b").collect().head.getAs[Double]("auc")
    assert(again == auc)
  }

  test("depth truncation ignores longer paths") {
    import spark.implicits._
    // path a—b—c—d—e with depth 2: only ≤2-hop pairs count.
    // Through b (ordered): (a,c),(c,a) → 2·scale; through c: (b,d),(d,b).
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val out = GraphAlgos.betweennessSampled(edges.toDF("s", "d"), "s", "d",
      seeds = Seq("a", "b", "c", "d", "e"), maxDepth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("b") == 2000000L && out("c") == 2000000L && out("d") == 2000000L)
  }
}
