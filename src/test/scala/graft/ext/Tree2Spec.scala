package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Depth-2 histogram decision tree on a planted step function. */
class Tree2Spec extends SparkSpec {

  test("depth2Tree recovers a two-boundary concept exactly") {
    import spark.implicits._
    // x ∈ 0..15 (10 rows each), y = 1 iff 4 ≤ x ≤ 11. Root ties between
    // the two boundaries → smaller bin (3) wins; left child pure 0s,
    // right child splits off the trailing 0s at x ≥ 12.
    val rows = for { x <- 0 to 15; _ <- 1 to 10 }
      yield (x.toDouble, if (x >= 4 && x <= 11) 1 else 0)
    val out = Tree.depth2Tree(rows.toDF("x", "y"), Seq("x"),
      col("y") === 1, nBins = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    val root = out("~")
    assert(root.getAs[String]("feature") == "x")
    assert(root.getAs[Double]("split_value") == 3.75) // 0 + 4·(15/16)
    assert(root.getAs[Long]("n_rows") == 160L && root.getAs[Long]("n_pos") == 80L)
    val l = out("L")
    assert(l.getAs[Long]("n_rows") == 40L && l.getAs[Long]("n_pos") == 0L)
    assert(l.getAs[Double]("weighted_gini") == 0.0) // pure node
    val r = out("R")
    assert(r.getAs[Long]("n_rows") == 120L && r.getAs[Long]("n_pos") == 80L)
    assert(r.getAs[Double]("split_value") == 11.5625) // 4 + 11·(11/16)
    assert(r.getAs[Double]("weighted_gini") == 0.0) // both children pure
    // leaves: LL = {x=0}, LR = {1..3}, RL = {4..11}, RR = {12..15}
    assert(out("LL").getAs[Long]("n_rows") == 10L)
    assert(out("LR").getAs[Long]("n_rows") == 30L)
    assert(out("RL").getAs[Long]("n_rows") == 80L &&
      out("RL").getAs[Long]("n_pos") == 80L)
    assert(out("RR").getAs[Long]("n_rows") == 40L &&
      out("RR").getAs[Long]("n_pos") == 0L)
  }

  test("lsBoost drives training SSE down and finds the step feature") {
    import spark.implicits._
    // y = 100 + 500·[x1 ≥ 8]; x2 pure noise cycling 0..3
    val rows = for { x <- 0 to 15; r <- 1 to 5 }
      yield (x.toDouble, ((x + r) % 4).toDouble,
        if (x >= 8) 600.0 else 100.0)
    val out = Tree.lsBoost(rows.toDF("x1", "x2", "y"), Seq("x1", "x2"),
      col("y"), nBins = 16, rounds = 3, lrPct = 50)
      .orderBy("round").collect()
    assert(out.head.getAs[String]("feature") == "x1")
    val sses = out.map(_.getAs[Long]("sse_q")).toSeq
    assert(sses == sses.sorted.reverse) // monotone decreasing
    assert(sses.last < sses.head / 3) // substantial fit after 3 rounds
    // step boundary recovered: split between 7 and 8
    val sv = out.head.getAs[Double]("split_value")
    assert(sv > 7.0 && sv <= 8.0)
  }

  test("depth2Tree picks the informative feature among noise") {
    import spark.implicits._
    // x2 is constant (mx == mn → single bin, never a valid split);
    // x1 carries the signal.
    val rows = for { x <- 0 to 15; _ <- 1 to 5 }
      yield (x.toDouble, 7.0, if (x >= 8) 1 else 0)
    val out = Tree.depth2Tree(rows.toDF("x1", "x2", "y"), Seq("x1", "x2"),
      col("y") === 1, nBins = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("~").getAs[String]("feature") == "x1")
    assert(out("~").getAs[Double]("weighted_gini") == 0.0)
  }
}
