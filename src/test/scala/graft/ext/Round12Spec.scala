package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.GraphAlgos

/** Round-12 operator family specs: logistic GLM, k-fold CV OLS, and
  * community quality (modularity + conductance).
  */
class Round12Spec extends SparkSpec {

  test("logitGlm recovers a planted monotone relationship") {
    import spark.implicits._
    // p(y=1|x) rises with x: x=0 → 1/10, x=5 → 6/10 within each block
    val rows = for {
      x <- 0 to 5
      i <- 0 until 100
    } yield (x.toLong, if (i % 10 <= x) 1L else 0L)
    val out = Regression.logitGlm(rows.toDF("x", "y"), "x", "y", rounds = 3)
      .orderBy("x").collect()
    assert(out.length == 6)
    val b1 = out.head.getAs[Double]("b1")
    assert(b1 > 0, s"slope should be positive, got $b1")
    // fitted probabilities are monotone in x for a single-feature logit
    val ps = out.map(_.getAs[Double]("p_hat")).toSeq
    assert(ps == ps.sorted, s"p_hat not monotone: $ps")
    // empirical rates bracket the fit at the extremes
    assert(out.head.getAs[Double]("mean_y") < out.last.getAs[Double]("mean_y"))
  }

  test("logitGlm requires both classes") {
    import spark.implicits._
    val allOnes = Seq((1L, 1L), (2L, 1L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Regression.logitGlm(allOnes, "x", "y")
    }
  }

  test("cvFoldOls recovers an exact linear relation on every fold") {
    import spark.implicits._
    // y = 7x + 3 exactly → every fold's model is exact, rmse 0
    val rows = (1 to 500).map(i => (i.toString, i.toLong % 50, (i % 50) * 7L + 3L))
    val out = Regression.cvFoldOls(rows.toDF("k", "x", "y"), "k", "x", "y", k = 4)
      .orderBy("fold").collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("b1") - 7.0) < 1e-6)
      assert(math.abs(r.getAs[Double]("b0") - 3.0) < 1e-6)
      assert(r.getAs[Double]("test_rmse") == 0.0)
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 500L)
    }
  }

  test("cvFoldOls held-out rmse exceeds zero on noisy data") {
    import spark.implicits._
    // deterministic "noise": y = 5x + (i mod 13) — not collinear
    val rows = (1 to 400).map(i => (i.toString, (i % 20).toLong,
      (i % 20) * 5L + (i % 13).toLong))
    val out = Regression.cvFoldOls(rows.toDF("k", "x", "y"), "k", "x", "y", k = 5)
      .collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Double]("test_rmse") > 0))
  }

  test("communityQuality: two cliques joined by one bridge edge") {
    import spark.implicits._
    // cliques {a1,a2,a3} and {b1,b2,b3}, bridge a1–b1 → m = 7
    val edges = Seq(
      ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
      ("a1", "b1")).toDF("src", "dst")
    val comm = Seq(("a1", "A"), ("a2", "A"), ("a3", "A"),
      ("b1", "B"), ("b2", "B"), ("b3", "B")).toDF("node", "community")
    val out = GraphAlgos.communityQuality(edges, "src", "dst",
      comm, "node", "community").orderBy("community").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("intra_edges") == 3L)
      assert(r.getAs[Long]("cut_edges") == 1L)
      assert(r.getAs[Long]("volume") == 7L)
      // conductance = 1 / min(7, 14-7) = 1/7
      assert(math.abs(r.getAs[Double]("conductance") - 1.0 / 7) < 1e-6)
      // modularity = 2 · (4·7·3 − 49) / (4·49) = 70/196
      assert(math.abs(r.getAs[Double]("modularity") - 70.0 / 196) < 1e-4)
    }
  }

  test("communityQuality: single community has null conductance, Q near 0") {
    import spark.implicits._
    val edges = Seq(("x", "y"), ("y", "z")).toDF("src", "dst")
    val comm = Seq(("x", "C"), ("y", "C"), ("z", "C")).toDF("node", "community")
    val out = GraphAlgos.communityQuality(edges, "src", "dst",
      comm, "node", "community").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("intra_edges") == 2L)
    assert(r.getAs[Long]("cut_edges") == 0L)
    // vol = 2m → min(vol, 2m − vol) = 0 → null
    assert(r.isNullAt(r.fieldIndex("conductance")))
    // Q = (4·2·2 − 16)/16 = 0
    assert(r.getAs[Double]("modularity") == 0.0)
  }

  test("communityQuality canonicalizes duplicate and self edges") {
    import spark.implicits._
    val edges = Seq(("x", "y"), ("y", "x"), ("x", "x")).toDF("src", "dst")
    val comm = Seq(("x", "C"), ("y", "D")).toDF("node", "community")
    val out = GraphAlgos.communityQuality(edges, "src", "dst",
      comm, "node", "community").collect()
    // one undirected edge x–y, a cut edge for both sides
    assert(out.forall(_.getAs[Long]("cut_edges") == 1L))
    assert(out.forall(_.getAs[Long]("intra_edges") == 0L))
  }
}
