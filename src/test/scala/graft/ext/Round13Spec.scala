package graft.ext

import graft.SparkSpec
import graft.graph.GraphAlgos

/** Round-13 operator family specs: SCC, KS test, mutual information,
  * stratified-matching ATT.
  */
class Round13Spec extends SparkSpec {

  test("sccFixed: two cycles bridged by a DAG edge + a source node") {
    import spark.implicits._
    // cycle {a,b,c}, cycle {x,y}, bridge c→x (one-way), source s→a
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "x"),
      ("c", "x"), ("s", "a")).toDF("src", "dst")
    val out = GraphAlgos.sccFixed(edges, "src", "dst",
      peelRounds = 3, propRounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("a") == out("b") && out("b") == out("c"))
    assert(out("x") == out("y"))
    assert(out("a") != out("x"))
    // singleton source is its own SCC, never merged forward
    assert(out("s") != out("a") && out("s") != out("x"))
    // all assignments converged (no '?' markers)
    assert(out.values.forall(!_.startsWith("?")))
  }

  test("sccFixed: pure DAG yields all-singleton SCCs") {
    import spark.implicits._
    val edges = Seq(("1", "2"), ("2", "3"), ("1", "3")).toDF("src", "dst")
    val out = GraphAlgos.sccFixed(edges, "src", "dst", 2, 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.size == 3)
    assert(out.values.toSet.size == 3)
    assert(out.forall { case (n, s) => s == n })
  }

  test("sccFixed marks unconverged nodes instead of guessing") {
    import spark.implicits._
    // long 6-cycle with 1 propagation round and 1 peel: labels cannot
    // traverse the cycle, so at least the non-minimal nodes stay open
    val ns = (0 to 5).map(i => s"n$i")
    val edges = ns.zip(ns.tail :+ ns.head).toDF("src", "dst")
    val out = GraphAlgos.sccFixed(edges, "src", "dst",
      peelRounds = 1, propRounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.values.exists(_.startsWith("?")))
  }

  test("sccFixed never splits a cycle into silent singletons under " +
      "truncated propagation") {
    import spark.implicits._
    // 3-cycle with propRounds=1: one peel can agree on only part of the
    // SCC; a later trim must NOT confidently label the stranded members
    // as singleton SCCs — they either share label 'a' or carry '?'
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val out = GraphAlgos.sccFixed(edges, "src", "dst",
      peelRounds = 3, propRounds = 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.size == 3)
    val labels = out.values.toSeq
    // every non-'?' assignment must be the true SCC label 'a'
    assert(labels.filterNot(_.startsWith("?")).forall(_ == "a"),
      s"silently split SCC: $out")
  }

  test("ksTest: identical samples give D = 0, disjoint give D = 1") {
    import spark.implicits._
    val same = (1 to 50).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong)))
      .toDF("g", "v")
    val r0 = Stats.ksTest(same, "g", "v", "a", "b").collect().head
    assert(r0.getAs[Long]("d_num") == 0L)
    assert(r0.getAs[Double]("d") == 0.0)
    val disjoint = ((1 to 30).map(i => ("a", i.toLong)) ++
      (31 to 70).map(i => ("b", i.toLong))).toDF("g", "v")
    val r1 = Stats.ksTest(disjoint, "g", "v", "a", "b").collect().head
    assert(r1.getAs[Double]("d") == 1.0)
    // max gap is reached exactly at a's last value
    assert(r1.getAs[Long]("at_value") == 30L)
  }

  test("ksTest D matches a hand-computed shifted step") {
    import spark.implicits._
    // a = {1,2,3,4}, b = {3,4,5,6} → max |F_a − F_b| = 1/2 at v=2
    val df = (Seq(1, 2, 3, 4).map(v => ("a", v.toLong)) ++
      Seq(3, 4, 5, 6).map(v => ("b", v.toLong))).toDF("g", "v")
    val r = Stats.ksTest(df, "g", "v", "a", "b").collect().head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("d") == 0.5)
    assert(r.getAs[Long]("at_value") == 2L)
  }

  test("mutualInfo: independent columns have MI ~ 0, copied columns MI = H") {
    import spark.implicits._
    val indep = (0 until 400).map(i => (s"a${i % 4}", s"b${i % 5}"))
      .toDF("a", "b") // 4×5 grid visited uniformly → exactly independent
    val r0 = Stats.mutualInfo(indep, "a", "b").collect().head
    assert(math.abs(r0.getAs[Double]("mi")) < 1e-6)
    assert(math.abs(r0.getAs[Double]("h_a") - math.log(4)) < 1e-6)
    val copy = (0 until 100).map(i => (s"v${i % 4}", s"v${i % 4}"))
      .toDF("a", "b")
    val r1 = Stats.mutualInfo(copy, "a", "b").collect().head
    assert(math.abs(r1.getAs[Double]("mi") - r1.getAs[Double]("h_a")) < 1e-6)
    assert(math.abs(r1.getAs[Double]("h_ab") - r1.getAs[Double]("h_a")) < 1e-6)
  }

  test("attMatched recovers a planted constant effect under confounding") {
    import spark.implicits._
    // stratum x has baseline 100·x; treatment adds exactly 7;
    // treatment is far more common at high x (confounded: naive diff
    // picks up the baseline gradient, matching must recover 7)
    val rows = for {
      x <- 1 to 10
      i <- 0 until 20
    } yield {
      val treated = i < x // 1/20 at x=1 … 10/20 at x=10
      (treated, 100L * x + (if (treated) 7L else 0L), x.toLong)
    }
    val r = Stats.attMatched(rows.toDF("t", "y", "x"), "t", "y", "x")
      .collect().head
    assert(r.getAs[Double]("att") == 7.0)
    assert(r.getAs[Double]("naive_diff") > 100.0) // confounded estimate
    assert(r.getAs[Long]("n_strata_matched") == 10L)
    assert(r.getAs[Long]("n_treated_unmatched") == 0L)
  }

  test("ateIpw recovers a planted constant effect and counts drops") {
    import spark.implicits._
    // same confounded design as the ATT spec — constant effect 7
    val rows = (for {
      x <- 1 to 10
      i <- 0 until 20
    } yield {
      val treated = i < x
      (treated, 100L * x + (if (treated) 7L else 0L), x.toLong)
    }) ++ Seq((true, 999L, 99L)) // stratum with no control → dropped
    val r = Stats.ateIpw(rows.toDF("t", "y", "x"), "t", "y", "x")
      .collect().head
    assert(r.getAs[Double]("ate") == 7.0)
    assert(r.getAs[Long]("n_rows_used") == 200L)
    assert(r.getAs[Long]("n_rows_dropped") == 1L)
    assert(r.getAs[Long]("n_strata") == 10L)
  }

  test("ipfRake pulls row margins toward uniform, preserves column totals") {
    import spark.implicits._
    // skewed 2×2: row a carries 3x the mass of row b
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val out = Stats.ipfRake(rows.toDF("r", "c"), "r", "c", rounds = 3)
      .collect()
    val byRow = out.groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getAs[Double]("weight")).sum }
    val byCol = out.groupBy(_.getString(1))
      .map { case (k, v) => k -> v.map(_.getAs[Double]("weight")).sum }
    // rows raked to ~40 each (uniform over total 80)
    assert(math.abs(byRow("a") - 40.0) < 1.0, s"row a: ${byRow("a")}")
    assert(math.abs(byRow("b") - 40.0) < 1.0, s"row b: ${byRow("b")}")
    // column totals preserved at their observed 40/40
    assert(math.abs(byCol("x") - 40.0) < 1.0)
    assert(math.abs(byCol("y") - 40.0) < 1.0)
    // raking re-weights, never changes the observed counts
    assert(out.map(_.getAs[Long]("n")).sum == 80L)
  }

  test("attMatched drops strata without common support") {
    import spark.implicits._
    // x=1 has only treated rows → dropped; x=2 has both arms
    val rows = Seq((true, 50L, 1L), (true, 60L, 1L),
      (true, 20L, 2L), (false, 10L, 2L))
    val r = Stats.attMatched(rows.toDF("t", "y", "x"), "t", "y", "x")
      .collect().head
    assert(r.getAs[Long]("n_strata_matched") == 1L)
    assert(r.getAs[Long]("n_treated_unmatched") == 2L)
    assert(r.getAs[Double]("att") == 10.0)
  }
}
