package graft.ext

import graft.SparkSpec

class FairnessSpec extends SparkSpec {

  test("fairnessProfile computes per-group rates and the parity gap") {
    import spark.implicits._
    // group A: 10 rows, 6 selected (3 TP on 4 pos, 3 FP on 6 neg)
    // group B: 10 rows, 2 selected (1 TP on 5 pos, 1 FP on 5 neg)
    val a = Seq.fill(3)(("A", true, true)) ++ Seq.fill(1)(("A", false, true)) ++
      Seq.fill(3)(("A", true, false)) ++ Seq.fill(3)(("A", false, false))
    val b = Seq.fill(1)(("B", true, true)) ++ Seq.fill(4)(("B", false, true)) ++
      Seq.fill(1)(("B", true, false)) ++ Seq.fill(4)(("B", false, false))
    val out = Stats.fairnessProfile((a ++ b).toDF("g", "p", "y"),
      "g", "p", "y").orderBy("g").collect()
    val ra = out(0); val rb = out(1)
    assert(ra.getAs[Double]("selection_rate") == 0.6)
    assert(rb.getAs[Double]("selection_rate") == 0.2)
    assert(ra.getAs[Double]("tpr") == 0.75)
    assert(rb.getAs[Double]("tpr") == 0.2)
    assert(ra.getAs[Double]("fpr") == 0.5)
    assert(rb.getAs[Double]("fpr") == 0.2)
    assert(ra.getAs[Double]("dp_gap") == 0.4)
    assert(rb.getAs[Double]("dp_gap") == 0.4)
  }

  test("fairnessProfile reports null TPR/FPR without both label classes") {
    import spark.implicits._
    val rows = Seq(("G", true, true), ("G", false, true)) // all positives
    val r = Stats.fairnessProfile(rows.toDF("g", "p", "y"), "g", "p", "y")
      .collect().head
    assert(r.getAs[Double]("tpr") == 0.5)
    assert(r.isNullAt(r.fieldIndex("fpr")))
  }
}
