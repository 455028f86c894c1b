package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Covariance matrix one-scan aggregate and incremental aggregate merge. */
class CovIvmSpec extends SparkSpec {

  test("covarianceMatrix: exact population cov/corr on a known frame") {
    import spark.implicits._
    // y = 2x exactly → corr 1; pop var(x) = 2/3, cov(x,y) = 4/3
    val df = Seq(Array(1.0f, 2.0f), Array(2.0f, 4.0f), Array(3.0f, 6.0f))
      .toDF("v")
    val m = Stats.covarianceMatrix(df, "v", dims = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    assert(math.abs(m((0, 0)).getAs[Double]("cov") - 2.0 / 3) < 1e-6)
    assert(math.abs(m((0, 1)).getAs[Double]("cov") - 4.0 / 3) < 1e-6)
    assert(math.abs(m((1, 1)).getAs[Double]("cov") - 8.0 / 3) < 1e-6)
    assert(math.abs(m((0, 1)).getAs[Double]("corr") - 1.0) < 1e-6)
    assert(m((0, 0)).getAs[Double]("corr") == 1.0)
    assert(m.size == 3) // upper triangle only
  }

  test("covarianceMatrix: anti-correlated pair") {
    import spark.implicits._
    val df = Seq(Array(1.0f, 3.0f), Array(2.0f, 2.0f), Array(3.0f, 1.0f))
      .toDF("v")
    val m = Stats.covarianceMatrix(df, "v", 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    assert(math.abs(m((0, 1)).getAs[Double]("corr") + 1.0) < 1e-6)
  }

  test("mergePartialAggs equals the full recompute") {
    import spark.implicits._
    val base = Seq((1L, 10.50), (1L, 0.25), (2L, 3.00)).toDF("k", "v")
    val delta = Seq((1L, 1.00), (3L, 7.77)).toDF("k", "v")
    val merged = Events.mergePartialAggs(base, delta, "k", "v")
      .orderBy("k").collect()
    val recomputed = Events.mergePartialAggs(
      base.unionAll(delta), base.limit(0), "k", "v")
      .orderBy("k").collect()
    assert(merged.toSeq == recomputed.toSeq)
    val m1 = merged.find(_.getLong(0) == 1L).get
    assert(m1.getAs[Long]("n_events") == 3L)
    assert(m1.getAs[Double]("total_value") == 11.75)
    // delta-only key appears; base-only key survives
    assert(merged.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }
}
