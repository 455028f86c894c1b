package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Rank-1 ALS and leave-one-out target encoding. */
class FactorizeSpec extends SparkSpec {

  test("als1 fits an exactly rank-1 matrix to near-zero RMSE") {
    import spark.implicits._
    // r_ui = a_u * b_i with a = (1,2,3), b = (2,4) → rank-1, recoverable
    val a = Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val b = Map(10L -> 2L, 20L -> 4L)
    val ratings = for { u <- a.keys.toSeq; i <- b.keys.toSeq }
      yield (u, i, a(u) * b(i))
    val df = ratings.toDF("u", "i", "r")
    val (x, y) = Factorize.als1(df, "u", "i", "r", rounds = 2)
    val rmse = Factorize.als1Rmse(df, "u", "i", "r", x, y)
      .collect().head.getAs[Double]("rmse")
    assert(rmse < 0.01) // quantization residue only
    // factor RATIOS match the generating vectors (scale split is free)
    val xs = x.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(xs(2L).toDouble / xs(1L) - 2.0) < 0.01)
    assert(math.abs(xs(3L).toDouble / xs(1L) - 3.0) < 0.01)
  }

  test("als1 on a non-rank-1 matrix leaves residual error") {
    import spark.implicits._
    val df = Seq((1L, 10L, 10L), (1L, 20L, 1L), (2L, 10L, 1L), (2L, 20L, 10L))
      .toDF("u", "i", "r") // anti-diagonal dominance: rank 2
    val (x, y) = Factorize.als1(df, "u", "i", "r", rounds = 3)
    val rmse = Factorize.als1Rmse(df, "u", "i", "r", x, y)
      .collect().head.getAs[Double]("rmse")
    assert(rmse > 1.0)
  }

  test("targetEncodeLoo excludes the row's own label and smooths") {
    import spark.implicits._
    // group g1: labels (1, 0); global: 3 rows, sum 2; m = 1.
    // row1 (y=1): enc = ((1-1)*3 + 1*2) / ((2-1+1)*3) = 2/6
    // row2 (y=0): enc = ((1-0)*3 + 1*2) / 6 = 5/6
    val df = Seq((1L, "g1", 1), (2L, "g1", 0), (3L, "g2", 1))
      .toDF("id", "g", "y")
    val out = Stats.targetEncodeLoo(df, "g", "y", m = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("enc")).toMap
    assert(out(1L) == math.rint(2.0 / 6.0 * 1e6) / 1e6)
    assert(out(2L) == math.rint(5.0 / 6.0 * 1e6) / 1e6)
    // singleton group: enc = ((1-1)*3 + 2) / ((1-1+1)*3) = 2/3 (pure prior-ish)
    assert(out(3L) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
  }
}
