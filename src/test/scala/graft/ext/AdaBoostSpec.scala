package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AdaBoostSpec extends SparkSpec {

  test("adaBoost2 finds the informative feature and reduces ensemble error") {
    import spark.implicits._
    // y = (a > 50) with 10% planted noise; b is pure noise — round 1 must
    // split on a, and the ensemble must beat the 50% base rate clearly
    val rows = (0 until 1000).map { i =>
      val a = (i % 100).toDouble
      val b = ((i * 37) % 100).toDouble
      val clean = a > 50
      val y = if (i % 10 == 0) !clean else clean
      (a, b, y)
    }
    val out = Tree.adaBoost2(rows.toDF("a", "b", "y"), Seq("a", "b"),
      col("y"), nBins = 16).orderBy("round").collect()
    assert(out.length == 2)
    val r1 = out.head
    assert(r1.getAs[String]("feature") == "a")
    // round-1 stump error ≈ the 10% noise floor, alpha > 0
    val eps1 = r1.getAs[Long]("err_num").toDouble / r1.getAs[Long]("err_den")
    assert(eps1 < 0.2, s"round-1 error $eps1 should be near the noise floor")
    assert(r1.getAs[Double]("alpha") > 0)
    assert(r1.getAs[Double]("ens_err") < 0.2)
  }

  test("adaBoost2 round-2 error is computed under the reweighting") {
    import spark.implicits._
    // any boostable data: weighted round-2 error must sit in (0, 1/2)
    // and err_den must equal 2·e1·(n − e1) (the cleared-denominator mass)
    val rows = (0 until 400).map { i =>
      ((i % 20).toDouble, ((i * 7) % 13).toDouble, (i % 3) == 0)
    }
    val out = Tree.adaBoost2(rows.toDF("a", "b", "y"), Seq("a", "b"),
      col("y"), nBins = 8).orderBy("round").collect()
    val e1 = out(0).getAs[Long]("err_num")
    val n = out(0).getAs[Long]("err_den")
    val d2 = out(1).getAs[Long]("err_den")
    assert(d2 == 2L * e1 * (n - e1))
    val e2 = out(1).getAs[Long]("err_num")
    assert(e2 > 0 && e2 * 2 < d2)
  }

  test("adaBoost2 refuses an unboostable stump") {
    import spark.implicits._
    // perfectly separable: round-1 error would be 0 → alpha undefined
    val rows = (0 until 100).map(i => ((i % 10).toDouble, i % 10 >= 5))
    intercept[IllegalArgumentException] {
      Tree.adaBoost2(rows.toDF("a", "y"), Seq("a"), col("y"), nBins = 10)
    }
  }
}
