package graft.ext

import graft.SparkSpec

class PacfSpec extends SparkSpec {

  test("acfPacf on a slow square wave: strong decaying ACF, PACF cuts off") {
    import spark.implicits._
    // period-50 square wave: near-triangular ACF (r_k ≈ 1 − 4k/50), so
    // lag-1 is strong and decays; PACF(1) = ACF(1), |PACF(k≥2)| near 0
    val rows = (1 to 300).map { t =>
      ("s", t.toLong, if ((t / 25) % 2 == 0) 100L else -100L)
    }
    val out = Events.acfPacf(rows.toDF("k", "t", "v"), "k", "t", "v",
      maxLag = 4).orderBy("lag").collect()
    assert(out.length == 4)
    val acf = out.map(_.getAs[Double]("acf"))
    val pacf = out.map(_.getAs[Double]("pacf"))
    assert(acf(0) > 0.8, s"lag-1 ACF should be strong: ${acf(0)}")
    assert(math.abs(pacf(0) - acf(0)) < 1e-9) // DL base case
    assert(acf(0) > acf(1) && acf(1) > acf(2)) // decaying
    assert(math.abs(pacf(1)) < 0.3 && math.abs(pacf(2)) < 0.3)
  }

  test("acfPacf on alternating series: lag-1 ACF is negative") {
    import spark.implicits._
    val rows = (1 to 100).map(t => ("a", t.toLong,
      if (t % 2 == 0) 100L else -100L))
    val out = Events.acfPacf(rows.toDF("k", "t", "v"), "k", "t", "v",
      maxLag = 2).orderBy("lag").collect()
    assert(out(0).getAs[Double]("acf") < -0.9)
    assert(out(1).getAs[Double]("acf") > 0.9)
  }

  test("acfPacf rejects a constant series") {
    import spark.implicits._
    val rows = (1 to 50).map(t => ("c", t.toLong, 5L))
    intercept[IllegalArgumentException] {
      Events.acfPacf(rows.toDF("k", "t", "v"), "k", "t", "v", maxLag = 2)
    }
  }
}
