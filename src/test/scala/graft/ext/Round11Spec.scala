package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-11 operators: Gram-matrix OLS/ridge, grid-bucketed DBSCAN, Holt
  * double exponential smoothing.
  */
class Round11Spec extends SparkSpec {

  test("gram2 + solve2 recovers a planted exact linear relation") {
    import spark.implicits._
    // y = 3 + 2*x1 - x2 over a non-degenerate integer grid → exact fit
    val rows = for { x1 <- 0 to 9; x2 <- 0 to 5 }
      yield (x1.toLong, x2.toLong, 3L + 2 * x1 - x2)
    val df = rows.toDF("x1", "x2", "y")
    val g = Regression.gram2(df, "x1", "x2", "y")
    val (b0, b1, b2, r2) = Regression.solve2(g)
    assert(math.abs(b0 - 3.0) < 1e-9)
    assert(math.abs(b1 - 2.0) < 1e-9)
    assert(math.abs(b2 + 1.0) < 1e-9)
    assert(math.abs(r2 - 1.0) < 1e-9)
  }

  test("ridge shrinks coefficients toward zero") {
    import spark.implicits._
    val rows = for { x1 <- 0 to 9; x2 <- 0 to 5 }
      yield (x1.toLong, x2.toLong, 3L + 2 * x1 - x2)
    val g = Regression.gram2(rows.toDF("x1", "x2", "y"), "x1", "x2", "y")
    val (_, b1o, b2o, _) = Regression.solve2(g)
    val (_, b1r, b2r, r2r) = Regression.solve2(g, g.n * g.n * 5)
    assert(math.abs(b1r) < math.abs(b1o))
    assert(math.abs(b2r) < math.abs(b2o))
    assert(r2r < 1.0) // shrunken fit no longer interpolates
  }

  test("solve2 rejects collinear features") {
    import spark.implicits._
    val rows = (0 to 9).map(i => (i.toLong, 2L * i, i.toLong))
    val g = Regression.gram2(rows.toDF("x1", "x2", "y"), "x1", "x2", "y")
    intercept[IllegalArgumentException] { Regression.solve2(g) }
  }

  test("dbscanGrid: two blobs, a border point, and noise") {
    import spark.implicits._
    // eps = 50_000 q-units = 0.05 raw; minPts = 4.
    // Blob A: ids 1-4 packed within 0.01 of (0.10, 0.10) → all core.
    // Blob B: ids 10-13 packed at (0.50, 0.50) → all core.
    // id 20: right of A — inside eps of A's two right members (2, 4)
    //        only → |N| = 3 < minPts, but core neighbors → border in A.
    // id 30: isolated at (0.90, 0.10) → noise.
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f)
    val pts = Seq(
      (1L, v(0.100, 0.100)), (2L, v(0.105, 0.100)),
      (3L, v(0.100, 0.105)), (4L, v(0.105, 0.105)),
      (10L, v(0.500, 0.500)), (11L, v(0.505, 0.500)),
      (12L, v(0.500, 0.505)), (13L, v(0.505, 0.505)),
      (20L, v(0.151, 0.105)), (30L, v(0.900, 0.100)))
    val out = Clustering.dbscanGrid(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", eps = 50000L, minPts = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.size == 10)
    (1L to 4L).foreach(i => assert(out(i) == ("core", 1L)))
    (10L to 13L).foreach(i => assert(out(i) == ("core", 10L)))
    assert(out(20L) == ("border", 1L))
    assert(out(30L) == ("noise", -1L))
  }

  test("poissonGlm recovers a planted log-linear rate") {
    import spark.implicits._
    // y deterministic ≈ Poisson mean: y = round(exp(1 + 0.3x)), x in 0..5,
    // many rows per level → Newton should land near (1, 0.3)
    val rows = for { x <- 0 to 5; i <- 1 to 50 } yield {
      val lam = math.exp(1.0 + 0.3 * x)
      // spread y around the mean deterministically, preserving the level mean
      val y = math.round(lam).toLong + (if (i % 2 == 0) 1L else -1L) * (i % 3)
      (x.toLong, math.max(y, 0L))
    }
    val out = Regression.poissonGlm(rows.toDF("x", "y"), "x", "y", rounds = 4)
      .collect()
    val b0 = out.head.getAs[Double]("b0")
    val b1 = out.head.getAs[Double]("b1")
    assert(math.abs(b1 - 0.3) < 0.05)
    assert(math.abs(b0 - 1.0) < 0.15)
    // fitted rates track level means
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("lambda_hat") -
        r.getAs[Double]("mean_y")) < 1.5)
    }
  }

  test("lofGrid: fringe point scores well above the dense core") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f)
    // 3×3 lattice at 0.01 spacing (dense core) + one point 0.045 off —
    // inside eps of the edge but in a far sparser neighborhood
    val core = for { i <- 0 until 3; j <- 0 until 3 }
      yield ((i * 3 + j).toLong, v(0.10 + 0.01 * i, 0.10 + 0.01 * j))
    val fringe = Seq((100L, v(0.165, 0.11)))
    val out = Clustering.lofGrid((core ++ fringe).toDF("vec_id", "embedding"),
      "vec_id", "embedding", eps = 50000L, minNbrs = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // core members sit near LOF 1.0 (±30% for the bounded-radius variant)
    assert(core.forall { case (id, _) => out(id) > 700 && out(id) < 1300 })
    assert(out(100L) > 1400) // fringe point flagged (measured 1494)
  }

  test("holtSmooth matches a direct replay of the integer recurrence") {
    import spark.implicits._
    def ts(day: Int) = new Timestamp(day.toLong * 86400000L)
    // constant series: level locks to the constant, trend stays 0
    val const = (0 until 10).map(d => ("c", ts(d), 250.0))
    // ramp series: 100 + 10·t dollars/day
    val ramp = (0 until 10).map(d => ("r", ts(d), 100.0 + 10.0 * d))
    val out = Events.holtSmooth((const ++ ramp).toDF("t", "ts", "v"),
      "t", "ts", "v", horizon = 7)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("c").getAs[Double]("level") == 250.0)
    assert(out("c").getAs[Double]("trend") == 0.0)
    assert(out("c").getAs[Double]("forecast_h7") == 250.0)
    // replay the recurrence in cents with the same floor-division
    def fd10(a: Long) = { val m = ((a % 10) + 10) % 10; (a - m) / 10 }
    var l = 10000L; var b = 0L // y_1 = 100.00
    for (t <- 1 until 10) {
      val y = 10000L + 1000L * t
      val lN = fd10(2 * y + 8 * (l + b))
      b = fd10(3 * (lN - l) + 7 * b)
      l = lN
    }
    assert(out("r").getAs[Double]("level") == l / 100.0)
    assert(out("r").getAs[Double]("trend") == b / 100.0)
    assert(out("r").getAs[Long]("n_days") == 10L)
  }
}
