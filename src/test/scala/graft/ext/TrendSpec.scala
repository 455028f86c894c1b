package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Theil–Sen robust slopes and SAX symbolic words. */
class TrendSpec extends SparkSpec {

  test("theilSenSlope ignores a gross outlier that wrecks the mean slope") {
    import spark.implicits._
    // y = 10x exactly except one wild point at x=3 (y = 1000).
    val rows = Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 1000L), (4L, 40L))
      .map { case (x, y) => ("s", x, y) }
    val out = Stats.theilSenSlope(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(out.getAs[Long]("n_pairs") == 10L)
    assert(out.getAs[Double]("ts_slope") == 10.0) // median slope is clean
  }

  test("theilSenSlope lower-median on an even pair count is deterministic") {
    import spark.implicits._
    // 4 points → 6 pairs → lower median = 3rd by (slope, xi, xj)
    val rows = Seq(("s", 0L, 0L), ("s", 1L, 1L), ("s", 2L, 4L), ("s", 3L, 9L))
    val out = Stats.theilSenSlope(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    // slopes: (0,1)=1 (0,2)=2 (0,3)=3 (1,2)=3 (1,3)=4 (2,3)=5 → 3rd = 3.0
    assert(out.getAs[Double]("ts_slope") == 3.0)
  }

  test("changePoint finds a planted level shift at the right day") {
    import spark.implicits._
    def ts(day: Int) = new Timestamp(day.toLong * 86400000L)
    // 10 days at $100, then 10 days at $500 → boundary after day 9
    val rows = (0 until 10).map(d => ("s", ts(d), 100.0)) ++
      (10 until 20).map(d => ("s", ts(d), 500.0))
    val out = Events.changePoint(rows.toDF("t", "ts", "v"), "t", "ts", "v")
      .collect().head
    assert(out.getAs[Long]("split_day") == 9L)
    assert(out.getAs[Long]("n_before") == 10L && out.getAs[Long]("n_after") == 10L)
    assert(out.getAs[Double]("mean_before") == 100.0)
    assert(out.getAs[Double]("mean_after") == 500.0)
  }

  test("conformalNextInterval covers a linear series with one outlier") {
    import spark.implicits._
    // y = 10x exactly except x=5 off by +30; 90% quantile of |residuals|
    // over n=20: rank ceil(0.9·21) = 19 → a zero-ish residual below 30
    val rows = (0 until 20).map(x =>
      ("s", x.toLong, 10L * x + (if (x == 5) 30L else 0L)))
    val out = Stats.conformalNextInterval(rows.toDF("g", "x", "y"),
      "g", "x", "y", alphaPct = 10)
      .collect().head
    assert(out.getAs[Long]("x_star") == 20L)
    val (yh, lo, hi) = (out.getAs[Double]("yhat"), out.getAs[Double]("lo"),
      out.getAs[Double]("hi"))
    assert(math.abs(yh - 200.0) < 5.0) // fit dragged slightly by the outlier
    assert(lo < yh && hi > yh && (hi - lo) < 30.0) // q excludes the outlier
  }

  test("saxWords maps a ramp to a monotone word, a flat series to 'aaaaaa'") {
    import spark.implicits._
    def ts(day: Int) = new Timestamp(day.toLong * 86400000L)
    val ramp = (0 until 12).map(d => ("r", ts(d), d * 100.0))
    val flat = (0 until 12).map(d => ("f", ts(d), 5.0))
    val out = Events.saxWords((ramp ++ flat).toDF("t", "ts", "v"),
      "t", "ts", "v", segments = 6, alphabet = 4)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("f") == "aaaaaa") // mx == mn → all symbol 0
    // 12 days / 6 segments: means 50,250,450,650,850,1050 (cents ×100)
    // → nondecreasing symbols starting 'a' ending 'd'
    val w = out("r")
    assert(w.length == 6 && w.head == 'a' && w.last == 'd')
    assert(w.sliding(2).forall(p => p(0) <= p(1)))
  }
}
