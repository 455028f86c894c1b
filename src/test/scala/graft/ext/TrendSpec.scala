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
