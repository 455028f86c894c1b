package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CUSUM drift detection and day-of-week seasonality. */
class DriftSeasonSpec extends SparkSpec {

  private def ts(day: Int): Timestamp =
    new Timestamp(day.toLong * 86400000L) // epoch days → ms (UTC session)

  test("cusumDrift flags sustained deviation, not a balanced series") {
    import spark.implicits._
    // type a: constant 10/day for 10 days → dev 0 everywhere, no drift.
    // type b: 5/day for 5 days then 15/day for 5 days → prefix runs below
    // the mean line; |n·prefix − idx·S| peaks mid-series.
    val rows =
      (0 until 10).map(d => ("a", ts(d), 10.0)) ++
      (0 until 5).map(d => ("b", ts(d), 5.0)) ++
      (5 until 10).map(d => ("b", ts(d), 15.0))
    val out = Events.cusumDrift(rows.toDF("t", "ts", "v"), "t", "ts", "v",
      theta = 2)
    val a = out.where(col("t") === "a").collect()
    assert(a.forall(_.getAs[Double]("dev_value") == 0.0))
    assert(a.forall(!_.getAs[Boolean]("drift")))
    val b = out.where(col("t") === "b").orderBy("day").collect()
    // day 5 (idx 5): prefix 25, mean 10/day → dev = 25 − 50 = −25
    assert(b(4).getAs[Double]("dev_value") == -25.0)
    // theta=2 ⇒ threshold |dev·n| > 2·S = 200·n-units → dev beyond 20/day·n
    assert(b(4).getAs[Boolean]("drift"))
    // final day: prefix = S → dev exactly 0
    assert(b(9).getAs[Double]("dev_value") == 0.0)
  }

  test("seasonalityIndex: uniform series indexes to 1, skewed dow above 1") {
    import spark.implicits._
    // 14 consecutive days, value 1.0 except dow 0 (Sundays) gets 3.0
    val rows = (0 until 14).map { d =>
      val dow = (d + 4) % 7 // epoch day 0 = Thursday = dow 4
      ("t", ts(d), if (dow == 0) 3.0 else 1.0)
    }
    val out = Events.seasonalityIndex(rows.toDF("t", "ts", "v"), "t", "ts", "v")
      .collect().map(r => r.getAs[Int]("dow") -> r).toMap
    assert(out.size == 7)
    val sunday = out(0)
    assert(sunday.getAs[Double]("mean_value") == 3.0)
    // overall mean = (2·3 + 12·1)/14 = 18/14 → index = 3/(18/14) = 7/3
    assert(math.abs(sunday.getAs[Double]("season_index") - 7.0 / 3) < 1e-5)
    assert(math.abs(out(1).getAs[Double]("season_index") - 7.0 / 9) < 1e-5)
  }

  test("stateRuns compresses consecutive same-state events") {
    import spark.implicits._
    // user u: A A B A, interleaved ts; user v: single run
    val rows = Seq(
      ("u", ts(0), "A", 1L), ("u", ts(1), "A", 2L), ("u", ts(2), "B", 3L),
      ("u", ts(3), "A", 4L), ("v", ts(0), "X", 5L), ("v", ts(1), "X", 6L))
    val out = Events.stateRuns(rows.toDF("k", "ts", "st", "id"),
      "k", "ts", "st", "id")
      .orderBy("k", "run").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("u", 1L, "A", 2L), ("u", 2L, "B", 1L), ("u", 3L, "A", 1L),
      ("v", 1L, "X", 2L)))
  }

  test("kaplanMeier: censoring keeps late users in the risk set") {
    import spark.implicits._
    // 4 users sign up at day 0; horizon = day 3 (a view event sets max day)
    // u1 converts at day 1, u2 at day 2, u3/u4 never -> censored at t=3
    val rows = Seq(
      ("u1", ts(0), "signup"), ("u2", ts(0), "signup"),
      ("u3", ts(0), "signup"), ("u4", ts(0), "signup"),
      ("u1", ts(1), "purchase"), ("u2", ts(2), "purchase"),
      ("zz", ts(3), "view"))
    val out = Events.kaplanMeier(rows.toDF("u", "ts", "t"), "u", "ts", "t",
      "signup", "purchase").orderBy("t").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    // t=1: d=1 of n=4 -> S = 0.75; t=2: d=1 of n=3 -> S = 0.5
    assert(out(1L) == ((1L, 0L, 4L, 0.75)))
    assert(out(2L) == ((1L, 0L, 3L, 0.5)))
    // t=3: both remaining users censored, no events -> S stays 0.5
    assert(out(3L) == ((0L, 2L, 2L, 0.5)))
  }

  test("logRank: identical cohorts score ~0, divergent cohorts score high") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // identical conversion behavior in both groups -> chi2 ~ 0
    val same = (0 until 40).flatMap { i =>
      Seq((i.toLong, ts(0), "signup"), (i.toLong, ts(1 + i % 3), "purchase"))
    } :+ (999L, ts(9), "view")
    val r0 = Events.logRank(same.toDF("u", "ts", "t"), "u", "ts", "t",
      "signup", "purchase", col("u") % 2 === 1).collect().head
    assert(r0.getAs[Double]("chi2") < 0.1)
    // odd users convert day 1, even users never (censored) -> large chi2
    val div = (0 until 40).map(i => (i.toLong, ts(0), "signup")) ++
      (0 until 40).filter(_ % 2 == 1)
        .map(i => (i.toLong, ts(1), "purchase")) :+ (999L, ts(9), "view")
    val r1 = Events.logRank(div.toDF("u", "ts", "t"), "u", "ts", "t",
      "signup", "purchase", col("u") % 2 === 1).collect().head
    assert(r1.getAs[Long]("events1") == 20L && r1.getAs[Long]("events2") == 0L)
    assert(r1.getAs[Double]("chi2") > 10.0, s"got ${r1.getAs[Double]("chi2")}")
  }

  test("seasonalNaiveEval: perfectly seasonal series scores MAE 0") {
    import spark.implicits._
    // value depends only on day-of-week -> lag-7 forecast is exact
    val rows = (0 until 28).map(d => (ts(d), 10.0 + (d % 7)))
    val r = Events.seasonalNaiveEval(rows.toDF("ts", "v"), "ts", "v", 7)
      .collect().head
    assert(r.getAs[Long]("n_scored") == 21L)
    assert(r.getAs[Double]("mae") == 0.0)
    assert(r.getAs[Double]("mase") == 0.0)
  }

  test("apdex: satisfied/tolerating/frustrated split") {
    import spark.implicits._
    // T = 10: latencies 5 (sat), 15 (tol), 50 (frustrated), 10 (sat edge)
    val df = Seq(("g", 5.0), ("g", 15.0), ("g", 50.0), ("g", 10.0))
      .toDF("g", "lat")
    val r = Events.apdex(df, "g", "lat", 10.0).collect().head
    assert(r.getAs[Long]("satisfied") == 2L)
    assert(r.getAs[Long]("tolerating") == 1L)
    assert(r.getAs[Double]("apdex") == 0.625) // (2 + 0.5) / 4
  }

  test("robustSeasonalAnomalies: outlier flags, stable weekday does not") {
    import spark.implicits._
    // 5 weeks of data: type t, every day value 10 except ONE huge Monday
    val rows = (0 until 35).map { d =>
      val v = if (d == 11) 500.0 else 10.0 + (d % 7) // day 11 is an outlier
      ("t", ts(d), v)
    }
    val out = Events.robustSeasonalAnomalies(rows.toDF("t", "ts", "v"),
      "t", "ts", "v", k = 3.0)
    val anomalies = out.where(col("anomaly")).collect()
    assert(anomalies.map(_.getLong(1)).toSeq == Seq(11L))
    // the outlier's weekday baseline stays at the MEDIAN of its weekday
    // (the other four 10+dow values), not dragged toward 500
    val a = anomalies.head
    assert(a.getAs[Double]("baseline") < 20.0)
    assert(a.getAs[Double]("value") == 500.0)
  }
}
