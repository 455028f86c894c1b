package graft.ext

import graft.SparkSpec

class ForecastSpec extends SparkSpec {

  private def mkDf(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "ts_day", "value")
      .selectExpr("event_type",
        "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,cast(ts_day as int),0,0,0) AS ts",
        "value")
  }

  test("holtWinters tracks a trending weekly-seasonal series") {
    // value = 100 + 2·day + 30 on weekend slots → level/trend recover
    val rows = (0 until 140).map { d =>
      val seasonal = if (d % 7 >= 5) 30.0 else 0.0
      ("a", d.toLong, 100.0 + 2.0 * d + seasonal)
    }
    val out = Events.holtWinters(mkDf(rows), "event_type", "ts", "value",
      horizon = 7).collect().head
    assert(out.getAs[Long]("n_days") == 140L)
    val trend = out.getAs[Double]("trend")
    assert(trend > 1.0 && trend < 3.0, s"trend $trend should be near 2")
    val level = out.getAs[Double]("level")
    assert(level > 300 && level < 450, s"level $level near the series end")
    // forecast continues the trend from the level
    val fc = out.getAs[Double]("forecast_h7")
    assert(fc > level, "7-day forecast must sit above the level with a " +
      s"positive trend (fc=$fc level=$level)")
  }

  test("holtWinters seasonal slot captures the weekend lift") {
    val rows = (0 until 140).map { d =>
      val seasonal = if (d % 7 == 3) 50.0 else 0.0 // one hot weekday slot
      ("a", d.toLong, 200.0 + seasonal)
    }
    // last day = 139 → forecast day 146, slot 146 % 7 = 6 (cold slot)
    val cold = Events.holtWinters(mkDf(rows), "event_type", "ts", "value",
      horizon = 7).collect().head
    assert(math.abs(cold.getAs[Double]("s_fc")) < 15.0,
      s"cold slot seasonal should be small: ${cold.getAs[Double]("s_fc")}")
    // horizon 5 lands on day 144, slot 144 % 7 = 4... choose horizon so
    // the forecast hits the hot slot 3: need (139 + h) % 7 == 3 → h = 4
    val hot = Events.holtWinters(mkDf(rows), "event_type", "ts", "value",
      horizon = 4).collect().head
    assert(hot.getAs[Double]("s_fc") > 20.0,
      s"hot slot seasonal should be large: ${hot.getAs[Double]("s_fc")}")
  }

  test("ar2Forecast recovers an exact AR-style continuation") {
    // strongly autocorrelated ramp: forecast continues near the ramp
    val rows = (0 until 100).map(d => ("a", d.toLong, 10.0 * d))
    val out = Events.ar2Forecast(
      mkDf(rows).selectExpr("event_type", "ts",
        "cast(round(value * 100) as long) AS cents"),
      "event_type", "ts", "cents").collect().head
    assert(out.getAs[Long]("n_obs") == 100L)
    // a pure ramp has r1, r2 ≈ 1 from the mean-centered view; the
    // forecast must land above the last value's neighborhood mean
    val fc = out.getAs[Double]("forecast_next")
    val mean = out.getAs[Double]("mean")
    assert(fc > mean, s"forecast $fc should exceed the series mean $mean")
  }

  test("ar2Forecast is exact on a white-ish series: phi small") {
    def mix(z0: Long): Long = { // splitmix64 finalizer — real scrambling
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val rows = (0 until 200).map(d => ("a", d.toLong,
      ((mix(d.toLong) & 0x7fffffffL) % 100).toDouble))
    val out = Events.ar2Forecast(
      mkDf(rows).selectExpr("event_type", "ts",
        "cast(round(value * 100) as long) AS cents"),
      "event_type", "ts", "cents").collect().head
    assert(math.abs(out.getAs[Double]("phi1")) < 0.3)
    assert(math.abs(out.getAs[Double]("phi2")) < 0.3)
  }
}
