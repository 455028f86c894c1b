package graft.ext

import java.sql.Timestamp

import graft.SparkSpec

/** Funnel and cohort-retention analytics. */
class EventsSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("funnel requires strict order and counts prefixes") {
    import spark.implicits._
    val rows = Seq(
      // user 1: full ordered funnel
      (1L, ts(10), "signup"), (1L, ts(20), "view"), (1L, ts(30), "purchase"),
      // user 2: purchase BEFORE view — completes only 2 steps
      (2L, ts(10), "signup"), (2L, ts(15), "purchase"), (2L, ts(20), "view"),
      // user 3: no signup — counts nowhere
      (3L, ts(10), "view"), (3L, ts(20), "purchase"),
      // user 4: signup only
      (4L, ts(10), "signup"))
    val out = Events.funnel(rows.toDF("u", "t", "ty"), "u", "t", "ty",
      Seq("signup", "view", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel greedy earliest-match finds a late valid chain") {
    import spark.implicits._
    // view happens both before and after signup: the post-signup one counts
    val rows = Seq(
      (1L, ts(5), "view"), (1L, ts(10), "signup"), (1L, ts(20), "view"))
    val out = Events.funnel(rows.toDF("u", "t", "ty"), "u", "t", "ty",
      Seq("signup", "view"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out == Map(1 -> 1L, 2 -> 1L))
  }

  test("decayedSum: one half-life halves the contribution; recent counts fully") {
    import spark.implicits._
    val h = 3600L
    val rows = Seq(
      (1L, ts(24 * h), 10.0), // at tMax: full weight
      (1L, ts(0), 10.0),      // 24 h earlier at half-life 24 h: weight 1/2
      (2L, ts(24 * h), 4.0))
    val out = Events.decayedSum(rows.toDF("u", "t", "v"), "u", "t", "v",
      halfLifeHours = 24.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == (2L, 15.0))
    assert(out(2L) == (1L, 4.0))
    // partition-stable: quantized contributions sum order-free
    val re = Events.decayedSum(rows.toDF("u", "t", "v").repartition(5),
      "u", "t", "v", 24.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(re == out)
  }

  test("sessionPaths: gap splits sessions, steps cap, counts collapse flows") {
    import spark.implicits._
    val m = 60L
    val rows = Seq(
      // user 1, session A: view > click > buy > extra (4th step dropped)
      (1L, ts(0), 1L, "view"), (1L, ts(5 * m), 2L, "click"),
      (1L, ts(10 * m), 3L, "buy"), (1L, ts(15 * m), 4L, "extra"),
      // user 1, session B (gap > 30 min): view > click > buy again
      (1L, ts(120 * m), 5L, "view"), (1L, ts(125 * m), 6L, "click"),
      (1L, ts(130 * m), 7L, "buy"),
      // user 2: lone view
      (2L, ts(0), 8L, "view"))
    val out = Events.sessionPaths(rows.toDF("u", "t", "id", "et"),
      "u", "t", "et", "id", gapMinutes = 30, maxSteps = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("view>click>buy" -> 2L, "view" -> 1L))
  }

  test("cohortRetention buckets by first-activity period") {
    import spark.implicits._
    val day = 86400L
    val rows = Seq(
      (1L, ts(0)), (1L, ts(7 * day)), (1L, ts(14 * day)), // cohort 0: offsets 0,1,2
      (2L, ts(7 * day)), (2L, ts(21 * day)),              // cohort 1: offsets 0,2
      (3L, ts(0)))                                        // cohort 0: offset 0 only
    val out = Events.cohortRetention(rows.toDF("u", "t"), "u", "t",
      periodDays = 7, maxOffset = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }
}
