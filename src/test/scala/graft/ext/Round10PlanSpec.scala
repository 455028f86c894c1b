package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Plan-shape assertions for this round's operators — the 100 TB
  * properties: candidate generation stays keyed, dimension/stat sides ride
  * broadcasts, and the one deliberate cross join (MaxSim's bounded query
  * token set) is a broadcast, never a shuffled cartesian.
  */
class Round10PlanSpec extends AnyFunSuite with SparkSpec {

  private def assertNoProduct(plan: String, clue: String): Unit = {
    assert(!plan.contains("CartesianProduct"),
      s"$clue planned a cartesian:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$clue planned a nested loop:\n${plan.take(1500)}")
  }

  test("Geo.proximityJoin: grid-cell equi-join, no product") {
    import spark.implicits._
    val l = (0L until 80L).map(i => (i, (i % 9).toDouble, (i % 7).toDouble))
      .toDF("lid", "lat", "lon")
    val r = (0L until 60L).map(i => (i, (i % 8).toDouble, (i % 5).toDouble))
      .toDF("rid", "rlat", "rlon")
    val plan = Geo.proximityJoin(l, r, "lat", "lon", "rlat", "rlon", 500000L)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "proximityJoin")
  }

  test("temporalReachability: keyed relaxation join, no product") {
    import spark.implicits._
    val edges = (0L until 100L).map(i => (s"n${i % 20}", s"n${(i * 7) % 20}", i))
      .toDF("src", "dst", "t")
    val plan = graft.graph.GraphAlgos.temporalReachability(
      edges, "src", "dst", "t", "n0", 0L, maxHops = 2)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "temporalReachability")
  }

  test("Quality.check: the FK rule is a broadcast anti-join") {
    import spark.implicits._
    import graft.ext.Quality._
    val facts = (0L until 100L).map(i => Tuple1(i % 20)).toDF("k")
    val dim = (0L until 10L).map(Tuple1(_)).toDF("dk")
    val plan = Quality.check(facts, Seq(ForeignKey(Seq("k"), dim, Seq("dk"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"FK rule should be a broadcast anti-join:\n${plan.take(1500)}")
  }

  test("linearAttribution: per-user keyed join, no product") {
    import spark.implicits._
    val df = (0L until 200L).map { i =>
      (i % 20, i, i * 1000000L, if (i % 5 == 0) "buy" else "view", 1.0)
    }.toDF("u", "id", "us", "ty", "v")
      .withColumn("t", timestamp_micros(col("us")))
    val plan = Events.linearAttribution(df, "u", "t", "ty", "v", "id",
      Seq("view"), "buy", lookbackHours = 1L)
      .queryExecution.executedPlan.toString
    assertNoProduct(plan, "linearAttribution")
  }

  test("chiSquare: marginals ride broadcasts, no shuffled cartesian") {
    import spark.implicits._
    val df = (0 until 300).map(i => (s"a${i % 5}", s"b${i % 7}")).toDF("x", "y")
    val plan = Stats.chiSquare(df, "x", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"chiSquare planned a cartesian:\n${plan.take(1500)}")
  }

  test("kAnonymityProfile is a single aggregate chain (no join at all)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 10, i % 3, i)).toDF("q1", "q2", "sens")
    val plan = Privacy.kAnonymityProfile(df, Seq("q1", "q2"), "sens", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"kAnonymityProfile should not join:\n${plan.take(1500)}")
  }
}
