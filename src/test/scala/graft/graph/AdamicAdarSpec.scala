package graft.graph

import graft.SparkSpec

/** Adamic–Adar link prediction: wedge scoring, adjacency exclusion,
  * degree capping.
  */
class AdamicAdarSpec extends SparkSpec {

  import spark.implicits._

  test("square graph: diagonals score 2/ln(2), adjacent pairs excluded") {
    // a-b-c-d-a: (a,c) share neighbors {b,d}, both deg 2
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("s", "d")
    val res = GraphAlgos.adamicAdar(e, "s", "d").collect()
    assert(res.length == 2) // (a,c) and (b,d) only
    val byPair = res.map(r => ((r.getString(0), r.getString(1)),
      (r.getLong(2), r.getDouble(3)))).toMap
    val expected = math.round(1e6 / math.log(2)) * 2 / 1e6
    assert(byPair(("a", "c")) == (2L, BigDecimal(expected)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(byPair(("b", "d"))._1 == 2L)
  }

  test("star hub: leaf pairs score 1/ln(deg hub)") {
    val e = Seq(("h", "x"), ("h", "y"), ("h", "z")).toDF("s", "d")
    val res = GraphAlgos.adamicAdar(e, "s", "d").collect()
    assert(res.length == 3)
    val exp = BigDecimal(math.round(1e6 / math.log(3)) / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res.forall(r => r.getLong(2) == 1L && r.getDouble(3) == exp))
  }

  test("hubs above maxDegree are not centers (their wedges are dropped)") {
    val e = (1 to 10).map(i => ("hub", s"leaf$i")).toDF("s", "d")
    val res = GraphAlgos.adamicAdar(e, "s", "d", maxDegree = 5)
    assert(res.count() == 0)
  }

  test("already-adjacent pairs never appear even with common neighbors") {
    // triangle a-b-c: every pair is adjacent, no output
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("s", "d")
    assert(GraphAlgos.adamicAdar(e, "s", "d").count() == 0)
  }

  test("topK truncates on the exact integer score with (a,b) tiebreak") {
    // two independent squares -> 4 equal-scored pairs; topK=2 keeps the
    // lexicographically smallest
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("p", "q"), ("q", "r"), ("r", "s"), ("s", "p")).toDF("s", "d")
    val res = GraphAlgos.adamicAdar(e, "s", "d", topK = 2).collect()
    assert(res.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "c"), ("b", "d")))
  }
}
