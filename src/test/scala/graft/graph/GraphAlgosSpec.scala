package graft.graph

import graft.SparkSpec

/** Fixed-point PageRank. */
class GraphAlgosSpec extends SparkSpec {

  test("symmetric 2-cycle keeps equal ranks summing to ~scale") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a")).toDF("s", "t")
    val r = GraphAlgos.pageRankFixed(e, "s", "t", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == r("b"))
    // integer floors lose < 1 unit per division; total stays ≈ scale
    val total = r.values.sum
    assert(total > 999999990000L && total <= 1000000000000L, s"total=$total")
  }

  test("a hub pointed at by many spokes outranks the spokes") {
    import spark.implicits._
    val e = ((1 to 9).map(i => (s"spoke$i", "hub")) :+ (("hub", "spoke1")))
      .toDF("s", "t")
    val r = GraphAlgos.pageRankFixed(e, "s", "t", iterations = 6)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("hub") > r("spoke2") * 5)
    // spoke1 receives the hub's whole outflow — above the other spokes
    assert(r("spoke1") > r("spoke2"))
  }

  test("duplicate edges collapse (distinct) and reruns are identical") {
    import spark.implicits._
    val e1 = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "t")
    val e2 = e1.union(e1) // duplicates must not double mass flow
    val r1 = GraphAlgos.pageRankFixed(e1, "s", "t", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val r2 = GraphAlgos.pageRankFixed(e2, "s", "t", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1 == r2)
    // 3-cycle is symmetric: all equal
    assert(r1.values.toSet.size == 1)
  }
}
