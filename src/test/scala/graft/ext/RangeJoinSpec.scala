package graft.ext

import graft.SparkSpec

/** Bucketized point-in-interval join: equals the nested-loop BETWEEN join,
  * including intervals spanning bucket boundaries and inclusive endpoints.
  */
class RangeJoinSpec extends SparkSpec {

  test("matches the naive BETWEEN join across bucket boundaries") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (2L, 10L), (3L, 99L), (4L, 100L), (5L, 250L))
      .toDF("pid", "p")
    val ivs = Seq((10L, 0L, 9L), (20L, 5L, 120L), (30L, 100L, 100L))
      .toDF("iid", "s", "e")
    val fast = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", bucketWidth = 16)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs,
      pts("p") >= ivs("s") && pts("p") <= ivs("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fast == naive)
    assert(fast == Set((1L, 10L), (1L, 20L), (2L, 20L), (3L, 20L),
      (4L, 20L), (4L, 30L)))
  }

  test("extra keys scope matches per key") {
    import spark.implicits._
    val pts = Seq(("a", 5L), ("b", 5L)).toDF("k", "p")
    val ivs = Seq(("a", 0L, 10L)).toDF("k", "s", "e")
    val out = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e", 4, Seq("k"))
    assert(out.select("k").collect().map(_.getString(0)).toSeq == Seq("a"))
  }
}
