package graft.ext

import graft.SparkSpec

/** Hash-min connected components over near-dup pairs. */
class ComponentsSpec extends SparkSpec {

  test("chains collapse to min id; singletons keep their own id") {
    import spark.implicits._
    val nodes = (1L to 8L).toDF("id")
    // components: {1,2,3,4} (chain), {6,7}, singletons {5}, {8}
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (6L, 7L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, "id", pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))
  }

  test("long chain converges within diameter rounds") {
    import spark.implicits._
    val n = 30L
    val nodes = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, "id", pairs, "a", "b", maxIter = 40)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L))
  }
}
