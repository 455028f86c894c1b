package graft.ext

import graft.SparkSpec

/** As-of join semantics: backward/forward, equal-ts tie matching, tolerance,
  * unmatched-left retention.
  */
class AsOfJoinSpec extends SparkSpec {

  test("backward: latest right <= left ts; equal ts matches; unmatched null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "lts", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"))
      .toDF("k", "rts", "payload")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .select("tag", "payload").as[(String, Option[String])].collect().toMap
    assert(out("a").contains("r10")) // equal ts matches
    assert(out("b").contains("r15"))
    assert(out("c").isEmpty)         // nothing at or before 5
    assert(out("d").isEmpty)         // other key
  }

  test("forward: earliest right >= left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 16L, "b")).toDF("k", "lts", "tag")
    val right = Seq((1L, 12L, "r12"), (1L, 15L, "r15")).toDF("k", "rts", "payload")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", direction = "forward")
      .select("tag", "payload").as[(String, Option[String])].collect().toMap
    assert(out("a").contains("r12"))
    assert(out("b").isEmpty)
  }

  test("tolerance nulls matches farther than the bound") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b")).toDF("k", "lts", "tag")
    val right = Seq((1L, 95L, "r95")).toDF("k", "rts", "payload")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts",
      tolerance = Some(10L))
      .select("tag", "payload").as[(String, Option[String])].collect().toMap
    assert(out("a").contains("r95"))  // |100-95| <= 10
    assert(out("b").isEmpty)          // |200-95| > 10
  }
}
