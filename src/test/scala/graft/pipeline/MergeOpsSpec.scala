package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeOpsSpec extends SparkSpec {

  test("mergeDocBasis: later docs' present fields overwrite, absent keep earlier") {
    import spark.implicits._
    val df = Seq(
      ("k1", 1L, Some("a"), Some(10)),
      ("k1", 2L, None, Some(20)),        // name absent → keeps "a"; n overwritten
      ("k1", 3L, Some("c"), None),       // name overwritten → "c"; n keeps 20
      ("k2", 1L, Some("x"), None)
    ).toDF("id", "ord", "name", "n")
    val m = MergeOps.mergeDocBasis(df, Seq("id"), "ord")
      .collect().map(r => r.getString(0) -> (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(m("k1") == ("c", 20))
    assert(m("k2") == ("x", -1))
  }

  test("mergeDocBasis drops fully-unkeyed rows unless keepUnkeyed") {
    import spark.implicits._
    val df = Seq((Some("k"), 1L, "a"), (None, 2L, "b")).toDF("id", "ord", "v")
    assert(MergeOps.mergeDocBasis(df, Seq("id"), "ord").count() == 1)
    assert(MergeOps.mergeDocBasis(df, Seq("id"), "ord", keepUnkeyed = true).count() == 2)
  }

  test("attachKeyless folds keyless rows onto the nearest preceding keyed row") {
    import spark.implicits._
    val df = Seq(
      (100L, 1L, Some("k1"), "a"),
      (100L, 2L, None, "b"),   // attaches to k1
      (100L, 3L, Some("k2"), "c"),
      (100L, 4L, None, "d")    // attaches to k2
    ).toDF("doc", "ord", "key", "v")
    val out = MergeOps.attachKeyless(df, Seq("key"), "doc", "ord")
      .collect().map(r => r.getString(3) -> r.getString(2)).toMap
    assert(out == Map("a" -> "k1", "b" -> "k1", "c" -> "k2", "d" -> "k2"))
  }

  test("pickUnique is content distinct") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("i", "s")
    assert(MergeOps.pickUnique(df).count() == 2)
  }
}
