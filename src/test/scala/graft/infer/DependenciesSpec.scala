package graft.infer

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** FD discovery (g3 measure) and inclusion-dependency discovery. */
class DependenciesSpec extends SparkSpec {

  test("functionalDeps: exact FD, almost-FD with g3, and non-FD") {
    import spark.implicits._
    // a→b holds; a→c broken on ONE row of a=1 (g3 = 1); b→a broken badly
    val df = Seq(
      (1, "x", "p"), (1, "x", "p"), (1, "x", "q"),
      (2, "y", "r"), (3, "x", "r"))
      .toDF("a", "b", "c")
    val out = Dependencies.functionalDeps(df,
      Seq(("a", "b"), ("a", "c"), ("b", "a")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

    val ab = out(("a", "b"))
    assert(ab.getAs[Boolean]("holds"))
    assert(ab.getAs[Long]("g3_violations") == 0L)
    assert(ab.getAs[Long]("distinct_lhs") == 3L)

    val ac = Dependencies.functionalDeps(df, Seq(("a", "c"))).collect().head
    assert(!ac.getAs[Boolean]("holds"))
    // a=1 has c∈{p,p,q}: majority 2, rows 3 → 1 violation
    assert(ac.getAs[Long]("g3_violations") == 1L)
    assert(ac.getAs[Long]("distinct_pairs") == 4L)

    val ba = out(("b", "a"))
    assert(!ba.getAs[Boolean]("holds"))
    // b=x maps to a∈{1,1,1,3}: majority 3 of 4 → 1 violation
    assert(ba.getAs[Long]("g3_violations") == 1L)
  }

  test("functionalDeps treats null as an ordinary value") {
    import spark.implicits._
    val df = Seq((Some(1), Some("x")), (None, Some("y")), (None, Some("y")))
      .toDF("a", "b")
    val r = Dependencies.functionalDeps(df, Seq(("a", "b"))).collect().head
    assert(r.getAs[Boolean]("holds")) // null→y is consistent
    assert(r.getAs[Long]("distinct_lhs") == 2L)
  }

  test("inclusionDep: full, partial, and null-excluded containment") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(5L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("p")
    val r = Dependencies.inclusionDep(child, "k", "c", parent, "p", "pt")
      .collect().head
    assert(r.getAs[String]("child") == "c.k")
    assert(r.getAs[Long]("child_distinct") == 3L) // 1, 2, 5 (null dropped)
    assert(r.getAs[Long]("contained") == 2L)      // 5 is missing
    assert(math.abs(r.getAs[Double]("containment") - 2.0 / 3) < 1e-6)
  }

  test("inclusionDeps unions labelled candidates") {
    import spark.implicits._
    val a = Seq(1L).toDF("x"); val b = Seq(1L, 2L).toDF("y")
    val out = Dependencies.inclusionDeps(Seq(
      (a, "x", "a", b, "y", "b"), (b, "y", "b", a, "x", "a")))
      .orderBy("child").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("containment") == 1.0)
    assert(out(1).getAs[Double]("containment") == 0.5)
  }
}
