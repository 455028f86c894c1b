package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Item-item CF neighbors and gaps-and-islands detection. */
class CfGapsSpec extends SparkSpec {

  test("itemNeighbors: cosine from co-occurrence, ranked per item") {
    import spark.implicits._
    // baskets: {A,B}, {A,B}, {A,C} → co(A,B)=2, co(A,C)=1;
    // n_A=3, n_B=2, n_C=1
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"),
      (3L, "C")).toDF("b", "i")
    val out = Association.itemNeighbors(df, "b", "i", k = 2)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("co") == 2L)
    assert(math.abs(ab.getAs[Double]("cos") - 2.0 / math.sqrt(6.0)) < 1e-6)
    assert(ab.getAs[Long]("rank") == 1L)
    // symmetric cosine, independent per-item ranking
    assert(out(("B", "A")).getAs[Double]("cos") == ab.getAs[Double]("cos"))
    assert(out(("A", "C")).getAs[Long]("rank") == 2L)
  }

  test("itemNeighbors: minPairSup prunes singleton co-occurrence") {
    import spark.implicits._
    val df = Seq((1L, "A"), (1L, "B")).toDF("b", "i")
    assert(Association.itemNeighbors(df, "b", "i", k = 5, minPairSup = 2)
      .count() == 0)
  }

  test("gapRanges finds maximal missing runs, ignores edges") {
    import spark.implicits._
    // present: 1,2,5,6,9 → gaps [3,4] and [7,8]; nothing before 1/after 9
    val df = Seq(1L, 2L, 5L, 6L, 9L).toDF("id")
    val out = Quality.gapRanges(df, "id").orderBy("gap_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 4L, 2L), (7L, 8L, 2L)))
  }

  test("gapRanges on a contiguous column is empty") {
    import spark.implicits._
    assert(Quality.gapRanges((1L to 50L).toDF("id"), "id").count() == 0)
  }

  test("centroidConfusion: separable labels classify to themselves") {
    import spark.implicits._
    // two well-separated clusters around orthogonal axes
    val rows =
      (0 until 10).map(i => (0, Array(1.0f, 0.01f * i))) ++
      (0 until 10).map(i => (1, Array(0.01f * i, 1.0f)))
    val out = Similarity.centroidConfusion(rows.toDF("label", "vec"),
      "label", "vec")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0, 0L)) == 10L)
    assert(out((1, 1L)) == 10L)
    assert(out.size == 2) // no off-diagonal mass
  }

  test("hyperBall: ball growth on a path graph matches exact reach") {
    import spark.implicits._
    import graft.graph.GraphAlgos
    // path a-b-c-d-e: balls r=1 have sizes 2,3,3,3,2 (sum 13);
    // r=2: 3,4,5,4,3 (sum 19); HLL at n<=5 runs linear counting -> near-exact
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val out = GraphAlgos.hyperBall(e, "src", "dst", rounds = 2)
      .orderBy("round").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(out.forall(_.getLong(1) == 5L))
    val reach = out.map(_.getDouble(2))
    // round 0 = every node sees itself
    assert(math.abs(reach(0) - 5.0) < 0.3)
    assert(math.abs(reach(1) - 13.0) < 1.0)
    assert(math.abs(reach(2) - 19.0) < 1.5)
    // monotone non-decreasing by construction (register max-merge)
    assert(reach(0) <= reach(1) && reach(1) <= reach(2))
  }
}
