package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hot-cell salting in the eps-cell candidate join ([[Clustering.saltedCellSides]]):
  * a dense grid cell must spread its pair work over k² salted sub-buckets
  * with IDENTICAL results — the skew guard for dbscan/lof at a natural
  * density peak (round-7 verdict "What's wrong #1").
  */
class HotCellSaltSpec extends SparkSpec {

  private def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f)

  /** 600 points packed inside ONE eps cell (eps 50_000 q-units = 0.05 raw:
    * a 25×24 lattice at 0.002 spacing fits in [0, 0.048]²) plus a second
    * small blob and an isolated point in other cells.
    */
  private def pathological = {
    import spark.implicits._
    val dense = for { i <- 0 until 25; j <- 0 until 24 }
      yield ((i * 24 + j).toLong, v(0.002 * i, 0.002 * j))
    val blob = Seq((1000L, v(0.500, 0.500)), (1001L, v(0.503, 0.500)),
      (1002L, v(0.500, 0.503)), (1003L, v(0.503, 0.503)))
    val lone = Seq((2000L, v(0.900, 0.900)))
    (dense ++ blob ++ lone).toDF("vec_id", "embedding")
  }

  test("dbscanGrid: salted and unsalted paths produce identical clusters") {
    val df = pathological
    // threshold 100 forces k = ceil(600/100) = 6 on the dense cell;
    // Int.MaxValue can never salt (the pre-round-8 behavior)
    val salted = Clustering.dbscanGrid(df, "vec_id", "embedding",
        eps = 50000L, minPts = 4, hotCellThreshold = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val plain = Clustering.dbscanGrid(df, "vec_id", "embedding",
        eps = 50000L, minPts = 4, hotCellThreshold = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(salted.size == 605)
    // sanity on content: the dense lattice is one cluster of cores, the
    // 4-point blob is another, the lone point is noise
    assert(salted.count(_._2 == "noise") == 1)
    assert(salted.count(t => t._1 < 1000 && t._2 == "core") == 600)
  }

  test("lofGrid: salted and unsalted paths produce identical scores") {
    val df = pathological
    val salted = Clustering.lofGrid(df, "vec_id", "embedding",
        eps = 50000L, minNbrs = 3, hotCellThreshold = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Clustering.lofGrid(df, "vec_id", "embedding",
        eps = 50000L, minNbrs = 3, hotCellThreshold = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("hot cell pair work is bounded per salted bucket") {
    val df = pathological
    val pts = df.select(col("vec_id").as("id"),
      round(element_at(col("embedding"), 1).cast("double") * 1e6, 0)
        .cast("long").as("x"),
      round(element_at(col("embedding"), 2).cast("double") * 1e6, 0)
        .cast("long").as("y"))
    val (left, right) = Clustering.saltedCellSides(pts, eps = 50000L,
      hotCellThreshold = 100)
    val lc = left.groupBy("cx", "cy", "_sa", "_sb").agg(count(lit(1)).as("nl"))
    val rc = right.groupBy("cx", "cy", "_sa", "_sb").agg(count(lit(1)).as("nr"))
    val buckets = lc.join(rc, Seq("cx", "cy", "_sa", "_sb"))
      .select((col("nl") * col("nr")).as("pairs"))
      .agg(max("pairs").as("mx"), count(lit(1)).as("nbuckets"))
      .collect().head
    // unsalted, the dense cell is ONE bucket of 600×600 = 360_000 pair
    // probes; with k = 6 each of its ~36 sub-buckets holds ~100×100 —
    // allow 3× slack for hash unevenness, still 30× below the pathology
    assert(buckets.getLong(0) <= 3L * 100L * 100L,
      s"max bucket pair count ${buckets.getLong(0)} exceeds the salted bound")
    assert(buckets.getLong(1) >= 30L,
      s"expected the hot cell spread over >=30 buckets, got ${buckets.getLong(1)}")
    // the pair MULTISET is unchanged by salting: same candidates, once each
    val saltedPairs = Clustering.epsPairs(pts, 50000L, 100)
      .groupBy().agg(count(lit(1)), countDistinct(struct(col("ia"), col("ib"))))
      .collect().head
    assert(saltedPairs.getLong(0) == saltedPairs.getLong(1),
      "salting must not duplicate candidate pairs")
    val plainPairs = Clustering.epsPairs(pts, 50000L, Int.MaxValue).count()
    assert(saltedPairs.getLong(0) == plainPairs)
  }
}
