package graft.ext

import graft.SparkSpec

/** Integer power iteration and rich-club profiles. */
class SpectralSpec extends SparkSpec {

  test("powerIteration finds the dominant axis of anisotropic data") {
    import spark.implicits._
    // points stretched along dim 0 (variance ~100× the rest): the
    // dominant eigenvector must align with dim 0
    val rows = (0 until 200).map { i =>
      val t = (i - 100) / 100.0
      Tuple1(Array((10 * t).toFloat, (t / 2).toFloat, (-t / 3).toFloat,
        0.01f * (i % 7)))
    }
    val out = Stats.powerIteration(rows.toDF("embedding"), "embedding",
      dims = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val v0 = math.abs(out(0L).getAs[Long]("v_milli"))
    assert(v0 == 1000000L) // dominant component saturates the norm-free scale
    (1L to 3L).foreach(i =>
      assert(math.abs(out(i).getAs[Long]("v_milli")) < 100000L))
    // Rayleigh ≈ variance along dim 0 = E[(10t)²] ≈ 100/3
    val lambda = out(0L).getAs[Double]("lambda")
    assert(lambda > 25 && lambda < 40)
  }

  test("richClub: a clique of hubs plus pendant spokes") {
    import spark.implicits._
    // 4-clique (degree ≥ 3 each) + 2 pendants on node a (deg(a) = 5).
    // k = 2: rich = clique (pendants have deg 1) → phi = 6·2/(4·3) = 1.0
    // k = 4: rich = {a} alone → n_rich = 1 row (phi degenerate, e = 0)
    val clique = for { x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y } yield (x, y)
    val edges = clique ++ Seq(("a", "p1"), ("a", "p2"))
    val out = graft.graph.GraphAlgos.richClub(edges.toDF("s", "d"), "s", "d",
      ks = Seq(2, 4))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getAs[Long]("n_rich") == 4L)
    assert(out(2L).getAs[Long]("e_rich") == 6L)
    assert(out(2L).getAs[Double]("phi") == 1.0)
    assert(out(4L).getAs[Long]("n_rich") == 1L)
    assert(out(4L).getAs[Long]("e_rich") == 0L)
  }
}
