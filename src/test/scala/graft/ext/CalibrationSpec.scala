package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Isotonic calibration, HITS, and DP noisy counts. */
class CalibrationSpec extends SparkSpec {

  test("isotonicCalibration pools adjacent violators, keeps monotone runs") {
    import spark.implicits._
    // bins 1..4 with raw rates 0.2, 0.6, 0.4, 0.8 (10 rows each):
    // bins 2,3 violate → pooled to (6+4)/20 = 0.5; 1 and 4 untouched.
    val rows =
      (1 to 10).map(i => (1L, if (i <= 2) 1 else 0)) ++
      (1 to 10).map(i => (2L, if (i <= 6) 1 else 0)) ++
      (1 to 10).map(i => (3L, if (i <= 4) 1 else 0)) ++
      (1 to 10).map(i => (4L, if (i <= 8) 1 else 0))
    val out = Stats.isotonicCalibration(rows.toDF("score", "y"), "score", "y")
      .orderBy("score").collect()
    assert(out.map(_.getAs[Double]("p_iso")).toSeq == Seq(0.2, 0.5, 0.5, 0.8))
    assert(out.map(_.getAs[Double]("p_raw")).toSeq == Seq(0.2, 0.6, 0.4, 0.8))
    // monotone by construction
    val iso = out.map(_.getAs[Double]("p_iso"))
    assert(iso.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("isotonicCalibration on an already-monotone input is the identity") {
    import spark.implicits._
    val rows = for { b <- 1 to 5; i <- 1 to 10 } yield (b.toLong, if (i <= b) 1 else 0)
    val out = Stats.isotonicCalibration(rows.toDF("score", "y"), "score", "y")
      .orderBy("score").collect()
    assert(out.map(_.getAs[Double]("p_iso")).toSeq ==
      Seq(0.1, 0.2, 0.3, 0.4, 0.5))
  }

  test("hitsFixed: the heavier-cited authority wins; hubs follow") {
    import spark.implicits._
    // h1 → {a1, a2}, h2 → {a1}: a1 cited by both hubs → higher authority;
    // h1 endorses more total authority → higher hub score.
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1"))
    val out = graft.graph.GraphAlgos.hitsFixed(edges.toDF("s", "d"), "s", "d",
      iterations = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a1")._1 > out("a2")._1)         // authority ordering
    assert(out("h1")._2 > out("h2")._2)         // hub ordering
    assert(out("a1")._2 == 0L && out("h1")._1 == 0L) // bipartite: no cross mass
    // L1 normalization: each side sums to ~unit (floor-div slack < n)
    val authSum = out.values.map(_._1).sum
    assert(authSum > 1000000L - 4 && authSum <= 1000000L)
  }

  test("dpNoisyCounts: reproducible, non-negative, and scale-bounded") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("k" + (i % 3)).toString).toDF("k")
    val a = Privacy.dpNoisyCounts(df, "k", epsilonX10 = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Privacy.dpNoisyCounts(df, "k", epsilonX10 = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // seeded noise is reproducible
    // true counts: k0=333, k1=334, k2=333; ε=1 Laplace tail beyond ±40 has
    // p < 4e-18 per key — treat as impossible for md5-derived uniforms
    assert(a.values.forall(v => v > 290 && v < 380))
  }
}
