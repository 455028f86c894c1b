package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.graph.GraphAlgos

/** Property tests for the round-12/13 operator families: structural
  * invariants that must hold for ANY input, not just the battery fixture.
  * Plain seeded Gen sampling (no scalatest-scalacheck bridge offline).
  */
class Round12PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val smallGraph: Gen[List[(String, String)]] = for {
    n <- Gen.choose(2, 8)
    m <- Gen.choose(1, 14)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
    } yield (s"n$a", s"n$b"))
  } yield edges

  test("communityQuality: volumes sum to 2m and Q stays in [-1, 1]") {
    import spark.implicits._
    for (edges <- samples(smallGraph, 12)) {
      val clean = edges.filter { case (a, b) => a != b }.distinct
      if (clean.nonEmpty) {
        val df = clean.toDF("src", "dst")
        val nodes = clean.flatMap { case (a, b) => Seq(a, b) }.distinct
        val comm = nodes.map(nd =>
          (nd, if (nd.drop(1).toInt % 2 == 0) "even" else "odd"))
          .toDF("node", "community")
        val out = GraphAlgos.communityQuality(df, "src", "dst",
          comm, "node", "community").collect()
        val m = clean.map { case (a, b) =>
          if (a < b) (a, b) else (b, a)
        }.distinct.size
        assert(out.map(_.getAs[Long]("volume")).sum == 2L * m)
        val intra = out.map(_.getAs[Long]("intra_edges")).sum
        val cut = out.map(_.getAs[Long]("cut_edges")).sum
        assert(intra + cut / 2 == m && cut % 2 == 0)
        val q = out.head.getAs[Double]("modularity")
        assert(q >= -1.0 && q <= 1.0)
      }
    }
  }

  test("sccFixed: labels match the transitive-closure ground truth") {
    import spark.implicits._
    for (edges <- samples(smallGraph, 8)) {
      val clean = edges.filter { case (a, b) => a != b }.distinct
      if (clean.nonEmpty) {
        val out = GraphAlgos.sccFixed(clean.toDF("src", "dst"),
          "src", "dst", peelRounds = 8, propRounds = 7)
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        val nodes = clean.flatMap { case (a, b) => Seq(a, b) }.distinct
        assert(out.keySet == nodes.toSet)
        assert(out.values.forall(!_.startsWith("?")),
          s"unconverged labels in $out for edges $clean")
        val adj = clean.groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSet }
        def reach(src: String): Set[String] = {
          var seen = Set(src); var frontier = Set(src)
          while (frontier.nonEmpty) {
            val next = frontier.flatMap(f => adj.getOrElse(f, Set.empty)) -- seen
            seen ++= next; frontier = next
          }
          seen
        }
        val closure = nodes.map(nd => nd -> reach(nd)).toMap
        for (a <- nodes; b <- nodes if a != b) {
          val mutual = closure(a).contains(b) && closure(b).contains(a)
          assert((out(a) == out(b)) == mutual,
            s"SCC labels for ($a, $b) disagree with mutual=$mutual " +
              s"in $out for edges $clean")
        }
      }
    }
  }

  test("ksTest: D in [0,1], symmetric under group swap") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 20L)))
    for (rows <- samples(gen, 12)) {
      if (rows.exists(_._1 == "a") && rows.exists(_._1 == "b")) {
        val df = rows.toDF("g", "v")
        val r = Stats.ksTest(df, "g", "v", "a", "b").collect().head
        val d = r.getAs[Double]("d")
        assert(d >= 0.0 && d <= 1.0)
        val rSwap = Stats.ksTest(df, "g", "v", "b", "a").collect().head
        assert(rSwap.getAs[Long]("d_num") == r.getAs[Long]("d_num"))
        assert(rSwap.getAs[Double]("d") == d)
      }
    }
  }

  test("attMatched: without confounding, matching equals the naive diff") {
    import spark.implicits._
    for (k <- samples(Gen.choose(2L, 9L), 8)) {
      val rows = for {
        x <- 1L to k
        i <- 0 until 8
      } yield (i % 2 == 0, 10L * x + (if (i % 2 == 0) 5L else 0L), x)
      val r = Stats.attMatched(rows.toDF("t", "y", "x"), "t", "y", "x")
        .collect().head
      assert(r.getAs[Double]("att") == 5.0)
      assert(r.getAs[Double]("naive_diff") == 5.0)
    }
  }

  test("mutualInfo: MI is symmetric and bounded by min(H(A), H(B))") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 4)))
    for (rows <- samples(gen, 8)) {
      if (rows.nonEmpty) {
        val df = rows.map { case (x, y) => (s"a$x", s"b$y") }.toDF("a", "b")
        val r = Stats.mutualInfo(df, "a", "b").collect().head
        val rT = Stats.mutualInfo(
          df.select(col("b").as("a"), col("a").as("b")), "a", "b")
          .collect().head
        assert(math.abs(r.getAs[Double]("mi") - rT.getAs[Double]("mi")) < 1e-6)
        val bound = math.min(r.getAs[Double]("h_a"), r.getAs[Double]("h_b"))
        assert(r.getAs[Double]("mi") <= bound + 1e-6)
        assert(r.getAs[Double]("mi") >= -1e-6)
      }
    }
  }
}
