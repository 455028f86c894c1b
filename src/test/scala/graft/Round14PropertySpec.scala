package graft

import org.apache.spark.sql.functions._

/** Property tests for this round's new primitives: the bounded
  * distinct-min-k aggregate vs a direct model, the decimal half-up
  * quantizer vs exact BigInt arithmetic at double-unsafe magnitudes, and
  * the walk kernels' duplicate-edge insensitivity.
  */
class Round14PropertySpec extends SparkSpec {

  test("BoundedMinK equals distinct-sort-take for random data with heavy dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small value alphabet → many duplicates, the case the set-buffer owns
    val rows = (1 to 500).map { _ =>
      (s"g${rnd.nextInt(5)}", f"v${rnd.nextInt(40)}%03d")
    }
    val df = rows.toDF("g", "v").repartition(9)
    for (k <- Seq(1, 4, 25, 100)) {
      val got = df.groupBy("g")
        .agg(graft.expr.BoundedMinK.minKDistinct(k, col("v")).as("mk"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).distinct.sorted.take(k)
      }
      assert(got == want, s"k=$k")
    }
  }

  test("BoundedMinK ignores nulls and handles fewer-than-k groups") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", null), ("a", "x"), ("b", null))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(graft.expr.BoundedMinK.minKDistinct(5, col("v")).as("mk"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got == Map("a" -> List("x"), "b" -> Nil))
  }

  test("halfUpQ4 matches exact BigInt half-up past the double-exact range") {
    import spark.implicits._
    // numerators around 2^60: num*20000 would be off-by-ulp in IEEE
    val rnd = new scala.util.Random(13)
    val cases = (1 to 50).map { _ =>
      val num = (math.abs(rnd.nextLong()) % (1L << 60)) + (1L << 53)
      val den = (math.abs(rnd.nextLong()) % (1L << 55)) + 1L
      (num, den)
    }
    val got = cases.toDF("num", "den")
      .select(graft.ext.Stats.halfUpQ4(col("num"), col("den")).as("q"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (num, den) =>
      val a = BigInt(num) * 20000 + BigInt(den)
      val b = BigInt(den) * 2
      (a / b).toLong // both positive → BigInt / is floor division
    }
    assert(got.toSeq == want)
  }

  test("randomWalks and biasedWalks are duplicate-edge insensitive") {
    import spark.implicits._
    import graft.graph.GraphAlgos
    val rnd = new scala.util.Random(3)
    val base = (1 to 120).map { _ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}")
    }
    val dup = base ++ base ++ base.take(60) // heavy multiplicity
    val e1 = base.toDF("src", "dst").repartition(5)
    val e3 = dup.toDF("src", "dst").repartition(7)
    def run(e: org.apache.spark.sql.DataFrame) =
      GraphAlgos.randomWalks(e, "src", "dst", seeds = Seq("n0", "n5"),
        steps = 3, walksPerSeed = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(run(e1) == run(e3))
    def runB(e: org.apache.spark.sql.DataFrame) =
      GraphAlgos.biasedWalks(e, "src", "dst", seeds = Seq("n0", "n5"),
        steps = 3, pReturn = 2.0, qOut = 0.5, walksPerSeed = 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(runB(e1) == runB(e3))
  }
}
