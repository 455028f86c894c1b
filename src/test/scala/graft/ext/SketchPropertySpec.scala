package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized invariants of the sketch/layout/curation operators —
  * properties that must hold for EVERY input, not just the worked
  * examples: HLL error bounds and duplication invariance, CMS
  * no-underestimate, span-dedup conservation, z-value invertibility.
  * (Offline cache has no scalatest-scalacheck bridge; deterministic Gen
  * sampling per the PropertySpec convention.)
  */
class SketchPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("HLL: relative error bounded and duplication-invariant (random n)") {
    import spark.implicits._
    samples(Gen.oneOf(1, 7, 50, 400, 2000), 5).zipWithIndex.foreach {
      case (n, salt) =>
        val df = (0 until n).map(i => s"s$salt-v$i").toDF("v")
          .withColumn("g", lit(1))
        val est = Sketch.hllCounts(df, Seq("g"), "v").collect()(0).getDouble(1)
        // m=256 → σ ≈ 6.5%; 5σ plus a small-n absolute floor
        assert(math.abs(est - n) <= math.max(5, 0.33 * n), s"n=$n est=$est")
        val dup = Sketch.hllCounts(df.union(df), Seq("g"), "v")
          .collect()(0).getDouble(1)
        assert(dup == est)
    }
  }

  test("CMS: point estimates never underestimate any key (random mix)") {
    import spark.implicits._
    samples(Gen.choose(1, 30), 4).zipWithIndex.foreach { case (kinds, salt) =>
      val rows = (0 until kinds).flatMap(k =>
        Seq.fill(k + 1)(s"s$salt-k$k")) // key k appears k+1 times
      val df = rows.toDF("k")
      val est = Sketch.cmsEstimate(df, "k", df.select("k").distinct(), "k")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (0 until kinds).foreach { k =>
        assert(est(s"s$salt-k$k") >= (k + 1).toLong, s"kind=$k")
      }
    }
  }

  test("spanDedup conservation: Σ n_kept == distinct span count") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    val textGen = Gen.listOfN(12, Gen.oneOf(words)).map(_.mkString(" "))
    samples(Gen.listOfN(8, textGen), 4).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val out = Corpus.spanDedup(df, "id", "text", spanWords = 3)
      val kept = out.agg(sum("n_kept")).collect()(0).getLong(0)
      // every distinct (case-folded) span is kept exactly once, corpus-wide
      val distinctSpans = df
        .select(explode(org.apache.spark.sql.functions.transform(
          sequence(lit(0),
            ceil(size(split(col("text"), " ")).cast("double") / 3).cast("int") - 1),
          i => lower(array_join(slice(split(col("text"), " "), i * 3 + 1, lit(3)), " "))))
          .as("s"))
        .distinct().count()
      assert(kept == distinctSpans, s"kept=$kept distinct=$distinctSpans")
    }
  }

  test("zValue: de-interleaving the z-value recovers both bins") {
    import spark.implicits._
    samples(Gen.zip(Gen.choose(2, 6), Gen.choose(0, 100)), 4).foreach {
      case (bits, salt) =>
        val n = 1 << bits
        // pin the corners so the data min/max match the closed form below
        val pts = ((0 until 40).map { i =>
          ((i * 31 + salt) % n, (i * 17 + salt) % n)
        } ++ Seq((0, 0), (n - 1, n - 1)))
          .distinct.map { case (x, y) => (x.toDouble * n, y.toDouble * n) }
          .toDF("x", "y")
        val rows = Layout.zValue(pts, Seq("x", "y"), bits).collect()
        rows.foreach { r =>
          val z = r.getAs[Long]("zvalue")
          val bx = (0 until bits).map(i => ((z >> (2 * i)) & 1L) << i).sum
          val by = (0 until bits).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
          val (mn, mx) = (0.0, (n - 1).toDouble * n)
          val expX = math.min((n - 1).toLong,
            math.floor((r.getAs[Double]("x") - mn) / (mx - mn) * n).toLong)
          val expY = math.min((n - 1).toLong,
            math.floor((r.getAs[Double]("y") - mn) / (mx - mn) * n).toLong)
          assert(bx == expX && by == expY, s"z=$z x=$bx/$expX y=$by/$expY")
        }
    }
  }
}
