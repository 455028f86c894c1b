package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PSI distribution drift and Flesch readability. */
class PsiReadabilitySpec extends SparkSpec {

  test("psi: identical distributions score ~0, shifted ones score high") {
    import spark.implicits._
    val base = (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = (0 until 500).map(i => (i % 100).toDouble).toDF("v")
    val psiSame = Stats.psi(base, same, "v", nBins = 10)
      .select("psi_total").head().getDouble(0)
    assert(math.abs(psiSame) < 0.01, s"got $psiSame")

    // current mass concentrated in the top decile
    val shifted = (0 until 500).map(i => 90.0 + i % 10).toDF("v")
    val psiShift = Stats.psi(base, shifted, "v", nBins = 10)
      .select("psi_total").head().getDouble(0)
    assert(psiShift > 0.25, s"got $psiShift")
  }

  test("psi: empty bins stay finite and out-of-range values clamp") {
    import spark.implicits._
    val base = Seq(0.0, 1.0, 2.0, 3.0).toDF("v")
    val cur = Seq(-5.0, 99.0).toDF("v") // both outside baseline range
    val rows = Stats.psi(base, cur, "v", nBins = 4).orderBy("bin").collect()
    assert(rows.length == 4)
    assert(rows.forall(r => !r.getAs[Double]("contrib").isNaN))
    assert(rows.head.getAs[Long]("n_cur") == 1L) // -5 clamps to bin 0
    assert(rows.last.getAs[Long]("n_cur") == 1L) // 99 clamps to bin 3
  }

  test("readability: hand-computed Flesch on a known sentence") {
    import spark.implicits._
    // "the cat sat. it ran!" → 5 words, 2 sentences; vowel groups:
    // e, a, a, i, a → 5 syllables
    val df = Seq((1L, "the cat sat. it ran!")).toDF("id", "text")
    val r = df.select(TextAnalysis.readability(col("text")).as("r"))
      .select("r.*").head()
    assert(r.getAs[Long]("words") == 5L)
    assert(r.getAs[Long]("sentences") == 2L)
    assert(r.getAs[Long]("syllables") == 5L)
    val flesch = 206.835 - 1.015 * 5.0 / 2 - 84.6 * 5.0 / 5
    assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-3) // 3-dp rounded
    val fk = 0.39 * 5.0 / 2 + 11.8 * 5.0 / 5 - 15.59
    assert(math.abs(r.getAs[Double]("fk_grade") - fk) < 1e-3)
  }

  test("weightedMedian: lower-median with unequal masses") {
    import spark.implicits._
    // values 1 (w 1), 2 (w 1), 10 (w 5): total 7 → qualify when 2·cum ≥ 7:
    // v=1 cum=1 (2<7); v=2 cum=2 (4<7); v=10 cum=7 (14≥7) → median 10
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 10.0, 5L))
      .toDF("g", "v", "w")
    val r = Stats.weightedMedian(df, "g", "v", "w").collect().head
    assert(r.getAs[Double]("weighted_median") == 10.0)
    assert(r.getAs[Long]("total_weight") == 7L)
    // unweighted (equal weights) median of 1,2,3 is 2 (lower median)
    val eq = Seq(("h", 1.0, 1L), ("h", 2.0, 1L), ("h", 3.0, 1L))
      .toDF("g", "v", "w")
    assert(Stats.weightedMedian(eq, "g", "v", "w")
      .collect().head.getAs[Double]("weighted_median") == 2.0)
  }

  test("modePerGroup: ties resolve to the smallest value") {
    import spark.implicits._
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"))
      .toDF("g", "v")
    val r = Stats.modePerGroup(df, "g", "v").collect().head
    assert(r.getAs[String]("mode") == "a") // a and b tie at 2
    assert(r.getAs[Long]("n_mode") == 2L)
  }

  test("diffInDiff cancels level and trend, isolates the treatment effect") {
    import spark.implicits._
    // control: 10 -> 12 (+2 trend); treated: 20 -> 25 (+2 trend +3 effect)
    val rows =
      Seq.fill(5)((false, false, 10.0)) ++ Seq.fill(5)((false, true, 12.0)) ++
      Seq.fill(5)((true, false, 20.0)) ++ Seq.fill(5)((true, true, 25.0))
    val out = Stats.diffInDiff(rows.toDF("treated", "post", "v"),
      "treated", "post", "v").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Double]("did") == 3.0))
  }

  test("poissonBootstrapSE approximates sd/sqrt(n) on iid data") {
    import spark.implicits._
    // uniform 0..99: sd ~ 28.87, n = 2000 -> SE ~ 0.645
    val df = (0 until 2000).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v")
    val r = Stats.poissonBootstrapSE(df, "id", "v", b = 64).collect().head
    assert(r.getAs[Long]("n") == 2000L)
    assert(r.getAs[Long]("b_reps") == 64L)
    assert(r.getAs[Double]("mean_value") == 49.5)
    val se = r.getAs[Double]("bootstrap_se")
    assert(se > 0.3 && se < 1.2, s"got $se") // ~0.645 expected
  }

  test("bradleyTerry: dominant item rates highest, shut-out rates zero") {
    import spark.implicits._
    // a beats b 9:1, b beats c 9:1, a beats c 10:0
    val m = Seq(("a", "b", 9L, 1L), ("b", "c", 9L, 1L), ("a", "c", 10L, 0L))
      .toDF("item_a", "item_b", "wins_a", "wins_b")
    val out = Stats.bradleyTerry(m, rounds = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (ra, wa, na) = out("a"); val (rb, _, _) = out("b")
    val (rc, wc, _) = out("c")
    assert(wa == 19L && na == 20L)
    assert(ra > rb && rb > rc, s"ratings $ra $rb $rc")
    // transitive strength: a's rating far above c's
    assert(ra > 2 * rc)
    // an item that never wins rates exactly 0 under MM
    val m2 = Seq(("x", "y", 5L, 0L)).toDF("item_a", "item_b", "wins_a", "wins_b")
    val z = Stats.bradleyTerry(m2, rounds = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(z("y") == 0L && z("x") > 0L)
  }
}
