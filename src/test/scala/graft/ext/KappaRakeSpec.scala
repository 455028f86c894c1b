package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cohen's kappa agreement and RAKE keyphrase extraction. */
class KappaRakeSpec extends SparkSpec {

  test("cohenKappa: perfect, chance-level, and null-excluded agreement") {
    import spark.implicits._
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val p = Stats.cohenKappa(perfect, "a", "b").collect().head
    assert(p.getAs[Double]("kappa") == 1.0)
    assert(p.getAs[Long]("n_obs") == 3L)

    // 2x2 example: marginals a = (30, 20), b = (25, 25) over n = 50 →
    // pe = (30·25 + 20·25)/2500 = 0.5; po = 35/50 = 0.7 → kappa = 0.4
    val rows = Seq.fill(20)(("p", "p")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("p", "n")) ++ Seq.fill(5)(("n", "p"))
    val k = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").collect().head
    assert(k.getAs[Double]("po") == 0.7)
    assert(math.abs(k.getAs[Double]("pe") - 0.5) < 1e-9)
    assert(math.abs(k.getAs[Double]("kappa") - 0.4) < 1e-6)

    val withNull = Seq((Some("x"), Some("x")), (None, Some("y"))).toDF("a", "b")
    assert(Stats.cohenKappa(withNull, "a", "b").collect()
      .head.getAs[Long]("n_obs") == 1L)
  }

  test("rakeKeyphrases: delimiters, scores, and top-k") {
    import spark.implicits._
    // stopword 'the' splits runs; "red widget" appears twice so its words
    // gain degree; phrase longer than maxLen is dropped
    val df = Seq(
      (1L, "red widget the red widget the blue bolt"),
      (2L, "one two three four five the tail"))
      .toDF("id", "text")
    val out = TextAnalysis.rakeKeyphrases(df, "id", "text",
      stopwords = Seq("the"), maxLen = 4, k = 3)
    val rows = out.collect()
    val d1 = rows.filter(_.getLong(0) == 1L)
    // doc 1 candidates: "red widget" (deduped) and "blue bolt"
    assert(d1.map(_.getAs[String]("phrase")).toSet == Set("red widget", "blue bolt"))
    // red: freq 2, deg 4 → 2.0; widget same → "red widget" scores 4.0;
    // "blue bolt" also 4.0 (freq-1 deg-2 words) — tie ranks by phrase asc
    val rw = d1.find(_.getAs[String]("phrase") == "red widget").get
    assert(rw.getAs[Double]("score") == 4.0)
    assert(rw.getAs[Long]("rank") == 2L)
    assert(d1.find(_.getAs[String]("phrase") == "blue bolt")
      .get.getAs[Long]("rank") == 1L)
    // doc 2: the 5-word run exceeds maxLen → only "tail" survives
    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getAs[String]("phrase")).toSeq == Seq("tail"))
  }

  test("rakeKeyphrases: all-stopword doc yields no candidates") {
    import spark.implicits._
    val df = Seq((1L, "the the the")).toDF("id", "text")
    assert(TextAnalysis.rakeKeyphrases(df, "id", "text",
      Seq("the"), 4, 3).count() == 0)
  }
}
