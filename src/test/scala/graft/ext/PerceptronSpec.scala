package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch-perceptron classifier: integer update semantics, convergence on a
  * separable corpus, and scoring signs.
  */
class PerceptronSpec extends SparkSpec {

  import spark.implicits._

  test("round 1 from zero weights is the sum of y·x over ALL docs") {
    // every doc is misclassified at w=0 (y·0 <= 0), so after one round
    // w[bucket] = Σ y·count and bias (bucket −1) = Σ y
    val df = Seq((1L, "aa aa bb", true), (2L, "bb cc", false)).toDF("id", "text", "lab")
    val (w, r) = Corpus.perceptronTrain(df, "id", "text", "lab", dim = 8, rounds = 1)
    assert(r == 1)
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 8
    }
    // doc1 (+1): aa×2 bb×1 bias×1; doc2 (−1): bb×1 cc×1 bias×1 — built
    // via accumulation so md5-bucket collisions at dim=8 stay correct
    val expected = {
      val m = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      m(bucket("aa")) += 2; m(bucket("bb")) += 1; m(-1L) += 1
      m(bucket("bb")) -= 1; m(bucket("cc")) -= 1; m(-1L) -= 1
      m.toMap
    }
    expected.foreach { case (b, v) => assert(w.getOrElse(b, 0L) == v, s"bucket $b") }
  }

  test("separable two-vocabulary corpus converges and classifies perfectly") {
    val docs = (0L until 40L).map { i =>
      val pos = i % 2 == 1
      val toks = (0 until 10).map(j => if (pos) s"p${(i + j) % 5}" else s"n${(i + j) % 5}")
      (i, toks.mkString(" "), pos)
    }.toDF("id", "text", "lab")
    val (w, rounds) = Corpus.perceptronTrain(docs, "id", "text", "lab",
      dim = 64, rounds = 10)
    assert(rounds < 10, "should separate (and stop updating) well before 10 rounds")
    val scored = Corpus.perceptronScore(docs, "id", "text", "lab", w, dim = 64)
    assert(scored.where(col("y") =!= col("pred")).count() == 0)
  }

  test("training is invariant to input partitioning (integer sums commute)") {
    val docs = (0L until 30L).map { i =>
      (i, s"w${i % 7} w${i % 3} w${i % 5}", i % 3 == 0)
    }
    val one = Corpus.perceptronTrain(docs.toDF("id", "text", "lab").coalesce(1),
      "id", "text", "lab", dim = 16, rounds = 3)
    val many = Corpus.perceptronTrain(docs.toDF("id", "text", "lab").repartition(13),
      "id", "text", "lab", dim = 16, rounds = 3)
    assert(one == many)
  }

  test("docs with empty text are not scored (no evidence)") {
    val df = Seq((1L, "aa bb", true), (2L, "   ", false)).toDF("id", "text", "lab")
    val (w, _) = Corpus.perceptronTrain(df, "id", "text", "lab", dim = 8, rounds = 1)
    val scored = Corpus.perceptronScore(df, "id", "text", "lab", w, dim = 8)
    assert(scored.count() == 1)
  }
}
