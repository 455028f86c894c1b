package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Margin-based bitext mining: mutuality, margin favoring isolated pairs,
  * and partition-order determinism of the quantized sums.
  */
class BitextSpec extends SparkSpec {

  import spark.implicits._

  // Two clean translation pairs far from everything else, plus a hub
  // vector close to many source vectors (high avg-NN cosine → its pairs
  // get a LOW margin even at high cosine — the point of margin scoring).
  private def sides = {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val src = Seq(
      (0L, v(1, 0, 0, 0)),
      (2L, v(0, 1, 0, 0)),
      (4L, v(0.9, 0.1, 0, 0)),
      (6L, v(0.8, 0.2, 0, 0))
    ).toDF("id", "vec")
    val tgt = Seq(
      (1L, v(0.99, 0.01, 0, 0)), // hub: near 0, 4 and 6
      (3L, v(0, 0.99, 0.01, 0)), // clean match for 2
      (5L, v(0, 0, 1, 0)),       // matches nothing well
      (7L, v(0.85, 0.15, 0, 0))
    ).toDF("id", "vec")
    (src, tgt)
  }

  test("mined pairs are mutual best-margin matches") {
    val (src, tgt) = sides
    val mined = Similarity.bitextMine(src, tgt, "id", "vec", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2↔3 is isolated and must always be mined
    assert(mined.contains((2L, 3L)))
    // mutuality: each src and each tgt appears at most once
    assert(mined.map(_._1).size == mined.size)
    assert(mined.map(_._2).size == mined.size)
    // every mined pair's endpoints pick each other — no pair may contain
    // an endpoint that also appears in another mined pair
    val margins = Similarity.bitextMine(src, tgt, "id", "vec", k = 2)
      .collect().map(_.getDouble(2))
    assert(margins.forall(m => !m.isNaN && m > 0))
  }

  test("result is identical across input partitionings") {
    val (src, tgt) = sides
    val r1 = Similarity.bitextMine(src.coalesce(1), tgt.coalesce(1),
      "id", "vec", k = 2).orderBy("src_id").collect().toSeq
    val r2 = Similarity.bitextMine(src.repartition(5), tgt.repartition(3),
      "id", "vec", k = 2).orderBy("src_id").collect().toSeq
    assert(r1 == r2)
  }

  test("k larger than the candidate side still mines (short top-k lists)") {
    val (src, tgt) = sides
    val mined = Similarity.bitextMine(src, tgt, "id", "vec", k = 10)
      .collect()
    assert(mined.nonEmpty)
    assert(mined.forall(r => r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1))
  }

  // The sf0.1→sf1 scale probe measured the exact cross-product at 12.8×
  // on 10× data (quadratic); past the measured pair gate, candidates come
  // from a sign-LSH bucket join instead. These pin the bucketed path's
  // contract: deterministic, same output schema, and high agreement with
  // the exact path on a structured corpus.
  private def clusteredSides(n: Int) = {
    def v(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    // n clean translation clusters: src i and tgt i share a direction
    // (tgt = src + small noise), so exact mining pairs them 1:1
    val rows = (0 until n).map { i =>
      val base = v(i.toLong)
      val noisy = base.zipWithIndex.map { case (x, d) =>
        x + ((i * 7 + d) % 5 - 2) * 0.01f }
      (i.toLong * 2, base, i.toLong * 2 + 1, noisy)
    }
    val src = rows.map(r => (r._1, r._2)).toDF("id", "vec")
    val tgt = rows.map(r => (r._3, r._4)).toDF("id", "vec")
    (src, tgt)
  }

  test("bucketed candidate path (past the pair gate): deterministic and " +
      "near-exact on clustered data") {
    val (src, tgt) = clusteredSides(120)
    val exact = Similarity.bitextMine(src, tgt, "id", "vec", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactPairLimit = 1 forces the LSH path on the same input
    val lsh1 = Similarity.bitextMine(src, tgt, "id", "vec", k = 4,
      exactPairLimit = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh2 = Similarity.bitextMine(src.repartition(7), tgt.repartition(3),
      "id", "vec", k = 4, exactPairLimit = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh1 == lsh2, "bucketed path must be partition-order deterministic")
    // recall: noise-pair clusters the exact path mines should survive the
    // bucket join (same direction ⇒ same sign pattern for almost all
    // planes; multiprobe covers near-boundary flips)
    val recalled = exact.count(lsh1)
    assert(recalled >= (exact.size * 0.8).toInt,
      s"bucketed path recalled $recalled of ${exact.size} exact pairs")
  }
}
