package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The PPJoin contract: the prefix filter is LOSSLESS — for any corpus
  * and threshold, prefixJaccardPairs returns exactly the pairs an
  * exhaustive all-pairs token-Jaccard scan returns. (Offline cache has
  * no scalatest-scalacheck bridge; deterministic Gen sampling per the
  * PropertySpec convention.)
  */
class PrefixJoinPropertySpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private val docGen = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
  private val corpusGen = Gen.chooseNum(2, 12)
    .flatMap(n => Gen.listOfN(n, docGen))
    .map(_.zipWithIndex.map { case (txt, i) => (i.toLong, txt) })

  private def bruteForce(docs: Seq[(Long, String)], t: Double) = {
    def toks(s: String) =
      s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      a = toks(ta); b = toks(tb) if a.nonEmpty && b.nonEmpty
      j = a.intersect(b).size.toDouble / a.union(b).size if j >= t
    } yield (ia, ib)).toSet
  }

  test("prefix filter finds exactly the exhaustive pairs (random corpora)") {
    val thresholds = Seq(0.3, 0.5, 0.8, 1.0)
    samples(corpusGen, 20).zipWithIndex.foreach { case (docs, i) =>
      val t = thresholds(i % thresholds.length)
      val got = Dedup.prefixJaccardPairs(docs.toDF("id", "text"), "id", "text", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = bruteForce(docs, t)
      assert(got == want, s"t=$t docs=$docs got=$got want=$want")
    }
  }
}
