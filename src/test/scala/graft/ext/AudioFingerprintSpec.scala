package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spectral audio fingerprint + near-dup pairs (WHT bands, gram Jaccard). */
class AudioFingerprintSpec extends SparkSpec {

  test("wht64 matches the popcount-parity definition") {
    val rnd = new scala.util.Random(7)
    val x = Array.fill(64)(rnd.nextInt(4000) - 2000L)
    val fast = Multimodal.wht64(x)
    for (k <- 0 until 64) {
      var s = 0L
      for (i <- 0 until 64)
        s += x(i) * (if (java.lang.Long.bitCount((i & k).toLong) % 2 == 0) 1 else -1)
      assert(fast(k) == s, s"coefficient $k")
    }
  }

  test("wht64 of a delta at 0 is flat; Parseval holds") {
    val d = new Array[Long](64); d(0) = 5
    assert(Multimodal.wht64(d).forall(_ == 5L))
    val rnd = new scala.util.Random(11)
    val x = Array.fill(64)(rnd.nextInt(200) - 100L)
    val c = Multimodal.wht64(x)
    assert(c.map(v => v * v).sum == 64L * x.map(v => v * v).sum)
  }

  test("identical audio under id folding yields Jaccard-1 pairs") {
    val spark0 = spark
    import spark0.implicits._
    val ids = (0L until 12L).toDF("doc_id")
    val wav = Multimodal.synthesizeWavTones(ids, "doc_id", n = 320,
      sampleRate = 8000, seedMod = 4) // ids i, i+4, i+8 share audio
    val pairs = Multimodal.audioNearDups(wav, "doc_id", "media",
      minJaccard = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = (for (a <- 0 until 12; b <- 0 until 12)
      yield (a.toLong, b.toLong))
      .filter { case (a, b) => a < b && a % 4 == b % 4 }.toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expect)
    assert(pairs.forall(_._3 == 1.0))
  }

  test("fingerprint grams are deterministic and windowed correctly") {
    val spark0 = spark
    import spark0.implicits._
    val ids = Seq(5L).toDF("doc_id")
    val wav = Multimodal.synthesizeWav(ids, "doc_id", n = 320, sampleRate = 8000)
    val rows = Multimodal.audioFingerprint(wav, "doc_id").collect()
    assert(rows.length == 6) // 9 windows -> 6 four-gram positions
    assert(rows.map(_.getLong(1)).sorted.toSeq == (0L to 5L))
    assert(rows.forall { r => val g = r.getLong(2); g >= 0 && g < 4096 })
    // a second run produces the identical gram sequence
    val again = Multimodal.audioFingerprint(wav, "doc_id").collect()
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(1), r.getLong(2))).toSet)
  }

  test("df-cap drops ubiquitous grams from candidacy") {
    val spark0 = spark
    import spark0.implicits._
    val ids = (0L until 6L).toDF("doc_id")
    val wav = Multimodal.synthesizeWavTones(ids, "doc_id", n = 320,
      sampleRate = 8000, seedMod = 2)
    // every gram appears in >=3 docs (two seed classes over 6 docs);
    // maxDf=1 kills all candidates
    val none = Multimodal.audioNearDups(wav, "doc_id", "media",
      minJaccard = 0.0, maxDf = 1).count()
    assert(none == 0)
  }
}
