package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ExactSubstr dedup: overlapping-gram span detection, interval merge,
  * all-occurrence removal, offset invariance (the property spanDedup's
  * fixed windows lack).
  */
class ExactSubstrSpec extends SparkSpec {

  import spark.implicits._

  private val boiler = "one two three four five six"

  test("shared span is cut from ALL occurrences at arbitrary offsets") {
    val df = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon zeta")).toDF("id", "text")
    val res = Corpus.exactSubstrDedup(df, "id", "text", minLen = 6)
      .orderBy("id").collect()
    // the 6-word boilerplate appears at offset 2 in doc1 and offset 0 in
    // doc2 — both occurrences are marked and removed
    assert(res.map(_.getLong(2)).toSeq == Seq(6L, 6L)) // n_dup_tokens
    assert(res.map(_.getLong(3)).toSeq == Seq(1L, 1L)) // n_spans
    assert(res.map(_.getString(4)).toSeq ==
      Seq("alpha beta gamma", "delta epsilon zeta"))
  }

  test("overlapping duplicated grams merge into one maximal span") {
    // a 8-word duplicated run with minLen 6 yields 3 duplicated gram
    // starts (0,1,2 relative) that must merge into ONE span of 8 tokens
    val run = "a b c d e f g h"
    val df = Seq(
      (1L, s"$run x y z"),
      (2L, s"p q $run")).toDF("id", "text")
    val res = Corpus.exactSubstrDedup(df, "id", "text", minLen = 6)
      .orderBy("id").collect()
    assert(res.map(_.getLong(3)).toSeq == Seq(1L, 1L))
    assert(res.map(_.getLong(2)).toSeq == Seq(8L, 8L))
  }

  test("distinct texts with no shared minLen-gram are untouched") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("id", "text")
    val res = Corpus.exactSubstrDedup(df, "id", "text", minLen = 6)
      .orderBy("id").collect()
    assert(res.forall(_.getLong(2) == 0L))
    assert(res(0).getString(4) == "the quick brown fox jumps over the lazy dog")
  }

  test("identical docs are cut to empty (all occurrences removed)") {
    val text = "u v w x y z aa bb cc"
    val df = Seq((1L, text), (2L, text)).toDF("id", "text")
    val res = Corpus.exactSubstrDedup(df, "id", "text", minLen = 6)
      .orderBy("id").collect()
    assert(res.forall(_.getString(4) == ""))
    assert(res.forall(r => r.getLong(2) == r.getLong(1))) // all tokens dup
  }

  test("docs shorter than minLen produce no grams and survive whole") {
    val df = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("id", "text")
    val res = Corpus.exactSubstrDedup(df, "id", "text", minLen = 6)
      .orderBy("id").collect()
    assert(res.forall(_.getLong(2) == 0L))
    assert(res.forall(_.getString(4) == "tiny doc"))
  }

  test("two separate duplicated regions stay two spans") {
    val r1 = "a1 a2 a3 a4 a5 a6"
    val r2 = "b1 b2 b3 b4 b5 b6"
    val df = Seq(
      (1L, s"$r1 mid1 mid2 mid3 $r2"),
      (2L, s"$r1 other filler words $r2")).toDF("id", "text")
    val res = Corpus.exactSubstrDedup(df, "id", "text", minLen = 6)
      .orderBy("id").collect()
    assert(res.map(_.getLong(3)).toSeq == Seq(2L, 2L))
    assert(res(0).getString(4) == "mid1 mid2 mid3")
  }
}
