package graft.ext

import graft.SparkSpec

/** Dictionary phrase tagging: multi-word matches at any offset, overlap
  * counting, normalization, miss behavior.
  */
class DictTagSpec extends SparkSpec {

  import spark.implicits._

  test("multi-word phrases match at any offset with counts and first_pos") {
    val df = Seq(
      (1L, "the red fox and the red fox again"),
      (2L, "no matches here")).toDF("id", "text")
    val res = TextAnalysis.dictionaryTag(df, "id", "text",
      Seq("red fox", "again")).orderBy("id", "phrase").collect()
    assert(res.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, "again", 1L, 7L), (1L, "red fox", 2L, 1L)))
  }

  test("overlapping occurrences all count") {
    val df = Seq((1L, "a a a a")).toDF("id", "text")
    val res = TextAnalysis.dictionaryTag(df, "id", "text", Seq("a a")).collect()
    assert(res.head.getLong(2) == 3L) // positions 0, 1, 2
  }

  test("dictionary entries are normalized like the corpus") {
    val df = Seq((1L, "hello world")).toDF("id", "text")
    val res = TextAnalysis.dictionaryTag(df, "id", "text",
      Seq("  Hello   WORLD  ")).collect()
    assert(res.length == 1 && res.head.getString(1) == "hello world")
  }

  test("docs without matches produce no rows") {
    val df = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "text")
    assert(TextAnalysis.dictionaryTag(df, "id", "text", Seq("epsilon")).count() == 0)
  }
}
