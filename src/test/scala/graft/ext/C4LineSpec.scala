package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C4-style line-level cleaning (Raffel et al. 2020 §2.2). */
class C4LineSpec extends SparkSpec {

  private def clean(texts: String*) = {
    import spark.implicits._
    texts.toDF("t")
      .select(TextAnalysis.c4LineClean(col("t")).as("c"))
      .select("c.n_lines", "c.n_kept", "c.kept", "c.clean_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
  }

  test("line rules: terminal punctuation, min words, javascript taint") {
    val good = "this line has enough words here."
    val noPunct = "this line has enough words here"
    val short = "too short."
    val js = "enable javascript to view this content."
    val Array(r) = clean(Seq(good, noPunct, short, js).mkString("\n"))
    assert(r._1 == 4L && r._2 == 1L)
    assert(r._4 == good)
  }

  test("doc rules: min kept lines, brace, lorem ipsum") {
    val l = "a perfectly fine content line here."
    val enough = Seq(l, l, l).mkString("\n")
    val twoOnly = Seq(l, l).mkString("\n")
    val braced = enough + "\nfunction f() { return 1; }"
    val lorem = enough + "\nLorem Ipsum dolor sit amet consectetur."
    val got = clean(enough, twoOnly, braced, lorem)
    assert(got(0)._3, "three kept lines suffice")
    assert(!got(1)._3, "two kept lines fail the doc rule")
    assert(!got(2)._3, "a brace anywhere kills the doc")
    assert(!got(3)._3, "lorem ipsum (case-insensitive) kills the doc")
    // the lorem line itself also fails line-keep? no — it ends in '.', has
    // six words, no 'javascript': it IS kept as a line; only the DOC dies
    assert(got(3)._2 == 4L)
  }

  test("whitespace-tolerant: lines are trimmed before the rules") {
    val Array(r) = clean("   padded line with enough words.   \nnext line. ")
    assert(r._2 == 1L && r._4 == "padded line with enough words.")
  }
}
