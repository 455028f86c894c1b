package graft

import org.apache.spark.sql.functions._

/** The `tokenize` CLI subcommand: BPE training + merge-replay encode +
  * reproducible sharding survive end-to-end.
  */
class CliTokenizeSpec extends SparkSpec {

  test("tokenize trains merges, encodes the corpus, and shards the tokens") {
    import spark.implicits._
    val rows = (0 until 30).map(i => (i.toLong, "banana band bandana " * (i % 3 + 1)))
    val in = freshDir("target/cli-tok-in")
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = freshDir("target/cli-tok-out")

    cli.Main.run(spark, List("tokenize", in, out, "4"))

    val merges = spark.read.json(s"$out/merges")
    assert(merges.count() == 4)
    // 'an' dominates this corpus: it must be the first learned merge
    val first = merges.where(col("rank") === 1).collect().head
    assert(first.getAs[String]("a") == "a" && first.getAs[String]("b") == "n")
    val tokens = spark.read.parquet(s"$out/tokens")
    assert(tokens.count() == 30)
    assert(tokens.where(col("shard").between(0, 7)).count() == 30)
    // every doc's tokens reassemble to its normalized text
    val bad = tokens.select(col("doc_id"), array_join(col("tokens"), "").as("glued"))
      .join(rows.toDF("doc_id", "text"), Seq("doc_id"))
      .where(col("glued") =!=
        regexp_replace(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ", ""))
    assert(bad.count() == 0)
  }
}
