package graft

/** The `analyze` CLI subcommand: one-pass corpus health report. */
class CliAnalyzeSpec extends SparkSpec {

  test("analyze reports docs, tokens, langs, dup groups, and quantiles") {
    import spark.implicits._
    val sw = "the of and to in is it that for as"
    val rows = (0 until 20).map(i => (i.toLong, sw + s" body$i text words here")) ++
      Seq((100L, sw + " body3 text words here")) // exact dup of doc 3
    val in = freshDir("target/cli-analyze-in")
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli.Main.run(spark, List("analyze", in))
    }
    val json = out.toString.trim
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(json.contains("\"docs\": 21"))
    assert(json.contains("\"exact_dup_groups\": 1"))
    assert(json.contains("\"langs\""))
    assert(json.contains("\"token_quantiles\""))
    assert(json.contains("\"p50\""))
    // every doc is 14 tokens → all quantiles equal 14
    assert(json.contains("\"p50\": 14.0"))
  }
}
