package graft

/** The `fairness` CLI subcommand: model-governance gate with the
  * four-fifths selection-rate rule.
  */
class CliFairnessSpec extends SparkSpec {

  test("fairness emits per-group rates and the four-fifths verdict") {
    import spark.implicits._
    // group A selects 60%, group B 20% → 0.2 < 0.8·0.6 fails four-fifths
    val rows = Seq.fill(6)(("A", true, true)) ++ Seq.fill(4)(("A", false, false)) ++
      Seq.fill(2)(("B", true, true)) ++ Seq.fill(8)(("B", false, false))
    val in = freshDir("target/cli-fairness-in")
    rows.toDF("seg", "pred", "label").write.mode("overwrite").parquet(in)

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli.Main.run(spark, List("fairness", in, "seg", "pred", "label"))
    }
    val json = out.toString.trim
    assert(json.contains("\"four_fifths_pass\": false"))
    assert(json.contains("\"dp_gap\": 0.4"))
    assert(json.contains("\"group\": \"A\""))
    assert(json.contains("\"selection_rate\": 0.6"))
  }

  test("fairness passes the four-fifths rule on balanced selection") {
    import spark.implicits._
    val rows = Seq.fill(5)(("A", true, true)) ++ Seq.fill(5)(("A", false, false)) ++
      Seq.fill(5)(("B", true, false)) ++ Seq.fill(5)(("B", false, true))
    val in = freshDir("target/cli-fairness-in2")
    rows.toDF("seg", "pred", "label").write.mode("overwrite").parquet(in)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli.Main.run(spark, List("fairness", in, "seg", "pred", "label"))
    }
    assert(out.toString.contains("\"four_fifths_pass\": true"))
  }
}
