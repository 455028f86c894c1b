package graft

import org.apache.spark.sql.functions._

/** The `drift` CLI subcommand: PSI gate between two snapshots. */
class CliDriftSpec extends SparkSpec {

  test("drift reports a stable verdict for matched snapshots") {
    import spark.implicits._
    val base = freshDir("target/cli-drift-base")
    val cur = freshDir("target/cli-drift-cur")
    (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
      .write.mode("overwrite").parquet(base)
    (0 until 400).map(i => (i % 100).toDouble).toDF("v")
      .write.mode("overwrite").parquet(cur)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli.Main.run(spark, List("drift", base, cur, "v"))
    }
    val json = out.toString.trim
    assert(json.contains("\"verdict\": \"stable\""))
    assert(json.contains("\"bins\": ["))
  }

  test("drift flags a shifted snapshot") {
    import spark.implicits._
    val base = freshDir("target/cli-drift-base2")
    val cur = freshDir("target/cli-drift-cur2")
    (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
      .write.mode("overwrite").parquet(base)
    (0 until 400).map(i => 95.0 + i % 5).toDF("v")
      .write.mode("overwrite").parquet(cur)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      cli.Main.run(spark, List("drift", base, cur, "v"))
    }
    assert(out.toString.contains("\"verdict\": \"shifted\""))
  }
}
