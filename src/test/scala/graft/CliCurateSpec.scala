package graft

import org.apache.spark.sql.functions._

/** The `curate` CLI subcommand: the composed quality→dedup→split→shard
  * pipeline survives end-to-end and each stage removes what it should.
  */
class CliCurateSpec extends SparkSpec {

  test("curate filters, dedups, splits, and shards a corpus") {
    import spark.implicits._
    val sw = "the results of this and that have come up with more to show"
    // disjoint per-doc token ranges: the only cross-doc shingle overlap is
    // the shared stopword prefix (Jaccard ≈ 0.1, far below the 0.7 gate)
    def doc(i: Int, extra: String = "") =
      (sw + " " + (1 to 45).map(j => s"word${i * 50 + j}").mkString(" ") + extra)
    val rows =
      (0 until 40).map(i => (i.toLong, doc(i))) ++          // clean docs
      Seq((100L, doc(3)), (101L, doc(7))) ++                // exact dups of 3 and 7
      Seq((102L, doc(5) + " tail")) ++                      // near-dup of 5
      Seq((103L, "too short the of"))                       // fails word count
    val in = freshDir("target/cli-curate-in")
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = freshDir("target/cli-curate-out")

    cli.Main.run(spark, List("curate", in, out))

    val docs = spark.read.parquet(s"$out/docs")
    // rule filter drops the short doc; exact dedup drops the two copies
    // (smallest id survives); near-dup clustering collapses 5/102
    assert(docs.where(col("doc_id") === 103L).count() == 0)
    assert(docs.where(col("doc_id").isin(100L, 101L)).count() == 0)
    assert(docs.where(col("doc_id").isin(5L, 102L)).count() == 1)
    assert(docs.count() == 40, "40 clean docs; the near-dup pair (5, 102) collapsed to one")
    // split + shard columns present, exhaustive, and deterministic
    assert(docs.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    assert(docs.where(col("shard").between(0, 7)).count() == docs.count())
    val first = spark.read.parquet(s"$out/docs")
      .select("doc_id", "split", "shard").as[(Long, String, Long)].collect().toSet
    cli.Main.run(spark, List("curate", in, out))
    val rerun = spark.read.parquet(s"$out/docs")
      .select("doc_id", "split", "shard").as[(Long, String, Long)].collect().toSet
    assert(first == rerun, "curation output is deterministic across reruns")
  }

  test("curate --span-dedup rewrites docs to globally-first spans") {
    import spark.implicits._
    // the boilerplate span doubles as the Gopher required-stopword source
    val shared = "the boiler1 of boiler2 and boiler3 that boiler4 to boiler5"
    def tail(i: Int) = (1 to 40).map(j => s"w${i * 100 + j}").mkString(" ")
    // every doc opens with the same 10-word boilerplate span; only the
    // lowest id keeps it after span dedup at spanWords = 10
    val rows = (0 until 20).map(i => (i.toLong, shared + " " + tail(i)))
    val in = freshDir("target/cli-curate-span-in")
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val out = freshDir("target/cli-curate-span-out")

    cli.Main.run(spark, List("curate", in, out, "--span-dedup", "10"))

    val docs = spark.read.parquet(s"$out/docs")
    assert(docs.count() == 20, "span rewrite must not drop distinct docs")
    val withBoiler = docs.where(col("text").contains("boiler1")).count()
    assert(withBoiler == 1, s"exactly one doc keeps the boilerplate span, got $withBoiler")
    // the keeper is the smallest doc id (global first occurrence)
    assert(docs.where(col("text").contains("boiler1"))
      .select("doc_id").as[Long].collect().toSeq == Seq(0L))
  }
}
