package graft.sources

import graft.SparkSpec
import graft.expr.FilterExpr
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

class SourcesSpec extends SparkSpec {

  test("file source sniffs csv / jsonl / parquet extensions") {
    val dir = Files.createTempDirectory("graft-src").toString
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    df.write.option("header", "true").csv(s"$dir/t.csv")
    df.write.json(s"$dir/t.jsonl")
    df.write.parquet(s"$dir/t.parquet")
    assert(FileSource.read(spark, s"$dir/t.csv").count() == 2)
    assert(FileSource.read(spark, s"$dir/t.jsonl").count() == 2)
    assert(FileSource.read(spark, s"$dir/t.parquet").count() == 2)
    assert(FileSource.read(spark, s"$dir/t.parquet", limit = Some(1)).count() == 1)
    intercept[IllegalArgumentException](FileSource.read(spark, s"$dir/t.xyz"))
    // multi-line (pretty-printed) json array — JsonChunker's shape
    Files.write(java.nio.file.Paths.get(dir, "t.json"),
      """[ {"id": 1, "s": "a"},
        |  {"id": 2, "s": "b"} ]""".stripMargin.getBytes)
    assert(FileSource.read(spark, s"$dir/t.json").count() == 2)
  }

  test("ColumnTimeFilter: half-open window with pandas-style interval") {
    import spark.implicits._
    val df = Seq(
      Timestamp.from(Instant.parse("2020-01-01T00:00:00Z")),
      Timestamp.from(Instant.parse("2020-01-05T00:00:00Z")),
      Timestamp.from(Instant.parse("2020-01-08T00:00:00Z"))).toDF("ts")
    val f = ColumnTimeFilter("ts",
      after = Some(Timestamp.from(Instant.parse("2020-01-01T00:00:00Z"))),
      interval = Some("7D"))
    assert(f(df).count() == 2) // 01-08 excluded (half-open), 01-01 included
    val ne = ColumnTimeFilter("ts",
      notEquals = Seq(Timestamp.from(Instant.parse("2020-01-05T00:00:00Z"))))
    assert(ne(df).count() == 2)
    intercept[IllegalArgumentException](
      ColumnTimeFilter("ts", after = Some(new Timestamp(0)), interval = Some("7X")).toColumn)
  }

  test("SelectSpec compiles base + joins + where + aliased projection") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "fk")
    val dim = Seq((10L, "x"), (20L, "y")).toDF("pk", "label")
    val out = SelectSpec(base, "b",
      joins = Seq(JoinClause(dim, "d", Seq(("fk", "pk")), "inner")),
      selectFields = Seq("b.id", "d.label AS lbl"),
      where = Some(FilterExpr.gt("id", 1))).compile
    assert(out.columns.toSeq == Seq("id", "lbl"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet == Set((2L, "y")))
  }

  test("left join keeps unmatched base rows") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 77L)).toDF("id", "fk")
    val dim = Seq((10L, "x")).toDF("pk", "label")
    val out = SelectSpec(base, "b",
      joins = Seq(JoinClause(dim, "d", Seq(("fk", "pk")), "left"))).compile
    assert(out.count() == 2)
  }

  test("in-memory source builds a typed DataFrame") {
    val df = InMemorySource.fromRows(spark, Seq("a", "b"),
      Seq(Seq(1, "x"), Seq(2, "y")))
    assert(df.schema("a").dataType.typeName == "long")
    assert(df.count() == 2)
  }
}
