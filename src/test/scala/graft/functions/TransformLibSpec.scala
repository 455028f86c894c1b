package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransformLibSpec extends SparkSpec {

  test("parse_date_reference extracts the year, reference-exact") {
    import spark.implicits._
    // reference semantics (util/transform.py:210-278): YEAR out of comma
    // forms and leading digits; unparseable inputs pass through
    val cases = Seq(
      "1923, May 10" -> "1923",
      "1923, July" -> "1923",
      "1921, Sept" -> "1921",
      "1926, December 24th" -> "1926",
      "1935-36" -> "1935",
      "2020-01-05" -> "2020",
      "garbage" -> "garbage")
    val df = cases.map(_._1).toDF("d")
    val out = df.select(TransformLib.parseDateReference(col("d")).as("p"))
      .collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
  }

  test("parse_multi_item parses quoted kv-list strings into a typed map") {
    import spark.implicits._
    val df = Seq("""{'a': ['x','y'], 'b': ['z']}""").toDF("s")
    val m = df.select(TransformLib.parseMultiItem(col("s")).as("m"))
      .collect().head.getMap[String, scala.collection.Seq[String]](0)
    assert(m("a").toSeq == Seq("x", "y") && m("b").toSeq == Seq("z"))
  }

  test("renameColumns applies name fn with include/exclude + collision check") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("myVarOne", "myVarTwo", "keep")
    val out = TransformLib.renameColumns(df, TransformLib.camelToSnakeName,
      exclude = Seq("keep"))
    assert(out.columns.toSeq == Seq("my_var_one", "my_var_two", "keep"))
    intercept[IllegalArgumentException] {
      TransformLib.renameColumns(df, _ => "same")
    }
    assert(TransformLib.snakeToCamelName("my_var_one") == "myVarOne")
  }

  test("ibes transforms: date+time to ISO Z, analyst name split") {
    import spark.implicits._
    val df = Seq(("20200105", "9:30:00", "ARFSTROM      J")).toDF("d", "t", "a")
    val r = df.select(
      TransformLib.parseDateIbes(col("d"), col("t")).as("ts"),
      TransformLib.castIbesAnalyst(col("a")).as("an")).collect().head
    assert(r.getString(0) == "2020-01-05T9:30:00Z") // reference keeps the time AS GIVEN
    assert(r.getStruct(1).getAs[String]("last_name") == "ARFSTROM")
    assert(r.getStruct(1).getAs[String]("first_name") == "J")
    // reference doctest cases + quirks (util/transform.py:175-207)
    def cast(s: String) = {
      val row = Seq(s).toDF("a")
        .select(TransformLib.castIbesAnalyst(col("a")).as("an"))
        .collect().head.getStruct(0)
      (row.getAs[String]("last_name"), row.getAs[String]("first_name"))
    }
    assert(cast("ADKINS/NARRA") == ("ADKINS", "N"))
    assert(cast("VAN DEUSEN    P") == ("VAN", "D")) // second token, not last
    assert(cast("O'LEARY       G") == ("O'LEARY", "G")) // apostrophe is data
    assert(cast("/X/Y") == ("X", "Y")) // leading slash skips the empty head
    assert(cast("SOLO") == ("SOLO", ""))
  }

  test("splitKeepPart supports negative indices (Python parts[-1])") {
    import spark.implicits._
    val df = Seq("https://openalex.org/I220871436").toDF("id")
    val r = df.select(
      TransformLib.splitKeepPart(col("id"), "/", -1).as("last"),
      TransformLib.splitKeepPart(col("id"), "/", 0).as("first"),
      TransformLib.splitKeepPart(col("id"), "/", 2).as("third")).collect().head
    assert(r.getString(0) == "I220871436")
    assert(r.getString(1) == "https:")
    assert(r.getString(2) == "openalex.org")
  }

  test("manifest named transforms resolve via use with call-site overrides") {
    val m = graft.manifest.ManifestLoader.fromYamlString(
      """schema:
        |    metadata:
        |        name: use-demo
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: v
        |                properties:
        |                -   other_key
        |                identity:
        |                -   _key
        |ingestion_model:
        |    resources:
        |    -   name: r
        |        pipeline:
        |        -   transform:
        |                call:
        |                    use: keep_last
        |        -   transform:
        |                call:
        |                    use: keep_last
        |                    input:
        |                    -   other
        |                    output:
        |                    -   other_key
        |        -   vertex: v
        |    transforms:
        |    -   name: keep_last
        |        foo: split_keep_part
        |        module: graflo.util.transform
        |        params:
        |            sep: /
        |            keep: -1
        |        input:
        |        -   id
        |        output:
        |        -   _key
        |""".stripMargin)
    import spark.implicits._
    val df = Seq(("a/b/c", "x/y")).toDF("id", "other")
    val out = graft.pipeline.PipelineCompiler
      .compile(m.schema, m.resources.head, df)
      .vertex("v").collect().head
    assert(out.getAs[String]("_key") == "c")
    assert(out.getAs[String]("other_key") == "y") // call-site override
  }

  test("input_groups repeat the call per field group") {
    import spark.implicits._
    import graft.model._
    import graft.pipeline._
    val df = Seq(("2020-01-05", "2021-02-06", "k")).toDF("d1", "d2", "id")
    val schema = GraphSchema(Seq(VertexDef("v",
      Seq(FieldDef("y1"), FieldDef("y2")), Identity.Natural(Seq("id")))))
    val res = ResourceDef("r", Seq(
      TransformStep(strategy = "single",
        inline = Some(cs => year(to_date(cs.head)).cast("long")),
        inputGroups = Seq(Seq("d1"), Seq("d2")),
        outputGroups = Seq(Seq("y1"), Seq("y2"))),
      VertexStep("v")))
    val out = PipelineCompiler.compile(schema, res, df)
    val r = out.vertex("v").collect().head
    assert(r.getAs[Long]("y1") == 2020L && r.getAs[Long]("y2") == 2021L)
  }
}
