package graft.infer

import graft.SparkSpec
import graft.model._

/** 3NF inference over information_schema-shaped frames (the live-JDBC
  * wiring, reference graflo/db/postgres/schema_inference.py:25-400) and the
  * banded fuzzy matcher.
  */
class InferenceSpec extends SparkSpec {

  test("fromInformationSchema: vertex tables, M:N edge table, properties") {
    import spark.implicits._
    val columns = Seq(
      ("users", "uid"), ("users", "name"),
      ("groups", "gid"), ("groups", "title"),
      ("membership", "uid"), ("membership", "gid"), ("membership", "since")
    ).toDF("table_name", "column_name")
    val keyUsage = Seq(
      ("users", "uid", "PRIMARY KEY", null),
      ("groups", "gid", "PRIMARY KEY", null),
      ("membership", "uid", "PRIMARY KEY", null),
      ("membership", "gid", "PRIMARY KEY", null),
      ("membership", "uid", "FOREIGN KEY", "users"),
      ("membership", "gid", "FOREIGN KEY", "groups")
    ).toDF("table_name", "column_name", "constraint_type", "foreign_table_name")
    val schema = RelationalInference.fromInformationSchema(columns, keyUsage)
    assert(schema.vertices.map(_.name) == Seq("groups", "users"))
    assert(schema.vertex("users").identity == Identity.Natural(Seq("uid")))
    val e = schema.edges.head
    assert(e.source == "users" && e.target == "groups" && e.relation == "membership")
    assert(e.properties.map(_.name) == Seq("since"))
  }

  test("fuzzyPairs finds nearby names via length-banded join, not all-pairs") {
    import spark.implicits._
    val df = Seq((1L, "IRAN"), (2L, "IRAQ"), (3L, "PERU"), (4L, "FRANCE"))
      .toDF("id", "name")
    val pairs = CrossResourceIdentity.fuzzyPairs(df, "id", "name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 1L))) // IRAN↔IRAQ only
  }
}
