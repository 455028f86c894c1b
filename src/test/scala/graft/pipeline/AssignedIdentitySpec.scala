package graft.pipeline

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.functions._

/** Assigned identity mode (reference `assigned: true`,
  * identity_uuid.py:38-84): the UUID PK lives in a REAL doc field — a
  * present value is kept (and must be a UUID), only empty values mint.
  */
class AssignedIdentitySpec extends SparkSpec {

  private val uuidRe =
    "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$".r

  private def manifest = graft.manifest.ManifestLoader.fromYamlString(
    """schema:
      |    metadata:
      |        name: t
      |    graph:
      |        vertex_config:
      |            vertices:
      |            -   name: session
      |                properties: [sid, user]
      |                identity: [sid]
      |                assigned: true
      |        edge_config:
      |            edges: []
      |ingestion_model:
      |    resources:
      |    -   name: r
      |        pipeline:
      |        -   vertex: session
      |""".stripMargin)

  test("assigned: true parses to Assigned on identity_fields[0]") {
    assert(manifest.schema.vertexByName("session").identity ==
      Identity.Assigned("sid"))
    assert(manifest.schema.vertexByName("session").idColumns == Seq("sid"))
  }

  test("present UUIDs are kept; empty values mint deterministic UUIDs") {
    val spark0 = spark
    import spark0.implicits._
    val keep = "123e4567-e89b-42d3-a456-426614174000"
    val rows = Seq(
      (keep, "ann"),
      (null.asInstanceOf[String], "bob"),
      ("", "cyd")).toDF("sid", "user")
    val g = PipelineCompiler.compile(manifest.schema, manifest.resource("r"), rows)
    val out = g.vertex("session").select("sid", "user").collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(out("ann") == keep) // never overwritten
    assert(uuidRe.findFirstIn(out("bob")).isDefined, s"minted: ${out("bob")}")
    assert(uuidRe.findFirstIn(out("cyd")).isDefined)
    assert(out("bob") != out("cyd")) // distinct observations, distinct mints
    // deterministic: a second compile mints the same ids
    val g2 = PipelineCompiler.compile(manifest.schema, manifest.resource("r"), rows)
    val out2 = g2.vertex("session").select("sid", "user").collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(out == out2)
  }

  test("a present non-UUID value fails fast like the reference ValueError") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(("not-a-uuid", "eve")).toDF("sid", "user")
    val g = PipelineCompiler.compile(manifest.schema, manifest.resource("r"), rows)
    val ex = intercept[Exception](g.vertex("session").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("invalid UUID value")), msgs(ex).mkString("|"))
  }

  test("UUID-typed natural identity fields validate, never invent") {
    val spark0 = spark
    import spark0.implicits._
    val m2 = graft.manifest.ManifestLoader.fromYamlString(
      """schema:
        |    metadata:
        |        name: t
        |    graph:
        |        vertex_config:
        |            vertices:
        |            -   name: device
        |                properties:
        |                -   name: did
        |                    type: uuid
        |                -   owner
        |                identity: [did]
        |        edge_config:
        |            edges: []
        |ingestion_model:
        |    resources:
        |    -   name: r
        |        pipeline:
        |        -   vertex: device
        |""".stripMargin)
    val good = "123e4567-e89b-12d3-a456-426614174000"
    val ok = Seq((good, "ann"), (null.asInstanceOf[String], "bob"))
      .toDF("did", "owner")
    val g = PipelineCompiler.compile(m2.schema, m2.resource("r"), ok)
    val got = g.vertex("device").select("did", "owner").collect()
      .map(r => r.getString(1) -> Option(r.getString(0))).toMap
    assert(got("ann").contains(good))
    assert(got.get("bob").forall(_.isEmpty)) // empty passes through or drops unkeyed
    val bad = Seq(("oops", "cyd")).toDF("did", "owner")
    val g2 = PipelineCompiler.compile(m2.schema, m2.resource("r"), bad)
    val ex = intercept[Exception](g2.vertex("device").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("invalid UUID value")))
  }

  test("a missing assigned field mints for every row") {
    val spark0 = spark
    import spark0.implicits._
    val rows = Seq(Tuple1("ann"), Tuple1("bob")).toDF("user")
    val g = PipelineCompiler.compile(manifest.schema, manifest.resource("r"), rows)
    val sids = g.vertex("session").select("sid").collect().map(_.getString(0))
    assert(sids.length == 2 && sids.distinct.length == 2)
    assert(sids.forall(s => uuidRe.findFirstIn(s).isDefined))
  }
}
