package graft.evolve

import graft.SparkSpec
import graft.model._
import graft.store.{GraphStore, GraphMigration}
import java.nio.file.Files

class EvolutionSpec extends SparkSpec {
  import EvolutionOp._

  private val base = GraphSchema(
    vertices = Seq(
      VertexDef("person", Seq(FieldDef("name"), FieldDef("age")),
        Identity.Natural(Seq("pid"))),
      VertexDef("city", Seq(FieldDef("cname")), Identity.Natural(Seq("cid")))),
    edges = Seq(EdgeDef("person", "city", "lives_in")))

  test("vertex ops: add/remove (cascade)/rename rewrite edges") {
    val s1 = Evolution(base, Seq(RenameVertex("person", "human")))
    assert(s1.vertexByName.contains("human"))
    assert(s1.edges.head.source == "human")
    val s2 = Evolution(base, Seq(RemoveVertex("city")))
    assert(s2.edges.isEmpty) // cascade
    val s3 = Evolution(base, Seq(AddVertex(VertexDef("country", Nil, Identity.Blank))))
    assert(s3.vertices.size == 3)
  }

  test("property + identity ops") {
    val s = Evolution(base, Seq(
      AddProperty("person", FieldDef("email")),
      RemoveProperty("person", "age"),
      RenameProperty("person", "name", "full_name"),
      SetFieldType("person", "full_name", FieldType.StringT),
      ReplaceIdentity("person", Identity.Hash(Seq("full_name"))),
      AddSecondaryIdentity("person", SecondaryIdentity("by_email", Seq("email")))))
    val p = s.vertex("person")
    assert(p.properties.map(_.name) == Seq("full_name", "email"))
    assert(p.identity == Identity.Hash(Seq("full_name")))
    // replace_identity's default retire=demote turns the old NATURAL
    // identity into the retired_identity secondary (executed parity)
    assert(p.secondary.map(_.name) == Seq("retired_identity", "by_email"))
    assert(p.secondary.head.fields == Seq("pid"))
  }

  test("edge ops: rename relation, retarget, inverse") {
    val k = EdgeKey("person", "city", "lives_in")
    val s = Evolution(base, Seq(
      RenameRelation(k, "resides_in"),
      InverseEdge(EdgeKey("person", "city", "resides_in"), "home_of")))
    assert(s.edgeByKey.contains(EdgeKey("person", "city", "resides_in")))
    assert(s.edgeByKey.contains(EdgeKey("city", "person", "home_of")))
  }

  test("diff autogenerates the op chain between two schemas") {
    val target = Evolution(base, Seq(
      AddVertex(VertexDef("country", Nil, Identity.Blank)),
      AddProperty("person", FieldDef("email")),
      RemoveProperty("city", "cname"),
      ReplaceIdentity("person", Identity.Hash(Seq("name")))))
    val ops = Evolution.diff(base, target)
    assert(Evolution(base, ops).vertexByName.keySet == target.vertexByName.keySet)
    assert(Evolution(base, ops).vertex("person").identity == Identity.Hash(Seq("name")))
  }

  test("migrateStore rewrites data for rename/remove property and re-keys identity") {
    import spark.implicits._
    val store = new GraphStore(
      Files.createTempDirectory("graft-evo").toString, base, spark)
    store.upsertVertices("person",
      Seq((1L, "ann", 30L), (2L, "bob", 40L)).toDF("pid", "name", "age"))
    Evolution.migrateStore(store, Seq(
      RenameProperty("person", "name", "full_name"),
      RemoveProperty("person", "age")))
    val cols = store.vertices("person").columns.toSet
    assert(cols.contains("full_name") && !cols.contains("age") && !cols.contains("name"))
  }

  test("RenameProperty rewrites secondary identities and funnel branches too") {
    import EvolutionOp._
    val s0 = GraphSchema(Seq(VertexDef("p", Seq(FieldDef("email")),
      Identity.Funnel(Seq(FunnelBranch("b", Seq("email"), Seq("email")))),
      secondary = Seq(SecondaryIdentity("by_email", Seq("email"))))))
    val s1 = Evolution(s0, Seq(RenameProperty("p", "email", "mail")))
    assert(s1.vertex("p").secondary.head.fields == Seq("mail"))
    s1.vertex("p").identity match {
      case Identity.Funnel(bs, _) =>
        assert(bs.head.whenAllPresent == Seq("mail") && bs.head.digestFields == Seq("mail"))
      case other => fail(s"unexpected identity $other")
    }
  }

  test("migrateStore cascades identity-field renames into stored edges") {
    import spark.implicits._
    import EvolutionOp._
    val store = new GraphStore(
      Files.createTempDirectory("graft-evo-edge").toString, base, spark)
    store.upsertVertices("person", Seq((1L, "ann", 30L)).toDF("pid", "name", "age"))
    store.upsertVertices("city", Seq((7L, "rome")).toDF("cid", "cname"))
    store.insertEdges(EdgeKey("person", "city", "lives_in"),
      Seq((1L, 7L)).toDF("src_pid", "dst_cid"))
    Evolution.migrateStore(store, Seq(RenameProperty("person", "pid", "person_id")))
    val cols = store.edges(EdgeKey("person", "city", "lives_in")).columns.toSet
    assert(cols.contains("src_person_id") && !cols.contains("src_pid"))
  }

  test("ReplaceIdentity natural→hash re-keys vertices AND stored edges consistently") {
    import spark.implicits._
    import EvolutionOp._
    val store = new GraphStore(
      Files.createTempDirectory("graft-evo-rekey").toString, base, spark)
    store.upsertVertices("person", Seq((1L, "ann", 30L), (2L, "bob", 40L))
      .toDF("pid", "name", "age"))
    store.upsertVertices("city", Seq((7L, "rome")).toDF("cid", "cname"))
    store.insertEdges(EdgeKey("person", "city", "lives_in"),
      Seq((1L, 7L), (2L, 7L)).toDF("src_pid", "dst_cid"))
    Evolution.migrateStore(store, Seq(
      ReplaceIdentity("person", Identity.Hash(Seq("name")))))
    val v = store.vertices("person")
    assert(v.columns.contains("_id") && v.count() == 2)
    val e = store.edges(EdgeKey("person", "city", "lives_in"))
    assert(e.columns.toSet.contains("src__id") && !e.columns.contains("src_pid"))
    // edges reference ids that exist on the rewritten vertices
    val vids = v.select("_id").collect().map(_.getString(0)).toSet
    val eids = e.select("src__id").collect().map(_.getString(0)).toSet
    assert(eids.subsetOf(vids) && eids.size == 2)
  }

  test("ReplaceIdentity with overlapping old/new columns keeps the shared key intact") {
    import spark.implicits._
    import EvolutionOp._
    val store = new GraphStore(
      Files.createTempDirectory("graft-evo-overlap").toString, base, spark)
    store.upsertVertices("person", Seq((1L, "ann", 30L)).toDF("pid", "name", "age"))
    store.insertEdges(EdgeKey("person", "city", "lives_in"),
      Seq((1L, 7L)).toDF("src_pid", "dst_cid"))
    // old [pid] → new [pid, name]: pid is shared between identities
    Evolution.migrateStore(store, Seq(
      ReplaceIdentity("person", Identity.Natural(Seq("pid", "name")))))
    val v = store.vertices("person").collect().head
    assert(v.getAs[Long]("pid") == 1L && v.getAs[String]("name") == "ann")
    val e = store.edges(EdgeKey("person", "city", "lives_in")).collect().head
    assert(e.getAs[Long]("src_pid") == 1L && e.getAs[String]("src_name") == "ann")
  }

  test("blank synthetic ids differ across batches (salt) but are deterministic within one") {
    import spark.implicits._
    import graft.pipeline._
    val sch = GraphSchema(Seq(VertexDef("n", Seq(FieldDef("v")), Identity.Blank)))
    val res = ResourceDef("r", Seq(VertexStep("n")))
    val df = Seq("x", "y").toDF("v")
    def ids(salt: String) = PipelineCompiler.compile(sch, res, df, idSalt = salt)
      .vertex("n").select("_id").collect().map(_.getString(0)).toSet
    val b1 = ids("batch1"); val b1again = ids("batch1"); val b2 = ids("batch2")
    assert(b1 == b1again)           // deterministic
    assert((b1 & b2).isEmpty)       // no cross-batch collision
  }

  test("graph→graph migration copies all collections") {
    import spark.implicits._
    val src = new GraphStore(Files.createTempDirectory("graft-mig-src").toString, base, spark)
    val dst = new GraphStore(Files.createTempDirectory("graft-mig-dst").toString, base, spark)
    src.upsertVertices("person", Seq((1L, "ann", 30L)).toDF("pid", "name", "age"))
    src.upsertVertices("city", Seq((7L, "rome")).toDF("cid", "cname"))
    src.insertEdges(EdgeKey("person", "city", "lives_in"),
      Seq((1L, 7L)).toDF("src_pid", "dst_cid"))
    val counts = GraphMigration.migrate(src, dst)
    assert(counts == Map("vertices/person" -> 1L, "vertices/city" -> 1L,
      "edges/person__lives_in__city" -> 1L))
    assert(dst.vertices("city").count() == 1)
  }

  test("dry run executes the plan but mutates nothing") {
    import spark.implicits._
    val store = new GraphStore(Files.createTempDirectory("graft-dry").toString, base, spark)
    val g = graft.graph.GraphOutput(
      Map("person" -> Seq((1L, "ann", 30L)).toDF("pid", "name", "age")), Map.empty)
    store.write(g, dry = true)
    assert(store.readVertices("person").isEmpty)
    store.write(g, dry = false)
    assert(store.vertices("person").count() == 1)
  }
}
