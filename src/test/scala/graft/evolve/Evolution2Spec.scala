package graft.evolve

import graft.SparkSpec
import graft.model._
import graft.store.GraphStore

/** Round-2 evolution surface: merge-vertices (schema + store rewrite),
  * risk-classified diff, revision chain (reference ops.py:61-96,
  * migrate/risk.py, evolution/revision.py).
  */
class Evolution2Spec extends SparkSpec {
  import EvolutionOp._

  private val base = GraphSchema(
    vertices = Seq(
      VertexDef("person", Seq(FieldDef("name")), Identity.Natural(Seq("pid"))),
      VertexDef("robot", Seq(FieldDef("name"), FieldDef("model")),
        Identity.Natural(Seq("pid"))),
      VertexDef("city", Seq(FieldDef("cname")), Identity.Natural(Seq("cid")))),
    edges = Seq(
      EdgeDef("person", "city", "lives_in"),
      EdgeDef("robot", "city", "lives_in")))

  test("merge_vertices: schema merge with typed-beats-untyped property rules") {
    val s = Evolution(base, Seq(MergeVertices(Seq("robot"), "person")))
    assert(!s.vertexByName.contains("robot"))
    val p = s.vertex("person")
    assert(p.properties.map(_.name).toSet == Set("name", "model"))
    // both edges retarget onto person; duplicates allowed at schema level
    assert(s.edges.forall(e => e.source == "person"))
  }

  test("merge_vertices: typed beats untyped; conflicting types raise") {
    val a = GraphSchema(Seq(
      VertexDef("x", Seq(FieldDef("f")), Identity.Natural(Seq("id"))),
      VertexDef("y", Seq(FieldDef("f", Some(FieldType.IntT))), Identity.Natural(Seq("id")))))
    val merged = Evolution(a, Seq(MergeVertices(Seq("y"), "x")))
    assert(merged.vertex("x").properties.find(_.name == "f").get.ftype
      .contains(FieldType.IntT))
    val b = GraphSchema(Seq(
      VertexDef("x", Seq(FieldDef("f", Some(FieldType.StringT))), Identity.Natural(Seq("id"))),
      VertexDef("y", Seq(FieldDef("f", Some(FieldType.IntT))), Identity.Natural(Seq("id")))))
    intercept[IllegalArgumentException] {
      Evolution(b, Seq(MergeVertices(Seq("y"), "x")))
    }
  }

  test("merge_vertices: new self-relations are rejected unless allowed") {
    val s = GraphSchema(
      Seq(VertexDef("a", Nil, Identity.Natural(Seq("id"))),
        VertexDef("b", Nil, Identity.Natural(Seq("id")))),
      Seq(EdgeDef("a", "b", "r")))
    intercept[IllegalArgumentException] {
      Evolution(s, Seq(MergeVertices(Seq("b"), "a")))
    }
    val ok = Evolution(s, Seq(MergeVertices(Seq("b"), "a", allowSelfRelations = true)))
    assert(ok.edges.head.source == "a" && ok.edges.head.target == "a")
  }

  test("migrateStore merges collections and moves incident edge data") {
    import spark.implicits._
    val root = freshDir("target/evolve2-merge")
    val store = new GraphStore(root, base, spark)
    store.upsertVertices("person", Seq((1L, "ann")).toDF("pid", "name"))
    store.upsertVertices("robot", Seq((2L, "r2", "mk1")).toDF("pid", "name", "model"))
    store.upsertVertices("city", Seq((10L, "rome")).toDF("cid", "cname"))
    store.insertEdges(EdgeKey("person", "city", "lives_in"),
      Seq((1L, 10L)).toDF("src_pid", "dst_cid"))
    store.insertEdges(EdgeKey("robot", "city", "lives_in"),
      Seq((2L, 10L)).toDF("src_pid", "dst_cid"))
    Evolution.migrateStore(store, Seq(MergeVertices(Seq("robot"), "person")))
    assert(store.vertices("person").count() == 2)
    // robot's edge data moved to the person__lives_in__city collection
    val e = store.edges(EdgeKey("person", "city", "lives_in"))
    assert(e.select("src_pid").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("diffWithRisk classifies and reports backward compatibility") {
    val to = Evolution(base, Seq(
      AddVertex(VertexDef("country", Nil, Identity.Natural(Seq("code")))),
      AddProperty("person", FieldDef("email"))))
    val (report, compatible) = Evolution.diffWithRisk(base, to)
    assert(compatible) // additive only
    assert(report.forall(_._2 == Risk.Low))

    val destructive = Evolution(base, Seq(RemoveVertex("city")))
    val (report2, compatible2) = Evolution.diffWithRisk(base, destructive)
    assert(!compatible2)
    assert(report2.exists(_._2 == Risk.High))

    val rekey = Evolution(base, Seq(
      ReplaceIdentity("person", Identity.Hash(Seq("name")))))
    val (report3, _) = Evolution.diffWithRisk(base, rekey)
    assert(report3.exists(_._2 == Risk.Critical))
  }

  test("revision store: save/load round-trip over every op kind; downgrade") {
    import EvolutionOp._
    val key = EdgeKey("a", "b", "r")
    val allOps: Seq[EvolutionOp] = Seq(
      AddVertex(VertexDef("a", Seq(FieldDef("x", Some(FieldType.IntT))),
        Identity.Natural(Seq("id")),
        secondary = Seq(SecondaryIdentity("by_x", Seq("x"))))),
      AddVertex(VertexDef("b", Nil, Identity.Hash(Seq("h")))),
      AddVertex(VertexDef("c", Nil,
        Identity.Funnel(Seq(FunnelBranch("f1", Seq("p"), Seq("p"))), markBranch = true))),
      RenameVertex("c", "c2"),
      AddProperty("a", FieldDef("y", Some(FieldType.DoubleT))),
      RenameProperty("a", "y", "z"),
      SetFieldType("a", "z", FieldType.StringT),
      AddSecondaryIdentity("a", SecondaryIdentity("by_z", Seq("z"))),
      AddEdge(EdgeDef("a", "b", "r", properties = Seq(FieldDef("w")))),
      AddEdgeProperty(key, FieldDef("w2")),
      RenameEdgeProperty(key, "w2", "w3"),
      SetEdgeDirected(key, directed = false),
      InverseEdge(key, "r_inv"),
      RemoveEdgeProperty(key, "w3"),
      RemoveSecondaryIdentity("a", "by_z"),
      RemoveProperty("a", "z"),
      ReplaceIdentity("b", Identity.Blank),
      RenameRelation(key, "r2"),
      RetargetEdge(EdgeKey("a", "b", "r2"), "a", "c2"),
      MergeVertices(Seq("b"), "a", allowSelfRelations = true),
      RemoveVertex("c2"))
    // codec round-trips every op kind structurally
    allOps.foreach { op =>
      assert(RevisionStore.opFromJson(RevisionStore.opToJson(op)) == op, s"round-trip $op")
    }
    // chain persistence
    val root = "target/evolve2-revstore"
    val r1 = Revision.build(allOps.take(3), None, "init")
    val r2 = Revision.build(Seq(AddProperty("a", FieldDef("w"))), Some(r1.id))
    RevisionStore.save(root, RevisionChain(Seq(r2, r1)))
    val loaded = RevisionStore.load(root)
    assert(loaded.ordered.map(_.id) == Seq(r1.id, r2.id))
    assert(loaded.ordered.head.ops == allOps.take(3))
    // downgrade: undo r2 (invertible) back to r1
    val empty = GraphSchema(Nil, Nil)
    val atHead = loaded.upgrade(empty)
    assert(atHead.vertex("a").properties.exists(_.name == "w"))
    val back = loaded.downgradeTo(atHead, r1.id)
    assert(!back.vertex("a").properties.exists(_.name == "w"))
    // a destructive revision blocks downgrade
    val r3 = Revision.build(Seq(RemoveVertex("a")), Some(r2.id))
    val chain3 = loaded.withRevision(r3)
    intercept[IllegalStateException] {
      chain3.downgradeTo(chain3.upgrade(empty), r1.id)
    }
  }

  test("edge-property ops: add/rename/remove with store rewrites; directedness") {
    import spark.implicits._
    val root = freshDir("target/evolve2-edgeprops")
    val key = EdgeKey("person", "city", "lives_in")
    val s1 = Evolution(base, Seq(
      AddEdgeProperty(key, FieldDef("since")),
      SetEdgeDirected(key, directed = false)))
    val e1 = s1.edges.find(_.key == key).get
    assert(e1.properties.map(_.name).contains("since") && !e1.directed)

    val store = new GraphStore(root, base, spark)
    store.insertEdges(key, Seq((1L, 10L, 2020L)).toDF("src_pid", "dst_cid", "since"))
    Evolution.migrateStore(store, Seq(RenameEdgeProperty(key, "since", "from_year")))
    assert(store.edges(key).columns.contains("from_year"))
    Evolution.migrateStore(store, Seq(RemoveEdgeProperty(key, "from_year")))
    assert(!store.edges(key).columns.contains("from_year"))
  }

  test("revision chain: content ids, link order, upgrade to head or marker") {
    val r1 = Revision.build(Seq(AddVertex(VertexDef("a", Nil,
      Identity.Natural(Seq("id"))))), None, "init")
    val r2 = Revision.build(Seq(AddVertex(VertexDef("b", Nil,
      Identity.Natural(Seq("id"))))), Some(r1.id))
    val r3 = Revision.build(Seq(AddEdge(EdgeDef("a", "b", "r"))), Some(r2.id))
    // shuffled input still orders root→head
    val chain = RevisionChain(Seq(r3, r1, r2))
    assert(chain.ordered.map(_.id) == Seq(r1.id, r2.id, r3.id))
    val empty = GraphSchema(Nil, Nil)
    assert(chain.upgrade(empty).edges.size == 1)
    assert(chain.upgrade(empty, Some(r2.id)).vertices.size == 2)
    assert(chain.upgrade(empty, Some(r2.id)).edges.isEmpty)
    // deterministic ids: same ops + parent → same id
    assert(Revision.build(r2.ops, Some(r1.id)).id == r2.id)
    // fork detection
    val fork = Revision.build(Seq(RemoveVertex("a")), Some(r1.id))
    intercept[IllegalStateException] {
      RevisionChain(Seq(r1, r2, fork)).ordered
    }
  }
}
