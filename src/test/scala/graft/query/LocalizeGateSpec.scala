package graft.query

import graft.SparkSpec
import graft.model._
import graft.expr.FilterExpr
import org.apache.spark.sql.DataFrame

/** Forced-branch parity for the BFS id-set localization gate
  * ([[GraphReader.DefaultLocalizeCap]]): the walk must produce IDENTICAL
  * results whether the frontier/visited sets collect to a LocalRelation
  * (plan-depth reset, the capped default) or stay distributed (the scale
  * path an uncapped 100× walk takes). `localizeCap = 0` forces the
  * distributed branch on any input — the same discipline as
  * [[graft.ext.DriverModelGateSpec]] for driver-model gates.
  */
class LocalizeGateSpec extends SparkSpec {

  private val schema = GraphSchema(
    vertices = Seq(
      VertexDef("u", Nil, Identity.Natural(Seq("id"))),
      VertexDef("v", Nil, Identity.Natural(Seq("id"))),
      VertexDef("w", Nil, Identity.Natural(Seq("id")))),
    edges = Seq(
      EdgeDef("u", "v", "uv"),
      EdgeDef("v", "w", "vw", directed = false),
      EdgeDef("w", "u", "wu")))

  // parquet-backed sources: the spec's plan assertion relies on a
  // LocalRelation/LocalTableScan appearing ONLY via the walk's localization
  // (local Seq-backed sources would be LocalTableScans themselves)
  private def viaParquet(df: DataFrame, name: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"localize_$name").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  // a 3-type fanout graph: u_i → v_{3i..3i+2}, v_j — w_{j%40}, w_k → u_{(7k)%60}
  private lazy val vs: Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "u" -> viaParquet((0 until 60).map(i => (s"u$i", i)).toDF("id", "n"), "u"),
      "v" -> viaParquet((0 until 180).map(i => (s"v$i", i)).toDF("id", "n"), "v"),
      "w" -> viaParquet((0 until 40).map(i => (s"w$i", i)).toDF("id", "n"), "w"))
  }
  private lazy val es: Map[EdgeKey, DataFrame] = {
    import spark.implicits._
    Map(
      EdgeKey("u", "v", "uv") -> viaParquet(
        (0 until 60).flatMap(i => (0 until 3).map(d => (s"u$i", s"v${3 * i + d}")))
          .toDF("src_id", "dst_id"), "uv"),
      EdgeKey("v", "w", "vw") -> viaParquet(
        (0 until 180).map(j => (s"v$j", s"w${j % 40}")).toDF("src_id", "dst_id"), "vw"),
      EdgeKey("w", "u", "wu") -> viaParquet(
        (0 until 40).map(k => (s"w$k", s"u${(7 * k) % 60}")).toDF("src_id", "dst_id"), "wu"))
  }

  // wide caps: the gate must be exercised by the WALK shape, not the lattice
  private val wide = QueryCaps(maxHops = 10, maxRows = 1000000,
    maxElements = 1000000, maxSeeds = 100, defaultEdgeLimit = 1000000,
    timeoutSeconds = 0)

  private def reader(localizeCap: Int) =
    new GraphReader(schema, vs(_), es.get(_), wide, localizeCap = localizeCap)

  private def outSignature(g: graft.graph.GraphOutput): (Map[String, Seq[String]], Map[String, Seq[String]]) = (
    g.vertices.map { case (t, df) =>
      t -> df.select("id").collect().map(_.getString(0)).sorted.toSeq },
    g.edges.map { case (k, df) =>
      k.toString -> df.select("src_id", "dst_id").collect()
        .map(r => r.getString(0) + ">" + r.getString(1)).sorted.toSeq })

  test("uncapped 3-hop walk: distributed branch is element-for-element identical") {
    val q = NeighborQuery("u", FilterExpr.eq("id", "u0"), hops = 3,
      edgeLimit = Some(Int.MaxValue)) // the uncapped-budget sentinel
    val local = reader(GraphReader.DefaultLocalizeCap).neighbors(q)
    val dist  = reader(0).neighbors(q)
    assert(outSignature(local) == outSignature(dist))
    // results are non-trivial: the walk reached all three types and the
    // third hop fanned v back out past the first hop's 3
    assert(local.vertices.keySet == Set("u", "v", "w"))
    assert(local.vertices("v").count() >= 15)
  }

  test("the gate changes the plan: localized hops carry a LocalTableScan, distributed do not") {
    // sources are parquet-backed, so a LocalTableScan in the cached result's
    // plan can only come from the walk's id-set localization
    val q = NeighborQuery("u", FilterExpr.eq("id", "u0"), hops = 2,
      edgeLimit = Some(Int.MaxValue))
    def planOf(cap: Int) = {
      val g = reader(cap).neighbors(q)
      g.vertices("v").queryExecution.optimizedPlan.toString
    }
    def hasLocal(p: String) = p.contains("LocalTableScan") || p.contains("LocalRelation")
    assert(hasLocal(planOf(GraphReader.DefaultLocalizeCap)))
    assert(!hasLocal(planOf(0)))
  }

  test("multi-seed traverse: distributed branch identical (per-seed budgets intact)") {
    val q = TraverseQuery(
      seeds = Seq("u" -> FilterExpr.eq("id", "u0"), "w" -> FilterExpr.eq("id", "w1")),
      hops = 2, edgeLimit = Some(Int.MaxValue))
    val local = reader(GraphReader.DefaultLocalizeCap).traverseQuery(q)
    val dist  = reader(0).traverseQuery(q)
    assert(outSignature(local) == outSignature(dist))
  }

  test("bounded edge budget: truncation point agrees across branches") {
    // a small budget forces the per-hop limit path; the deterministic
    // ordering inside the walk must make both branches truncate identically
    val q = NeighborQuery("u", FilterExpr.eq("id", "u3"), hops = 2,
      edgeLimit = Some(7))
    val local = reader(GraphReader.DefaultLocalizeCap).neighbors(q)
    val dist  = reader(0).neighbors(q)
    assert(outSignature(local) == outSignature(dist))
  }
}
