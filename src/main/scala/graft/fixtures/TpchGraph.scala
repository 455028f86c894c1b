package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.pipeline._
import graft.graph.GraphOutput

/** The driver-testdata graph manifest (FIXTURES.md §B): TPC-H-ish tables →
  * property graph. This is the engine's equivalent of the reference's YAML
  * manifests under test/config/schema/ — declared in Scala since the engine's
  * manifest plane is typed case classes.
  */
object TpchGraph {

  val schema: GraphSchema = GraphSchema(
    vertices = Seq(
      VertexDef("region", Seq(FieldDef("r_name")), Identity.Natural(Seq("r_regionkey"))),
      VertexDef("nation", Seq(FieldDef("n_name"), FieldDef("n_regionkey")),
        Identity.Natural(Seq("n_nationkey"))),
      VertexDef("customer",
        Seq(FieldDef("c_name"), FieldDef("c_nationkey"), FieldDef("c_acctbal"),
          FieldDef("c_mktsegment")),
        Identity.Natural(Seq("c_custkey")),
        secondary = Seq(SecondaryIdentity("by_name", Seq("c_name")),
          SecondaryIdentity("by_segment", Seq("c_mktsegment")))),
      VertexDef("supplier", Seq(FieldDef("s_name"), FieldDef("s_nationkey"),
        FieldDef("s_acctbal")), Identity.Natural(Seq("s_suppkey"))),
      VertexDef("part", Seq(FieldDef("p_name"), FieldDef("p_brand"), FieldDef("p_type"),
        FieldDef("p_size"), FieldDef("p_retailprice")), Identity.Natural(Seq("p_partkey"))),
      VertexDef("orders", Seq(FieldDef("o_custkey"), FieldDef("o_orderstatus"),
        FieldDef("o_totalprice"), FieldDef("o_orderdate"), FieldDef("o_orderpriority")),
        Identity.Natural(Seq("o_orderkey"))),
      // hash identity over the natural key (identity_digest.py:39-47 pattern)
      VertexDef("user", Seq(FieldDef("user_id")), Identity.Hash(Seq("user_id"))),
      VertexDef("event", Seq(FieldDef("event_type"), FieldDef("value"), FieldDef("user_id")),
        Identity.Natural(Seq("event_id")))
    ),
    edges = Seq(
      EdgeDef("nation", "region", "in_region"),
      EdgeDef("customer", "nation", "in_nation"),
      EdgeDef("supplier", "nation", "in_nation"),
      EdgeDef("orders", "customer", "placed_by"),
      EdgeDef("orders", "part", "contains",
        properties = Seq(FieldDef("l_quantity"), FieldDef("l_extendedprice"),
          FieldDef("l_discount")),
        identities = Seq("source", "target", "l_quantity", "l_extendedprice")),
      EdgeDef("part", "supplier", "supplied_by"),
      EdgeDef("event", "user", "by_user")
    )
  )

  /** `spark.read.parquet` re-lists the directory and re-reads the footer
    * schema on EVERY call (~90 ms measured warm at sf0.1) — across a
    * 374-query battery touching 1-3 tables each that is tens of seconds
    * of pure driver overhead (guide §6: cache file listing). Memoize the
    * RELATION (logical plan + file index) per (context, dir, table);
    * the data itself is still scanned from parquet on every action —
    * nothing about results or the timed compute is cached. Keyed by
    * applicationId like the fixture memos, so a stopped session's
    * DataFrames are never handed to a new one.
    */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), (SparkSession, DataFrame)]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // evict entries of stopped sessions — a long-lived JVM cycling
    // SparkSessions would otherwise pin every dead session's logical
    // plans forever. Cached dirs must be immutable for the session
    // lifetime (holds: the sf testdata is read-only).
    if (!relationCache.isEmpty)
      relationCache.entrySet.removeIf(e => e.getValue._1.sparkContext.isStopped)
    relationCache.computeIfAbsent(
      (spark.sparkContext.applicationId, dir, name),
      _ => (spark, spark.read.parquet(s"$dir/$name.parquet")))._2
  }

  /** Some testdata generations write events.ts as TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects; others write plain micros. Read
    * nanos as long and convert with integer division (double division would
    * lose precision above 2^53 ns); leave a real timestamp column alone.
    */
  def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, dir, "events"))
  }

  /** ts: nanos-as-long → micros timestamp; TIMESTAMP_NTZ (plain parquet
    * micros) → session-tz timestamp, so `unix_micros`/watermarks accept it
    * (sessions run UTC, so the wall-clock reading matches the oracle's
    * naive-timestamp epoch); already-TIMESTAMP → unchanged.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  // --- resources (actor pipelines) --------------------------------------

  /** region ← region.parquet */
  val regionResource: ResourceDef = ResourceDef("r_region", Seq(VertexStep("region")))

  /** nation + lookup-only region + inferred nation→region edge */
  val nationResource: ResourceDef = ResourceDef("r_nation", Seq(
    VertexStep("nation"),
    VertexStep("region", from = Map("r_regionkey" -> "n_regionkey"), lookupOnly = true)
  ))

  val customerResource: ResourceDef = ResourceDef("r_customer", Seq(
    VertexStep("customer"),
    VertexStep("nation", from = Map("n_nationkey" -> "c_nationkey"), lookupOnly = true)
  ))

  val supplierResource: ResourceDef = ResourceDef("r_supplier", Seq(
    VertexStep("supplier"),
    VertexStep("nation", from = Map("n_nationkey" -> "s_nationkey"), lookupOnly = true)
  ))

  val partResource: ResourceDef = ResourceDef("r_part", Seq(VertexStep("part")))

  val ordersResource: ResourceDef = ResourceDef("r_orders", Seq(
    VertexStep("orders"),
    VertexStep("customer", from = Map("c_custkey" -> "o_custkey"), lookupOnly = true)
  ))

  /** lineitem is a pure edge resource: lookup-only endpoint observations +
    * two explicit edge intents with weight properties.
    */
  val lineitemResource: ResourceDef = ResourceDef("r_lineitem", Seq(
    VertexStep("orders", from = Map("o_orderkey" -> "l_orderkey"), lookupOnly = true,
      extractionScope = "mapped_only"),
    VertexStep("part", from = Map("p_partkey" -> "l_partkey"), lookupOnly = true,
      extractionScope = "mapped_only"),
    VertexStep("supplier", from = Map("s_suppkey" -> "l_suppkey"), lookupOnly = true,
      extractionScope = "mapped_only"),
    EdgeStep(source = "orders", target = "part", relation = "contains",
      weightFields = Seq("l_quantity", "l_extendedprice", "l_discount")),
    EdgeStep(source = "part", target = "supplier", relation = "supplied_by")
  ), inferEdges = false)

  val eventsResource: ResourceDef = ResourceDef("r_events", Seq(
    VertexStep("event"),
    VertexStep("user", from = Map("user_id" -> "user_id"), extractionScope = "mapped_only")
  ))

  /** Ingest the full manifest at a scale dir into one GraphOutput — resources
    * run in declaration order (the reference's ordering barrier,
    * caster.py:520-531, realized as plain DataFrame unions since no DB
    * round-trip is needed).
    */
  def ingest(spark: SparkSession, dir: String): GraphOutput = {
    val parts = Seq(
      PipelineCompiler.compile(schema, regionResource, table(spark, dir, "region")),
      PipelineCompiler.compile(schema, nationResource, table(spark, dir, "nation")),
      PipelineCompiler.compile(schema, customerResource, table(spark, dir, "customer")),
      PipelineCompiler.compile(schema, supplierResource, table(spark, dir, "supplier")),
      PipelineCompiler.compile(schema, partResource, table(spark, dir, "part")),
      PipelineCompiler.compile(schema, ordersResource, table(spark, dir, "orders")),
      PipelineCompiler.compile(schema, lineitemResource, table(spark, dir, "lineitem")),
      PipelineCompiler.compile(schema, eventsResource, eventsTable(spark, dir))
    )
    parts.reduceLeft(_.unionWith(_))
  }
}
