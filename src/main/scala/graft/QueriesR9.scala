package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 battery additions.
  *
  * q_evolution_cascade — the evolution INGESTION-MODEL cascade end to
  * end: a YAML manifest is evolved (vertex rename + vertex-property
  * rename) through [[graft.evolve.ManifestEvolution]], whose pipeline
  * rewrites must keep the manifest RUNNABLE — the renamed property's
  * `from:`-map coverage means the raw doc columns still feed the renamed
  * vertex field, and edge steps repoint at the renamed type. The evolved
  * manifest re-ingests the real tables and the counts (plus the renamed
  * property's non-null count, which is exactly what a missed from-map
  * rewrite would zero out) replay in DuckDB.
  */
object GraftQueriesR9 {

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(

    "q_evolution_cascade" -> { (s, d) =>
      import graft.evolve._
      import graft.evolve.CascadeOp._
      val manifest =
        """schema:
          |    metadata:
          |        name: tpch-evolved
          |    graph:
          |        vertex_config:
          |            vertices:
          |            -   name: customer
          |                properties:
          |                -   c_name
          |                -   c_mktsegment
          |                identity:
          |                -   c_custkey
          |            -   name: orders
          |                properties:
          |                -   o_orderstatus
          |                identity:
          |                -   o_orderkey
          |        edge_config:
          |            edges:
          |            -   source: orders
          |                target: customer
          |                relation: placed_by
          |ingestion_model:
          |    resources:
          |    -   name: customer
          |        pipeline:
          |        -   vertex: customer
          |    -   name: orders
          |        pipeline:
          |        -   vertex: orders
          |        -   vertex: customer
          |            from:
          |                c_custkey: o_custkey
          |            mapped_only: true
          |            lookup_only: true
          |""".stripMargin
      val evolved = ManifestEvolution.evolveManifest(manifest, Seq(
        // property rename: the cascade must extend the customer resource's
        // vertex step with {segment: c_mktsegment} so the raw column still
        // feeds the renamed property
        RenameVertexProperties(Seq("customer" -> Seq("c_mktsegment" -> "segment"))),
        // vertex rename: pipeline vertex/edge steps repoint at `purchase`
        RenameVertices(Seq("orders" -> "purchase"))))
      val parts = evolved.resources.map(r =>
        graft.pipeline.PipelineCompiler.compile(evolved.schema, r, t(s, d)(r.name)))
      val g = parts.reduceLeft(_.unionWith(_))
      Seq(
        g.vertex("customer").agg(count(lit(1)).as("cnt"))
          .withColumn("coll", lit("customer")),
        g.vertex("customer").agg(count(col("segment")).as("cnt"))
          .withColumn("coll", lit("segment_nonnull")),
        g.vertex("purchase").agg(count(lit(1)).as("cnt"))
          .withColumn("coll", lit("purchase")),
        g.edge(graft.model.EdgeKey("purchase", "customer", "placed_by"))
          .agg(count(lit(1)).as("cnt")).withColumn("coll", lit("placed_by"))
      ).reduce(_.unionByName(_)).select("coll", "cnt").orderBy("coll")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_evolution_cascade" ->
      """SELECT 'customer' AS coll, count(*) AS cnt FROM customer
        |UNION ALL SELECT 'placed_by', count(DISTINCT o_orderkey) FROM orders
        |UNION ALL SELECT 'purchase', count(*) FROM orders
        |UNION ALL SELECT 'segment_nonnull', count(c_mktsegment) FROM customer
        |ORDER BY coll""".stripMargin
  )
}
