package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._

/** Bucketed store collections: versions written as bucketed external tables
  * make collection-side joins exchange-free (the scan's outputPartitioning
  * IS the bucket spec).
  */
class BucketedStoreSpec extends SparkSpec {

  private val schemaV = GraphSchema(Seq(
    VertexDef("c", Seq(FieldDef("name"), FieldDef("seg")),
      Identity.Natural(Seq("id")))))

  private def freshRoot(tag: String): String = {
    val f = new java.io.File(s"target/bucketed-store-$tag")
    def del(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(del)
      x.delete(): Unit
    }
    del(f); f.getAbsolutePath
  }

  test("bucketed upsert round-trips and stays idempotent") {
    import spark.implicits._
    val store = new GraphStore(freshRoot("a"), schemaV, spark, buckets = Some(4))
    val batch = (1L to 100L).map(i => (i, s"n$i", s"s${i % 5}")).toDF("id", "name", "seg")
    store.upsertVertices("c", batch)
    store.upsertVertices("c", batch) // idempotent merge
    val got = store.vertices("c")
    assert(got.count() == 100)
    assert(got.select(count_distinct(col("id"))).as[Long].head() == 100)
  }

  test("collection scan is bucketed and a keyed join skips its exchange") {
    import spark.implicits._
    val store = new GraphStore(freshRoot("b"), schemaV, spark, buckets = Some(4))
    store.upsertVertices("c",
      (1L to 1000L).map(i => (i, s"n$i", s"s${i % 5}")).toDF("id", "name", "seg"))
    val probe = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "x")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = store.vertices("c").join(probe, Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"expected bucketed scan in:\n$plan")
      // exactly ONE exchange: the probe side shuffles to the bucket
      // partitioning, the store side reads its buckets in place
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange, got $exchanges in:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("a fresh reader without the catalog entry falls back to parquet") {
    import spark.implicits._
    val root = freshRoot("c")
    val store = new GraphStore(root, schemaV, spark, buckets = Some(4))
    store.upsertVertices("c",
      (1L to 50L).map(i => (i, s"n$i", "s")).toDF("id", "name", "seg"))
    // an unbucketed handle on the same root reads the same files
    val plain = new GraphStore(root, schemaV, spark)
    assert(plain.vertices("c").count() == 50)
  }
}
