package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{GraphSchema, Identity, VertexDef}
import graft.store.GraphStore

/** Rendezvous-routing invariants and store time travel. */
class RoutingAndTimeTravelSpec extends SparkSpec {

  import spark.implicits._

  test("rendezvous: adding a shard moves only a small fraction of keys") {
    val keys = (0L until 2000L).toDF("k")
    val before = keys.select(col("k"),
      Layout.rendezvousShard(col("k"), Seq("a", "b", "c", "d")).as("s"))
      .as[(Long, String)].collect().toMap
    val after = keys.select(col("k"),
      Layout.rendezvousShard(col("k"), Seq("a", "b", "c", "d", "e")).as("s"))
      .as[(Long, String)].collect().toMap
    val moved = before.count { case (k, s) => after(k) != s }
    // theoretical expectation: 1/5 of keys move to the new shard; modulo
    // routing would move ~4/5. Allow sampling slack around 400.
    assert(moved > 250 && moved < 550, s"moved $moved of 2000")
    // every moved key went TO the new shard (HRW property)
    assert(before.forall { case (k, s) => after(k) == s || after(k) == "e" })
    // balance: each shard gets a reasonable share
    val byShard = after.values.groupBy(identity).view.mapValues(_.size)
    assert(byShard.values.forall(n => n > 250 && n < 550), byShard.toMap.toString)
  }

  test("store time travel reads retained versions; vacuum trims them") {
    val root = Files.createTempDirectory("graft-tt").toString
    val schema = GraphSchema(Seq(
      VertexDef("item", identity = Identity.Natural(Seq("id")))))
    val store = new GraphStore(root, schema, spark)
    store.upsertVertices("item", Seq((1L, "x")).toDF("id", "v"))
    store.upsertVertices("item", Seq((1L, "y"), (2L, "z")).toDF("id", "v"))
    assert(store.vertexVersions("item") == Seq(0, 1))
    // v0 is the first write; current resolves to v1's merged state
    assert(store.verticesAt("item", 0).select("id", "v")
      .as[(Long, String)].collect().toSeq == Seq((1L, "x")))
    val cur = store.vertices("item").select("id", "v")
      .as[(Long, String)].collect().toSet
    assert(cur == Set((1L, "y"), (2L, "z")))
    store.upsertVertices("item", Seq((3L, "w")).toDF("id", "v"))
    store.vacuum(keepPrevious = 0)
    assert(store.vertexVersions("item") == Seq(2))
    intercept[NoSuchElementException](store.verticesAt("item", 0))
  }
}
