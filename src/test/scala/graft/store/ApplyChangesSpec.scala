package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model._

/** CDC apply semantics: latest-change-wins, wholesale column replacement,
  * delete/insert/carry-over faces, and no-op handling.
  */
class ApplyChangesSpec extends AnyFunSuite with SparkSpec {

  private def freshStore(tag: String): GraphStore = {
    val root = freshDir(s"target/graft-applychanges-$tag")
    val sch = GraphSchema(vertices = Seq(
      VertexDef("doc", Seq(FieldDef("a"), FieldDef("b")),
        Identity.Natural(Seq("id")))), edges = Nil)
    new GraphStore(root, sch, spark)
  }

  test("latest change wins; upsert replaces columns wholesale; delete drops") {
    import spark.implicits._
    val store = freshStore("basic")
    store.upsertVertices("doc", Seq(
      (1L, "a1", "b1"), (2L, "a2", "b2"), (3L, "a3", "b3"))
      .toDF("id", "a", "b"))
    val changes = Seq(
      // id 1: two upserts — seq 20 wins; its null b OVERWRITES b1
      (1L, 10L, "upsert", Some("a1-old")),
      (1L, 20L, "upsert", None),
      // id 2: upsert then delete — delete wins
      (2L, 10L, "upsert", Some("a2-new")),
      (2L, 30L, "delete", None),
      // id 4: unmatched upsert inserts
      (4L, 5L, "upsert", Some("a4")))
      .toDF("id", "_seq", "_op", "a")
    store.applyChanges("doc", changes, "_op", "_seq")
    val out = store.vertices("doc").collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[String]("a")),
        Option(r.getAs[String]("b")))).toMap
    assert(out(1L) == (None, Some("b1"))) // a nulled by the seq-20 upsert
    assert(!out.contains(2L))             // deleted
    assert(out(3L) == (Some("a3"), Some("b3"))) // untouched carry-over
    assert(out(4L) == (Some("a4"), None)) // inserted; no b in the feed row
  }

  test("unmatched delete and unknown ops emit nothing / change nothing") {
    import spark.implicits._
    val store = freshStore("noop")
    store.upsertVertices("doc", Seq((1L, "a1", "b1")).toDF("id", "a", "b"))
    val changes = Seq(
      (9L, 1L, "delete", Some("x")),  // no stored match: nothing inserted
      (1L, 1L, "noop", Some("zzz")))  // unknown op: stored row untouched
      .toDF("id", "_seq", "_op", "a")
    store.applyChanges("doc", changes, "_op", "_seq")
    val out = store.vertices("doc").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("a")).toMap
    assert(out == Map(1L -> "a1"))
  }

  test("applyChanges on an empty store keeps only final upserts") {
    import spark.implicits._
    val store = freshStore("empty")
    val changes = Seq(
      (1L, 1L, "upsert", Some("a1")),
      (2L, 1L, "upsert", Some("a2")), (2L, 2L, "delete", None))
      .toDF("id", "_seq", "_op", "a")
    store.applyChanges("doc", changes, "_op", "_seq")
    val out = store.vertices("doc").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("spikeDetect flags only full-trail buckets breaching the ratio") {
    import spark.implicits._
    // key x: buckets 0..3 have 1 event each; bucket 4 has 10 (spike);
    // bucket 5 empty; bucket 6 has 2 (trail mean now elevated — no spike)
    val rows =
      (0 until 4).map(b => ("x", b * 10L * 1000000L + 1L)) ++
        (0 until 10).map(i => ("x", 40L * 1000000L + i)) ++
        Seq(("x", 60L * 1000000L + 1L))
    val df = rows.toDF("k", "us").withColumn("ts", timestamp_micros(col("us")))
    val out = graft.ext.Events.spikeDetect(df, "k", "ts", stepSeconds = 10L,
      trail = 3, num = 2L, den = 1L)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(0L) == (1L, false)) // no full trail yet
    assert(out(30L)._2 == false)   // 1 vs trail {1,1,1}: not > 2× mean
    assert(out(40L) == (10L, true)) // 10·1·3 > 2·3 — spike
    assert(out(50L) == (0L, false))
    assert(out(60L)._2 == false)   // 2·3 = 6 vs 2·(1+10+0) = 22 — calm
  }
}
