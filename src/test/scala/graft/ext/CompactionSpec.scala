package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.store.GraphStore
import java.nio.file.Files

/** Size-based compaction: the bin-packing planner and the store rewrite. */
class CompactionSpec extends SparkSpec {

  test("compactionPlan packs small files largest-first, leaves big ones") {
    import spark.implicits._
    val listing = Seq(
      // group g1: one file already at target, four small ones
      ("g1", "f1", 100L), ("g1", "f2", 40L), ("g1", "f3", 40L),
      ("g1", "f4", 30L), ("g1", "f5", 10L),
      // group g2: single tiny file
      ("g2", "f6", 5L)).toDF("grp", "file", "bytes")
    val plan = Layout.compactionPlan(listing, Seq("grp"), "file", "bytes",
      targetBytes = 100L)
    val bins = plan.collect()
      .map(r => r.getAs[String]("file") -> r.getAs[Long]("bin")).toMap
    // f1 is at target → untouched
    assert(bins("f1") == -1L)
    // largest-first fill: f2(40)→cum40 bin0, f3(40)→cum80 bin0,
    // f4(30)→cum110 bin1 (its last byte crosses the boundary), f5(10)→cum120 bin1
    assert(bins("f2") == 0L && bins("f3") == 0L)
    assert(bins("f4") == 1L && bins("f5") == 1L)
    assert(bins("f6") == 0L) // groups bin independently
  }

  test("compactionPlan is deterministic on size ties via the file id") {
    import spark.implicits._
    val listing = (1 to 8).map(i => ("g", f"f$i%02d", 30L))
      .toDF("grp", "file", "bytes")
    val plan = Layout.compactionPlan(listing, Seq("grp"), "file", "bytes", 100L)
      .orderBy("file").select("bin").as[Long].collect().toSeq
    // ties order f01..f08; cum 30,60,90,120,150,180,210,240 → bins 0,0,0,1,1,1,2,2
    assert(plan == Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L))
  }

  test("compactVertices rewrites many small part files into few, same rows") {
    import spark.implicits._
    val schema = GraphSchema(
      vertices = Seq(VertexDef("p", Nil, Identity.Natural(Seq("id")))),
      edges = Nil)
    val store = new GraphStore(
      Files.createTempDirectory("graft-compact-spec").toString, schema, spark)
    // fragment the live version explicitly (20 tiny part files): upserts
    // here land via an AQE-coalesced shuffle, so a small test collection
    // would not fragment on its own — at real scale the fragmentation
    // comes from many incremental batches instead
    store.overwriteVertices("p",
      (0 until 200).map(_.toLong).toDF("id").repartition(20))
    val before = store.vertices("p").select("id").orderBy("id").as[Long].collect().toSeq
    val res = store.compactVertices("p", targetBytes = 1L << 20)
    assert(res.isDefined, "fragmented collection should need compaction")
    val (nBefore, nAfter) = res.get
    assert(nAfter < nBefore && nAfter == 1) // 200 tiny rows fit one 1 MiB file
    val after = store.vertices("p").select("id").orderBy("id").as[Long].collect().toSeq
    assert(after == before)
    // already compact → no-op, no new version
    assert(store.compactVertices("p", 1L << 20).isEmpty)
  }
}
