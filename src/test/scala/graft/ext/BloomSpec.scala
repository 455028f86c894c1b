package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom filter: no false negatives, bounded false positives, bitmap
  * determinism across partitionings, and plan shape (probe is narrow).
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives; false-positive rate is near the formula") {
    val keys = (0L until 500L).toDF("k")
    val bitmap = Sketch.bloomBuild(keys, "k", mBits = 8192, kHash = 3)
    val probes = (0L until 5000L).toDF("k")
    val hits = probes.where(Sketch.bloomMightContain(col("k"), bitmap, 8192, 3))
      .as[Long].collect().toSet
    // every inserted key must hit
    assert((0L until 500L).forall(hits.contains))
    // fp rate ≈ (1 − e^(−kn/m))^k ≈ 0.5% here; allow generous slack
    val fps = hits.count(_ >= 500L)
    assert(fps.toDouble / 4500 < 0.05, s"fp rate too high: $fps/4500")
  }

  test("bitmap is identical across input partitionings and duplicates") {
    val keys = (0L until 200L).toDF("k")
    val b1 = Sketch.bloomBuild(keys.coalesce(1), "k", 4096, 3)
    val b2 = Sketch.bloomBuild(keys.repartition(13), "k", 4096, 3)
    val b3 = Sketch.bloomBuild(keys.union(keys), "k", 4096, 3)
    assert(b1.toSeq == b2.toSeq && b1.toSeq == b3.toSeq)
  }

  test("probe plans no shuffle — the filter pushes into the scan stage") {
    val keys = (0L until 50L).toDF("k")
    val bitmap = Sketch.bloomBuild(keys, "k", 4096, 3)
    val probed = (0L until 100L).toDF("k")
      .where(Sketch.bloomMightContain(col("k"), bitmap, 4096, 3))
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe should be exchange-free:\n$plan")
  }
}
