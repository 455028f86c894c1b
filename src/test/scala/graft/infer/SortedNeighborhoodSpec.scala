package graft.infer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sorted-neighborhood blocking: pair semantics vs a single-partition
  * reference, and partition-count invariance of the two-phase ordinal.
  */
class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  private def people = Seq(
    (1L, "ana"), (2L, "anna"), (3L, "anne"), (4L, "bob"),
    (5L, "bobb"), (6L, "carl"), (7L, "carla"), (8L, "zoe")
  ).toDF("id", "name")

  private def pairsOf(df: org.apache.spark.sql.DataFrame, w: Int) =
    CrossResourceIdentity.sortedNeighborhoodPairs(df, "id", "name", w)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("window pairs match the brute-force sorted window") {
    val sortedIds = people.orderBy("name", "id").select("id")
      .as[Long].collect()
    val expected = (for {
      i <- sortedIds.indices
      j <- (i + 1) until math.min(i + 3, sortedIds.length)
    } yield (sortedIds(i), sortedIds(j))).toSet
    assert(pairsOf(people, w = 3) == expected)
  }

  test("result is invariant to input partitioning and numPartitions") {
    val base = pairsOf(people.coalesce(1), 3)
    assert(pairsOf(people.repartition(7), 3) == base)
    val wide = CrossResourceIdentity.sortedNeighborhoodPairs(
      people.repartition(5), "id", "name", 3, numPartitions = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(wide == base)
  }

  test("keys ride along for downstream scoring") {
    val row = CrossResourceIdentity.sortedNeighborhoodPairs(
      people, "id", "name", 2)
      .where(col("id_a") === 1L && col("id_b") === 2L)
      .select("key_a", "key_b").collect()
    assert(row.length == 1 && row(0).getString(0) == "ana" &&
      row(0).getString(1) == "anna")
  }
}
