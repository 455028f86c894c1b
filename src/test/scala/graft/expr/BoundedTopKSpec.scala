package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ext.Corpus

class BoundedTopKSpec extends AnyFunSuite with SparkSpec {

  private def sample = {
    import spark.implicits._
    Seq(
      ("a", 3.0, 1L), ("a", 5.0, 2L), ("a", 5.0, 3L), ("a", 1.0, 4L),
      ("b", 2.0, 5L), ("b", 2.0, 6L),
      ("c", 7.0, 7L)
    ).toDF("g", "score", "id")
  }

  test("keeps the k best pairs, score desc then payload asc on ties") {
    val out = Corpus.topKPerGroupAgg(sample, "g", "score", "id", 2)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 1, 2L, 5.0), ("a", 2, 3L, 5.0),
      ("b", 1, 5L, 2.0), ("b", 2, 6L, 2.0),
      ("c", 1, 7L, 7.0)))
  }

  test("agrees with the window implementation on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_mktsegment").as("g"),
        col("c_acctbal").cast("double").as("score"), col("c_custkey").as("id"))
    val win = Corpus.topKPerGroup(docs, "g", "score", "id", 7)
      .select(col("g"), col("rank").cast("int").as("rank"), col("id"), col("score"))
    val agg = Corpus.topKPerGroupAgg(docs, "g", "score", "id", 7)
    assert(agg.orderBy("g", "rank").collect().toSeq ==
      win.orderBy("g", "rank").collect().toSeq)
  }

  test("null scores are ignored; null payload sorts before non-null at equal score") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(2.0), Some("x")), ("a", None, Some("y")),
      ("a", Some(2.0), None), ("a", Some(1.0), Some("z"))
    ).toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(BoundedTopK.topKPairs(2, col("score"), col("id")).as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.score"), col("p.payload"))
      .collect().map(r => (r.getDouble(0), Option(r.getString(1))))
    assert(out.toSeq == Seq((2.0, None), (2.0, Some("x"))))
  }

  test("partial aggregation: plan shuffles bounded pairs, not input rows") {
    val plan = Corpus.topKPerGroupAgg(sample, "g", "score", "id", 3)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs the typed-imperative heap with a map-side
    // partial pass before the exchange — the whole point of the operator
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(plan.toLowerCase.contains("partial_topk_pairs"))
  }

  test("SQL registration via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    sample.createOrReplaceTempView("btk_sample")
    val rows = spark.sql(
      """SELECT g, topk_pairs(1, score, id) AS t FROM btk_sample GROUP BY g""")
      .select(col("g"), col("t")(0).getField("payload").as("best"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 2L), ("b", 5L), ("c", 7L)))
  }

  test("serialize/deserialize round-trips the heap") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    val agg = BoundedTopK(3,
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, StringType, nullable = true))
    var buf = agg.createAggregationBuffer()
    val rows = Seq((1.5, "a"), (9.0, "b"), (4.0, "c"), (0.5, "d"))
    rows.foreach { case (s, p) =>
      buf = agg.update(buf, org.apache.spark.sql.catalyst.InternalRow(
        s, org.apache.spark.unsafe.types.UTF8String.fromString(p)))
    }
    val back = agg.deserialize(agg.serialize(buf))
    def drain(b: scala.collection.mutable.PriorityQueue[(Any, Any)]) =
      b.dequeueAll.map((p: (Any, Any)) => (p._1, p._2.toString)).toSet
    assert(drain(back) == Set((9.0, "b"), (4.0, "c"), (1.5, "a")))
  }
}
