package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout clustering + BPE pair statistics. */
class LayoutSpec extends SparkSpec {

  test("zValue walks the canonical 2-bit Z curve on a 4x4 grid") {
    import spark.implicits._
    // 4x4 grid over x,y in {0,1,2,3}; bits=2 → bins are the values
    // themselves (min=0, max=3; (v-0)/3*4 floors to v for v<3, clamps 3)
    val grid = (for { x <- 0 to 3; y <- 0 to 3 } yield (x, y)).toDF("x", "y")
    val z = Layout.zValue(grid, Seq("x", "y"), bits = 2)
      .orderBy("zvalue").select("x", "y").as[(Int, Int)].collect().toSeq
    // Morton order: (0,0)(1,0)(0,1)(1,1)(2,0)(3,0)(2,1)(3,1)…
    assert(z.take(8) == Seq((0, 0), (1, 0), (0, 1), (1, 1),
      (2, 0), (3, 0), (2, 1), (3, 1)))
    assert(z.size == 16 && z.distinct.size == 16)
  }

  test("z-ordered chunks bound the extent of EVERY dimension at once") {
    import spark.implicits._
    // 1024 points on a 32x32 grid; id order is row-major — perfect y
    // locality but every 64-row chunk spans the FULL x range, so a filter
    // on x prunes nothing. Z-order trades a little y locality for bounded
    // extent in both dimensions — that balance is the operator's point.
    val pts = (0 until 1024).map(i => (i.toLong, (i % 32).toDouble, (i / 32).toDouble))
      .toDF("id", "x", "y")
    def worstExtent(df: org.apache.spark.sql.DataFrame, orderCol: String,
        dim: String): Double = {
      val chunked = df.withColumn("chunk",
        ((row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(orderCol)))
          - 1) / 64).cast("int"))
      chunked.groupBy("chunk").agg((max(dim) - min(dim)).as("ext"))
        .agg(max("ext")).collect()(0).getDouble(0)
    }
    val z = Layout.zValue(pts, Seq("x", "y"), bits = 5)
    // row-major: x extent is the full 31
    assert(worstExtent(z, "id", "x") == 31.0)
    // z-order: 64 consecutive z points form an 8x8 tile — both dims ≤ 8
    assert(worstExtent(z, "zvalue", "x") <= 8.0)
    assert(worstExtent(z, "zvalue", "y") <= 8.0)
  }

  test("zorderLayout preserves rows and sorts within partitions") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toLong, (i * 37 % 100).toDouble,
      (i * 61 % 100).toDouble)).toDF("id", "x", "y")
    val out = Layout.zorderLayout(pts, Seq("x", "y"), bits = 6, numFiles = 4)
    assert(out.count() == 100)
    val perPart = out.select(col("zvalue"),
      spark_partition_id().as("pid")).collect()
    perPart.groupBy(_.getInt(1)).values.foreach { rows =>
      val zs = rows.map(_.getLong(0)).toSeq
      assert(zs == zs.sorted)
    }
  }

  test("bpePairCounts weights pairs by word frequency") {
    import spark.implicits._
    // "ab" ×3, "bc" ×1 → pair "ab" count 3, "bc" count 1
    val df = Seq("ab ab bc", "ab").toDF("text")
    val out = Corpus.bpePairCounts(df, "text", topK = 10)
      .as[(String, Long)].collect().toMap
    assert(out("ab") == 3L)
    assert(out("bc") == 1L)
  }

  test("bpePairCounts counts repeated pairs inside one word") {
    import spark.implicits._
    val df = Seq("aaa").toDF("text") // pairs: "aa" at pos 1 and 2 → count 2
    val out = Corpus.bpePairCounts(df, "text", topK = 10)
      .as[(String, Long)].collect().toMap
    assert(out("aa") == 2L)
  }
}
