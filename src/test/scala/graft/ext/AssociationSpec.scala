package graft.ext

import graft.SparkSpec

/** Market-basket pair mining. */
class AssociationSpec extends SparkSpec {

  test("pairSupport counts co-occurrence, confidence, and lift exactly") {
    import spark.implicits._
    // milk+bread in 3 of 4 baskets; eggs only alongside milk once
    val rows = Seq(
      (1L, "milk"), (1L, "bread"),
      (2L, "milk"), (2L, "bread"),
      (3L, "milk"), (3L, "bread"),
      (4L, "milk"), (4L, "eggs"))
    val out = Association.pairSupport(rows.toDF("basket", "item"),
      "basket", "item", minSupport = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val mb = out(("bread", "milk")) // unordered pair, a < b lexicographically
    assert(mb.getAs[Long]("pair_sup") == 3)
    assert(mb.getAs[Long]("sup_a") == 3 && mb.getAs[Long]("sup_b") == 4)
    assert(mb.getAs[Double]("confidence") == 1.0)   // bread → milk always
    assert(mb.getAs[Double]("lift") == 1.0)         // 3*4/(3*4)
    val me = out(("eggs", "milk"))
    assert(me.getAs[Long]("pair_sup") == 1)
    assert(me.getAs[Double]("lift") == 1.0)         // 1*4/(1*4)
  }

  test("duplicate items within a basket count once; minSupport filters") {
    import spark.implicits._
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val out = Association.pairSupport(rows.toDF("basket", "item"),
      "basket", "item", minSupport = 2, topK = 10).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("pair_sup") == 2) // (a,b) in both baskets
    val none = Association.pairSupport(rows.toDF("basket", "item"),
      "basket", "item", minSupport = 3, topK = 10).collect()
    assert(none.isEmpty)
  }

  test("mega-baskets beyond maxBasketSize contribute no pairs") {
    import spark.implicits._
    val mega = (0 until 50).map(i => (9L, s"x$i"))
    val rows = Seq((1L, "a"), (1L, "b")) ++ mega
    val out = Association.pairSupport(rows.toDF("basket", "item"),
      "basket", "item", minSupport = 1, topK = 100, maxBasketSize = 10)
      .collect()
    assert(out.length == 1) // only (a, b); the 50-item basket is dropped
  }
}
