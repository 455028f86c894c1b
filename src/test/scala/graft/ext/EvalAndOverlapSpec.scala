package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Self-BLEU components, KMV source-overlap sketches, mutual kNN graph. */
class EvalAndOverlapSpec extends SparkSpec {

  test("selfBleuComponents: clipped precision against the next doc") {
    import spark.implicits._
    // group g: doc 1 = "a b a", doc 2 = "a b c" → pair (1 → 2)
    //   unigrams cand {a:2, b:1}; ref {a:1, b:1, c:1} → clipped a:1, b:1 → 2/3
    //   bigrams cand {"a b", "b a"}; ref {"a b", "b c"} → clipped 1 → 1/2
    val df = Seq((1L, "a b a", "g"), (2L, "a b c", "g"))
      .toDF("id", "text", "grp")
    val r = Eval.selfBleuComponents(df, "id", "text", "grp").collect().head
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Long]("p1_num") == 2L && r.getAs[Long]("p1_den") == 3L)
    assert(r.getAs[Long]("p2_num") == 1L && r.getAs[Long]("p2_den") == 2L)
    assert(math.abs(r.getAs[Double]("p1") - 2.0 / 3) < 1e-5)
  }

  test("selfBleuComponents: last doc of a group has no reference pair") {
    import spark.implicits._
    val df = Seq((1L, "a b", "g"), (2L, "a b", "g"), (3L, "z z", "h"))
      .toDF("id", "text", "grp")
    val out = Eval.selfBleuComponents(df, "id", "text", "grp")
    // group h has a single doc → no pair → no row
    assert(out.collect().map(_.getString(0)).toSeq == Seq("g"))
  }

  test("kmv sketches: identical groups estimate jaccard 1, disjoint 0") {
    import spark.implicits._
    val text = "w1 w2 w3 w4 w5 w6"
    val other = "z1 z2 z3 z4 z5 z6"
    val df = Seq((1L, text, "a"), (2L, text, "b"), (3L, other, "c"))
      .toDF("id", "text", "src")
    val sk = Sketch.kmvSketches(df, "src", "text", n = 2, k = 8)
    assert(sk.count() == 3)
    val j = Sketch.kmvJaccard(sk, k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(j(("a", "b")).getAs[Double]("jaccard_est") == 1.0)
    assert(j(("a", "c")).getAs[Double]("jaccard_est") == 0.0)
    // union of a and c holds 10 distinct bigram hashes > k=8 → k_eff = 8
    assert(j(("a", "c")).getAs[Long]("k_eff") == 8L)
    // a and b share all 5 bigrams → union has 5 < k → exact, k_eff = 5
    assert(j(("a", "b")).getAs[Long]("k_eff") == 5L)
  }

  test("mutualKnnGraph keeps only reciprocal edges") {
    import spark.implicits._
    // 1 and 2 are near-identical; 3 is orthogonal-ish to both but still
    // ranks them (k=1 each side): 3's best is 1 or 2, but 1's best is 2 —
    // so 3's edges are one-directional and must be pruned
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f)),
      (2L, Array(1.0f, 0.05f, 0.1f)),
      (3L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("id", "vec")
    val out = Similarity.mutualKnnGraph(df, "id", "vec", k = 1)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("mutualKnnGraph at k = n-1 returns all pairs") {
    import spark.implicits._
    val df = (1L to 4L).map(i => (i, Array(i.toFloat, 1.0f))).toDF("id", "vec")
    val out = Similarity.mutualKnnGraph(df, "id", "vec", k = 3)
    assert(out.count() == 6) // C(4,2): every edge mutual at full k
  }
}
