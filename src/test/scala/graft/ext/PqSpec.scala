package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: codebook determinism, encode range/semantics,
  * ADC ranking sanity.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(n: Int, dim: Int) = (0 until n).map { i =>
    // first component = i keeps every vector distinct (no accidental dups)
    (i.toLong, (0 until dim).map(d =>
      if (d == 0) i.toFloat else ((i * 31 + d * 7) % 13 - 6).toFloat).toArray)
  }.toDF("id", "vec")

  test("codebook shape and determinism across partitionings") {
    val df = vecs(40, 16)
    val cb1 = Similarity.pqCodebook(df.coalesce(1), "id", "vec", m = 4, ksub = 8, dim = 16)
    val cb2 = Similarity.pqCodebook(df.repartition(7), "id", "vec", m = 4, ksub = 8, dim = 16)
    assert(cb1.length == 4 && cb1(0).length == 8 && cb1(0)(0).length == 4)
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
  }

  test("codes are in [0, ksub) and training vectors encode to themselves") {
    val df = vecs(40, 16)
    val cb = Similarity.pqCodebook(df, "id", "vec", m = 4, ksub = 8, dim = 16)
    val enc = Similarity.pqEncode(df, "id", "vec", cb)
    val codes = enc.select(col("codes")).as[Seq[Int]].collect()
    assert(codes.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 8)))
    // a training vector's subvectors ARE centroids → its per-subspace
    // distance to its own centroid is 0, so it encodes to distance-0 codes
    val trainIds = df.orderBy(md5(col("id").cast("string")), col("id"))
      .limit(8).select("id").as[Long].collect().toSet
    val byId = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    enc.collect().filter(r => trainIds(r.getLong(0))).foreach { r =>
      val v = byId(r.getLong(0)).map(_.toDouble)
      val cs = r.getSeq[Int](1)
      (0 until 4).foreach { s =>
        val cent = cb(s)(cs(s))
        val d2 = (0 until 4).map(d => math.pow(v(s * 4 + d) - cent(d), 2)).sum
        assert(d2 == 0.0, s"training vector should hit a zero-distance centroid in subspace $s")
      }
    }
  }

  test("ADC top-1 for an exact duplicate of a training vector is that vector") {
    val base = vecs(40, 16)
    val cb = Similarity.pqCodebook(base, "id", "vec", m = 4, ksub = 8, dim = 16)
    val trainId = base.orderBy(md5(col("id").cast("string")), col("id"))
      .limit(1).select("id").as[Long].collect().head
    val dup = base.where(col("id") === trainId)
      .select(lit(999L).as("id"), col("vec"))
    val corpus = base.unionByName(dup)
    val enc = Similarity.pqEncode(corpus, "id", "vec", cb)
    val top = Similarity.pqTopK(corpus.where(col("id") === 999L), enc,
      "id", "vec", cb, k = 1).collect().head
    // the ADC guarantee: a code-identical vector exists (the duplicated
    // training vector), so the top hit has adist exactly 0 and shares the
    // query's codes (id ties break to the smallest code-identical vector)
    assert(top.getDouble(3) == 0.0)
    val codesOf = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codesOf(top.getLong(2)) == codesOf(999L))
    assert(codesOf(trainId) == codesOf(999L))
  }

  test("ranking is ascending in adist with id tiebreak") {
    val df = vecs(30, 16)
    val cb = Similarity.pqCodebook(df, "id", "vec", m = 4, ksub = 8, dim = 16)
    val enc = Similarity.pqEncode(df, "id", "vec", cb)
    val res = Similarity.pqTopK(df.where(col("id") < 2), enc, "id", "vec", cb, k = 5)
      .orderBy("query_id", "rank").collect()
    res.groupBy(_.get(0)).foreach { case (_, rows) =>
      val ds = rows.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(ds == ds.sorted)
    }
  }
}
