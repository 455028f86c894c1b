package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF-PQ: model determinism, encode semantics, and full-probe search. */
class IvfPqSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(n: Int, dim: Int) = (0 until n).map { i =>
    (i.toLong, (0 until dim).map(d =>
      if (d == 0) i.toFloat else ((i * 31 + d * 7) % 13 - 6).toFloat).toArray)
  }.toDF("id", "vec")

  test("model and codes are identical across input partitionings") {
    val df = vecs(40, 16)
    val (e1, m1) = Similarity.ivfPqIndex(df.coalesce(1), "id", "vec",
      nlist = 4, m = 4, ksub = 8, dim = 16)
    val (e2, m2) = Similarity.ivfPqIndex(df.repartition(7), "id", "vec",
      nlist = 4, m = 4, ksub = 8, dim = 16)
    assert(m1.coarse.flatten.toSeq == m2.coarse.flatten.toSeq)
    assert(m1.codebook.flatten.flatten.toSeq == m2.codebook.flatten.flatten.toSeq)
    val r1 = e1.orderBy("id").collect().map(_.toString).toSeq
    val r2 = e2.orderBy("id").collect().map(_.toString).toSeq
    assert(r1 == r2)
  }

  test("cells and codes are in range; sample vectors hit zero residual distance") {
    val df = vecs(40, 16)
    val (enc, model) = Similarity.ivfPqIndex(df, "id", "vec",
      nlist = 4, m = 4, ksub = 8, dim = 16)
    val rows = enc.select(col("cell"), col("codes")).collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 8)))
    // a training vector's residual IS a codeword → its encoded residual
    // distance is exactly 0 per subspace
    val trainIds = df.orderBy(md5(col("id").cast("string")), col("id"))
      .limit(8).select("id").as[Long].collect().toSet
    val byId = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    enc.collect().filter(r => trainIds(r.getLong(0))).foreach { r =>
      val v = byId(r.getLong(0)).map(_.toDouble).toArray
      val cell = r.getInt(1)
      val cs = r.getSeq[Int](2)
      (0 until 4).foreach { s =>
        val d2 = (0 until 4).map { d =>
          val res = v(s * 4 + d) - model.coarse(cell)(s * 4 + d)
          math.pow(res - model.codebook(s)(cs(s))(d), 2)
        }.sum
        assert(d2 == 0.0, s"training vector residual must be a codeword (s=$s)")
      }
    }
  }

  test("probing every cell returns k neighbors for every query") {
    val df = vecs(40, 16)
    val (enc, model) = Similarity.ivfPqIndex(df, "id", "vec",
      nlist = 4, m = 4, ksub = 8, dim = 16)
    val res = Similarity.ivfPqTopK(df.where(col("id") < 5), enc, "id", "vec",
      model, k = 3, nprobe = 4)
    val counts = res.groupBy("query_id").count().select("count")
      .as[Long].collect()
    assert(counts.length == 5 && counts.forall(_ == 3L))
    // ascending distance within each query
    val byQ = res.orderBy("query_id", "rank")
      .select("query_id", "adist").as[(Long, Double)].collect()
      .groupBy(_._1).values
    assert(byQ.forall(rs => rs.map(_._2).toSeq == rs.map(_._2).toSeq.sorted))
  }
}
