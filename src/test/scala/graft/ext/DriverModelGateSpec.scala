package graft.ext

import graft.SparkSpec

/** Dual-path parity for the measured-count driver-model gates (the
  * [[Corpus.bpeTrain]] discipline): each operator that keeps its model on
  * the driver under a measured cardinality limit must produce IDENTICAL
  * results when the limit forces the distributed, DataFrame-resident
  * branch. Passing 0 as the limit forces the distributed branch on any
  * input.
  */
class DriverModelGateSpec extends SparkSpec {

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("bradleyTerry: distributed branch is rating-for-rating identical") {
    import spark.implicits._
    val m = Seq(
      ("a", "b", 9L, 1L), ("b", "c", 9L, 1L), ("a", "c", 10L, 0L),
      ("c", "d", 3L, 7L), ("d", "a", 2L, 8L), ("b", "d", 5L, 5L),
      ("e", "a", 0L, 4L) // shut-out item exercises the zero-denominator arm
    ).toDF("item_a", "item_b", "wins_a", "wins_b")
    val local = Stats.bradleyTerry(m, rounds = 6)
    val dist = Stats.bradleyTerry(m, rounds = 6, localItemLimit = 0L)
    assert(sortedRows(local) == sortedRows(dist))
    // and the gate actually changes the plan: the distributed branch
    // carries no items-many local relation
    assert(dist.queryExecution.analyzed.toString != local.queryExecution.analyzed.toString)
  }

  test("acfPacf: distributed branch is row-for-row identical") {
    import spark.implicits._
    // two series with different lengths and structure
    val rows =
      (1 to 300).map(t => ("sq", t.toLong,
        if ((t / 25) % 2 == 0) 100L else -100L)) ++
      (1 to 101).map(t => ("alt", t.toLong, if (t % 2 == 0) 73L else -19L))
    val df = rows.toDF("k", "t", "v")
    val local = Events.acfPacf(df, "k", "t", "v", maxLag = 5)
    val dist = Events.acfPacf(df, "k", "t", "v", maxLag = 5,
      localSeriesLimit = 0L)
    assert(sortedRows(local) == sortedRows(dist))
  }

  test("acfPacf distributed: zero-variance series raises at execution") {
    import spark.implicits._
    val df = (1 to 50).map(t => ("c", t.toLong, 5L)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Events.acfPacf(df, "k", "t", "v", maxLag = 2, localSeriesLimit = 0L)
        .collect()
    }
    assert(e.getMessage.contains("zero variance") ||
      Option(e.getCause).exists(_.getMessage.contains("zero variance")))
  }

  test("ar2Forecast: distributed branch is row-for-row identical") {
    import spark.implicits._
    // AR-ish integer series (cents); two series
    val rows =
      (1 to 200).map { t =>
        ("s1", t.toLong, (10000 + 3000 * math.sin(t / 5.0)).toLong)
      } ++
      (1 to 90).map { t =>
        ("s2", t.toLong, (5000 + 800 * math.cos(t / 3.0) +
          40 * (t % 7)).toLong)
      }
    val df = rows.toDF("k", "t", "v")
    val local = Events.ar2Forecast(df, "k", "t", "v")
    val dist = Events.ar2Forecast(df, "k", "t", "v", localSeriesLimit = 0L)
    assert(sortedRows(local) == sortedRows(dist))
  }

  test("ar2Forecast distributed: short series raises at execution") {
    import spark.implicits._
    val df = Seq(("s", 1L, 10L), ("s", 2L, 20L)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Events.ar2Forecast(df, "k", "t", "v", localSeriesLimit = 0L).collect()
    }
    assert(e.getMessage.contains("at least 3 observations") ||
      Option(e.getCause).exists(_.getMessage.contains("at least 3 observations")))
  }

  import org.apache.spark.sql.functions.col

  private def annVecs(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(d =>
        if (d == 0) i.toFloat else ((i * 31 + d * 7) % 13 - 6).toFloat).toArray)
    }.toDF("id", "vec")
  }

  test("pqTopK: distributed branch is rank-for-rank identical") {
    val corpus = annVecs(60, 16)
    val qs = corpus.where(col("id") < 7)
    val cb = Similarity.pqCodebook(corpus, "id", "vec", m = 4, ksub = 8, dim = 16)
    val enc = Similarity.pqEncode(corpus, "id", "vec", cb)
    val local = Similarity.pqTopK(qs, enc, "id", "vec", cb, k = 5)
    val dist = Similarity.pqTopK(qs, enc, "id", "vec", cb, k = 5,
      maxDriverQueries = 0)
    assert(sortedRows(local) == sortedRows(dist))
    // the gate changes the plan: no per-query literal array in the
    // distributed branch
    assert(dist.queryExecution.analyzed.toString !=
      local.queryExecution.analyzed.toString)
  }

  test("ivfPqTopK: distributed branch is rank-for-rank identical") {
    val corpus = annVecs(80, 16)
    val qs = corpus.where(col("id") % 11 === 0)
    val (enc, index) = Similarity.ivfPqIndex(corpus, "id", "vec",
      nlist = 4, m = 4, ksub = 8, dim = 16)
    val local = Similarity.ivfPqTopK(qs, enc, "id", "vec", index,
      k = 5, nprobe = 2)
    val dist = Similarity.ivfPqTopK(qs, enc, "id", "vec", index,
      k = 5, nprobe = 2, maxDriverQueries = 0)
    assert(sortedRows(local) == sortedRows(dist))
    // full-probe coverage too (every cell probed — all corpus rows scanned)
    val localAll = Similarity.ivfPqTopK(qs, enc, "id", "vec", index,
      k = 3, nprobe = 4)
    val distAll = Similarity.ivfPqTopK(qs, enc, "id", "vec", index,
      k = 3, nprobe = 4, maxDriverQueries = 0)
    assert(sortedRows(localAll) == sortedRows(distAll))
  }
}
