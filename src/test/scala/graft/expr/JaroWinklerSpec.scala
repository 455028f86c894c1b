package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Native Jaro-Winkler expression: DuckDB-parity values, null handling,
  * codegen/interpreted agreement, SQL registration.
  */
class JaroWinklerSpec extends SparkSpec {

  // expectations computed by DuckDB's jaro_winkler_similarity (the oracle
  // engine), which floors the transposition half-count and scores bytes
  private val cases = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but prefix 0
    ("abcdefghij", "abcdzzzzzzzzzzzzzzzzzzzz", 0.5222222222222223), // no boost at <= 0.7
    ("daeabbca", "aedeaadc", 0.7222222222222222), // odd raw transpositions → floor
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("a", "b", 0.0))

  test("kernel matches DuckDB jaro_winkler_similarity") {
    cases.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(math.abs(got - want) < 1e-12, s"($a, $b): got $got want $want")
      // symmetric
      val rev = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(math.abs(rev - want) < 1e-12, s"($b, $a) reversed")
    }
  }

  test("column path (whole-stage codegen) agrees with the kernel") {
    import spark.implicits._
    val df = cases.map { case (a, b, w) => (a, b, w) }.toDF("a", "b", "want")
    val rows = df.withColumn("got", JaroWinkler.column(col("a"), col("b")))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("got") - r.getAs[Double]("want")) < 1e-12)
    }
  }

  test("null propagates; non-string input rejected at analysis") {
    import spark.implicits._
    val df = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    val out = df.select(JaroWinkler.column(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, "x")).toDF("a", "b")
        .select(JaroWinkler.column(col("a"), col("b"))).collect()
    }
  }

  test("SQL-registered function is addressable") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").collect()
    assert(math.abs(r.head.getDouble(0) - 0.9611111111111111) < 1e-12)
  }

  test("jaroWinklerPairs blocks on the first token and thresholds") {
    import spark.implicits._
    val df = Seq(
      (1L, "small ring"), (2L, "small rign"), (3L, "small gizmo"),
      (4L, "red ring"))
      .toDF("id", "name")
    val out = graft.infer.CrossResourceIdentity
      .jaroWinklerPairs(df, "id", "name", minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1-2 is a transposition (high sim, same block); 1-3 same block but
    // low sim; 1-4 high sim but different block — excluded by blocking
    assert(out == Set((1L, 2L)))
  }
}
