package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SQL-addressable native functions via the extensions entry point. */
class GraftExtensionsSpec extends SparkSpec {

  test("register exposes dot_product / vec_norm / cosine_sim to SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_norm(array(3.0D, 4.0D)) AS n,
        |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       dot_product(array(1.0D), array(1.0D, 2.0D)) AS mismatch
        |""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 5.0)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
    assert(row.isNullAt(3), "length mismatch is NULL, matching the HOF contract")
  }

  test("SQL and DataFrame paths agree on real embeddings") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, 0.1f, -0.3f)), (2L, Seq(-0.2f, 0.9f, 0.4f))
    ).toDF("id", "v")
    df.createOrReplaceTempView("vecs_ext_spec")
    val viaSql = spark.sql(
      "SELECT id, dot_product(v, v) AS d FROM vecs_ext_spec ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    val viaDf = df.select(col("id"), graft.ext.Similarity.dot(col("v"), col("v")).as("d"))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(viaSql == viaDf)
  }

  test("SQL NULL and empty-array literals null-propagate / sum to zero") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(NULL, array(1.0D, 2.0D)) AS a,
        |       dot_product(array(), array()) AS b,
        |       dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS c
        |""".stripMargin).head()
    assert(row.isNullAt(0))
    assert(row.getDouble(1) == 0.0, "empty arrays: an empty sum, not an error")
    assert(row.isNullAt(2))
  }

  test("composite functions reject non-deterministic arguments") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT vec_norm(transform(sequence(1, 3), i -> rand()))").collect()
    }
    assert(e.getMessage.contains("deterministic"), s"got: ${e.getMessage}")
  }

  test("the SparkSessionExtensions injection path accepts all functions") {
    // a builder-time config (`spark.sql.extensions=graft.GraftExtensions`)
    // drives exactly this call; the shared test session predates it, so
    // assert the injection itself is well-formed
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
