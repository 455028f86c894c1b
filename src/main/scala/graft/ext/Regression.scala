package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear regression the way a 100 TB pipeline has to do it:
  * ONE partial-aggregated pass over the data accumulating the integer
  * Gram-matrix sums (sum(x_i*x_j), sum(x_i*y), marginals, n), then an exact
  * normal-equation solve on the DRIVER from those ten numbers. The cluster
  * never sees the model; the model never sees more than ten longs. This is
  * the classic "sufficient statistics" decomposition (reference analogue:
  * graflo's aggregate surface stops at COUNT/MIN/MAX/AVG —
  * graflo/architecture/query/aggregate.py; regression is part of the
  * training-data-pipeline extension surface, not a port).
  *
  * Determinism discipline: inputs are integer-quantized by the caller, so
  * the distributed sums are exact integers (order-free). The solve runs in
  * covariance form (`S = n*sum(xy) - sum(x)*sum(y)`) with Cramer's rule over
  * exact BigInt products; the ONLY inexact steps are the final
  * BigInt->double casts and fixed-order double expressions, which the
  * DuckDB oracle replicates term-for-term in HUGEINT + DOUBLE.
  *
  * Scale notes: the aggregate is a single `groupBy().agg` with map-side
  * partials — 10 longs per partition cross the exchange, nothing else. No
  * iteration, no feature matrix materialization, no driver data path other
  * than the one-row collect.
  */
object Regression {

  /** Exact integer sufficient statistics for a 2-feature regression. */
  final case class Gram2(
      n: BigInt,
      sx1: BigInt, sx2: BigInt, sy: BigInt,
      sx1x1: BigInt, sx2x2: BigInt, sx1x2: BigInt,
      sx1y: BigInt, sx2y: BigInt, syy: BigInt)

  /** One aggregation job: the ten integer sums. Columns must already be
    * integer-quantized (cast to long) by the caller.
    */
  def gram2(df: DataFrame, x1: String, x2: String, y: String): Gram2 = {
    val c1 = col(x1).cast("long"); val c2 = col(x2).cast("long")
    val cy = col(y).cast("long")
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(c1).as("sx1"), sum(c2).as("sx2"), sum(cy).as("sy"),
      sum(c1 * c1).as("sx1x1"), sum(c2 * c2).as("sx2x2"),
      sum(c1 * c2).as("sx1x2"),
      sum(c1 * cy).as("sx1y"), sum(c2 * cy).as("sx2y"),
      sum(cy * cy).as("syy")).head()
    Gram2(BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2)),
      BigInt(r.getLong(3)), BigInt(r.getLong(4)), BigInt(r.getLong(5)),
      BigInt(r.getLong(6)), BigInt(r.getLong(7)), BigInt(r.getLong(8)),
      BigInt(r.getLong(9)))
  }

  /** Closed-form coefficients for `y ~ b0 + b1*x1 + b2*x2` from the exact
    * sums, plus R². `lambda` > 0 adds a ridge penalty on the diagonal of
    * the covariance-form normal matrix (units: quantized-covariance counts,
    * i.e. comparable to `n*sum(x^2) - sum(x)^2`); 0 = plain OLS.
    *
    * All integer algebra is exact (BigInt); the double expressions are
    * written in one fixed association order that the oracle SQL mirrors.
    */
  def solve2(g: Gram2, lambda: BigInt = BigInt(0)): (Double, Double, Double, Double) = {
    val s11 = g.n * g.sx1x1 - g.sx1 * g.sx1 + lambda
    val s22 = g.n * g.sx2x2 - g.sx2 * g.sx2 + lambda
    val s12 = g.n * g.sx1x2 - g.sx1 * g.sx2
    val c1  = g.n * g.sx1y - g.sx1 * g.sy
    val c2  = g.n * g.sx2y - g.sx2 * g.sy
    val syy = g.n * g.syy - g.sy * g.sy
    val det = s11 * s22 - s12 * s12
    require(det != 0, "singular normal matrix — features are collinear")
    val b1 = (c1 * s22 - c2 * s12).toDouble / det.toDouble
    val b2 = (c2 * s11 - c1 * s12).toDouble / det.toDouble
    val b0 = (g.sy.toDouble - b1 * g.sx1.toDouble - b2 * g.sx2.toDouble) / g.n.toDouble
    // full quadratic-form SSE (valid for ridge too, where the normal
    // equations don't reduce it): SSE_s = Syy - 2(b.c) + b'Sb, all in
    // covariance scale; R^2 = 1 - SSE_s/Syy. Ridge diagonals use the
    // UNPENALIZED S for the fit metric.
    val s11p = s11 - lambda; val s22p = s22 - lambda
    val sse = syy.toDouble - 2.0 * (b1 * c1.toDouble + b2 * c2.toDouble) +
      (b1 * b1 * s11p.toDouble + 2.0 * (b1 * b2 * s12.toDouble) +
        b2 * b2 * s22p.toDouble)
    val r2 = 1.0 - sse / syy.toDouble
    (b0, b1, b2, r2)
  }

  /** Poisson GLM (log link) on a LOW-CARDINALITY ordinal covariate —
    * `y ~ Poisson(exp(b0 + b1·x))` fit by `rounds` Newton steps. The
    * data-sized work is ONE keyed aggregate to the per-level profile
    * (x, n, Σy); training runs on that profile (levels-many rows — the
    * canonical GLM-on-sufficient-statistics decomposition, valid because
    * the Poisson log-likelihood depends on the data only through per-level
    * counts when x is discrete).
    *
    * Engine parity: the only libm calls are `exp` per LEVEL per round
    * (≤ levels·rounds, each immediately quantized to micro-units), so
    * gradient/Hessian sums are exact integers; the Newton solve is exact
    * BigInt Cramer + one double division per coefficient — the same
    * contract as [[solve2]].
    *
    * Returns one row per level: x, n_obs, mean_y, lambda_hat (the fitted
    * rate), with b0/b1 (6 dp) repeated on every row.
    */
  def poissonGlm(df: DataFrame, xCol: String, yCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val prof = df.groupBy(col(xCol).cast("long").as("x"))
      .agg(count(lit(1)).as("n"), sum(col(yCol).cast("long")).as("sy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(prof.nonEmpty, "empty input")
    require(prof.length <= 10000, "xCol must be low-cardinality (levels <= 1e4)")
    val nTot = prof.map(_._2).sum
    val syTot = prof.map(_._3).sum
    var b0 = math.log(syTot.toDouble / nTot)
    var b1 = 0.0
    for (_ <- 1 to rounds) {
      // per-level rate, micro-quantized the instant it leaves libm
      val lamQ = prof.map { case (x, _, _) =>
        BigDecimal(math.exp(b0 + b1 * x) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
      }
      val h11 = prof.zip(lamQ).map { case ((_, n, _), l) => BigInt(n) * l }.sum
      val h12 = prof.zip(lamQ).map { case ((x, n, _), l) =>
        BigInt(x) * BigInt(n) * l }.sum
      val h22 = prof.zip(lamQ).map { case ((x, n, _), l) =>
        BigInt(x) * BigInt(x) * BigInt(n) * l }.sum
      val g1 = BigInt(syTot) * BigInt(1000000) - h11
      val g2 = prof.map { case (x, _, sy) => BigInt(x) * BigInt(sy) }.sum *
        BigInt(1000000) - h12
      val det = h11 * h22 - h12 * h12
      require(det != 0, "singular Hessian")
      b0 += (h22 * g1 - h12 * g2).toDouble / det.toDouble
      b1 += (h11 * g2 - h12 * g1).toDouble / det.toDouble
    }
    val spark = df.sparkSession
    import spark.implicits._
    val b0r = BigDecimal(b0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val b1r = BigDecimal(b1).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    prof.toSeq.map { case (x, n, sy) =>
      val lam = BigDecimal(math.exp(b0 + b1 * x))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val my = BigDecimal(sy.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (x, n, my, lam, b0r, b1r)
    }.toDF("x", "n_obs", "mean_y", "lambda_hat", "b0", "b1")
  }

  /** DuckDB replay of [[poissonGlm]] — Newton rounds unrolled over the
    * profile CTE; `srcSql` must produce (x, y) rows.
    */
  def poissonGlmOracleSql(srcSql: String, rounds: Int): String = {
    val iters = (1 to rounds).map { r =>
      s"""lam$r AS (SELECT p.x, p.n, p.sy,
         |    CAST(round(exp(b.b0 + b.b1 * p.x) * 1e6, 0) AS HUGEINT) AS lq
         |  FROM prof p CROSS JOIN beta${r - 1} b),
         |hs$r AS (SELECT sum(n::HUGEINT * lq) AS h11,
         |    sum(x::HUGEINT * n * lq) AS h12,
         |    sum(x::HUGEINT * x * n * lq) AS h22,
         |    (SELECT sum(sy) FROM prof)::HUGEINT * 1000000
         |      - sum(n::HUGEINT * lq) AS g1,
         |    (SELECT sum(x::HUGEINT * sy) FROM prof) * 1000000
         |      - sum(x::HUGEINT * n * lq) AS g2
         |  FROM lam$r),
         |beta$r AS (SELECT
         |    b.b0 + (h.h22 * h.g1 - h.h12 * h.g2)::DOUBLE /
         |      (h.h11 * h.h22 - h.h12 * h.h12)::DOUBLE AS b0,
         |    b.b1 + (h.h11 * h.g2 - h.h12 * h.g1)::DOUBLE /
         |      (h.h11 * h.h22 - h.h12 * h.h12)::DOUBLE AS b1
         |  FROM beta${r - 1} b CROSS JOIN hs$r h)""".stripMargin
    }.mkString(",\n")
    s"""WITH src AS ($srcSql),
       |prof AS (SELECT x::BIGINT AS x, count(*)::BIGINT AS n,
       |    sum(y)::BIGINT AS sy FROM src GROUP BY 1),
       |beta0 AS (SELECT ln((SELECT sum(sy) FROM prof)::DOUBLE /
       |    (SELECT sum(n) FROM prof)) AS b0, 0.0::DOUBLE AS b1),
       |$iters
       |SELECT p.x, p.n AS n_obs,
       |  round(p.sy::DOUBLE / p.n, 4) AS mean_y,
       |  round(exp(b.b0 + b.b1 * p.x), 4) AS lambda_hat,
       |  round(b.b0, 6) AS b0, round(b.b1, 6) AS b1
       |FROM prof p CROSS JOIN beta$rounds b
       |ORDER BY p.x""".stripMargin
  }

  /** The DuckDB side of [[solve2]]: CTEs over a one-row CTE `g` holding the
    * ten sums as HUGEINT columns named like [[Gram2]]'s fields, computing
    * b0/b1/b2/r2 with the exact association order of the Scala solve.
    * `lambdaExpr` is a HUGEINT SQL expression (may reference `n`), e.g.
    * `"20::HUGEINT*n*n"`; pass `"0::HUGEINT"` for plain OLS. `sfx` suffixes
    * the CTE names so several models can share one `g`.
    */
  def solve2Sql(lambdaExpr: String, sfx: String): String = {
    val l = s"($lambdaExpr)"
    s"""s$sfx AS (SELECT n*sx1x1 - sx1*sx1 + $l AS s11, n*sx2x2 - sx2*sx2 + $l AS s22,
       |  n*sx1x2 - sx1*sx2 AS s12, n*sx1y - sx1*sy AS c1, n*sx2y - sx2*sy AS c2,
       |  n*syy - sy*sy AS syy, n, sx1, sx2, sy FROM g),
       |b$sfx AS (SELECT
       |  (c1*s22 - c2*s12)::DOUBLE / (s11*s22 - s12*s12)::DOUBLE AS b1,
       |  (c2*s11 - c1*s12)::DOUBLE / (s11*s22 - s12*s12)::DOUBLE AS b2,
       |  s11, s22, s12, c1, c2, syy, n, sx1, sx2, sy FROM s$sfx),
       |m$sfx AS (SELECT
       |  (sy::DOUBLE - b1*sx1::DOUBLE - b2*sx2::DOUBLE) / n::DOUBLE AS b0,
       |  b1, b2,
       |  1.0 - (syy::DOUBLE - 2.0*(b1*c1::DOUBLE + b2*c2::DOUBLE)
       |    + (b1*b1*(s11 - $l)::DOUBLE + 2.0*(b1*b2*s12::DOUBLE)
       |       + b2*b2*(s22 - $l)::DOUBLE)) / syy::DOUBLE AS r2,
       |  n FROM b$sfx)""".stripMargin
  }
}
