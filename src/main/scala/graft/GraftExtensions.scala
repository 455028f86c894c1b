package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Literal, Multiply, Sqrt}
import org.apache.spark.sql.types.IntegerType

import graft.expr.DotProduct

/** Spark-native deployment entry point: registers graft's native SQL
  * functions with a session, making the vector kernels SQL-addressable
  * (e.g. `SELECT dot_product(embedding, embedding) FROM embeddings`).
  *
  * Two paths to the same registry entries:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions` — every
  *    session built on the cluster (including SQL-only clients) sees the
  *    functions without touching application code;
  *  - programmatic: [[GraftExtensions.register]] on a live session
  *    (notebooks, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** (identifier, info, builder) for every exposed SQL function. The
    * composites mirror [[graft.ext.Similarity.norm]]/`cosine` exactly —
    * sqrt/divide/multiply over the same [[DotProduct]] kernel — expressed
    * as raw Catalyst expressions (a FunctionBuilder must return an
    * Expression tree; a Column round-trip would leave an unresolvable
    * ColumnNode inside the plan). The `new Divide`/`new Multiply`
    * constructors pick the session's ANSI eval mode at resolution time,
    * like the Column `/` operator does.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      args => {
        require(args.size == 2, "dot_product(a, b) takes two arrays")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_norm"),
      args => {
        require(args.size == 1, "vec_norm(a) takes one array")
        requireDeterministic("vec_norm", args)
        Sqrt(DotProduct(args.head, args.head))
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[DotProduct].getName, "cosine_sim"),
      args => {
        require(args.size == 2, "cosine_sim(a, b) takes two arrays")
        requireDeterministic("cosine_sim", args)
        val (a, b) = (args(0), args(1))
        new Divide(DotProduct(a, b),
          new Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.expr.JaroWinkler].getName, "jaro_winkler"),
      args => {
        require(args.size == 2, "jaro_winkler(a, b) takes two strings")
        graft.expr.JaroWinkler(args(0), args(1))
      }),
    (FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[graft.expr.BoundedTopK].getName, "topk_pairs"),
      args => {
        require(args.size == 3, "topk_pairs(k, score, payload) takes three arguments")
        val k = args.head match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"topk_pairs: k must be an integer literal, got ${other.sql}")
        }
        // the analyzer wraps a bare AggregateFunction from the registry in
        // an AggregateExpression itself
        graft.expr.BoundedTopK(k, args(1), args(2))
      }),
    (FunctionIdentifier("mink_distinct"),
      new ExpressionInfo(classOf[graft.expr.BoundedMinK].getName, "mink_distinct"),
      args => {
        require(args.size == 2, "mink_distinct(k, value) takes two arguments")
        val k = args.head match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"mink_distinct: k must be an integer literal, got ${other.sql}")
        }
        graft.expr.BoundedMinK(k, args(1))
      }))

  /** The composite builders repeat their argument trees (norm evaluates
    * the arg twice, cosine three times). For a non-deterministic arg
    * (rand()-built vectors) the copies would evaluate INDEPENDENTLY —
    * norm of two different vectors, even sqrt of a negative dot — so
    * reject at build time rather than return incoherent numbers.
    */
  private def requireDeterministic(fn: String, args: Seq[Expression]): Unit =
    args.foreach(a => require(a.deterministic,
      s"$fn repeats its argument expression and requires deterministic " +
        s"arguments; got: ${a.sql}"))

  /** Register the functions on an already-running session. */
  def register(spark: SparkSession): Unit = functions.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
