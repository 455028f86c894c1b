package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector dot product — the hot kernel of
  * every similarity operator. The `zip_with`+`aggregate` higher-order
  * composition is semantically identical but evaluates its lambdas
  * interpreted, per element, with boxing; this expression generates a tight
  * primitive loop inside whole-stage codegen (and a matching interpreted
  * `nullSafeEval` for non-codegen paths).
  *
  * Semantics match the HOF composition exactly — elements cast to double,
  * ascending-index summation (bit-identical float math), NULL when the
  * arrays differ in length or any element is null — so swapping it under
  * [[graft.ext.Similarity.dot]] changes no oracle result.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType appears for SQL literals (dot_product(NULL, v), array()) —
    // accepted and null-propagated like comparable builtins, not rejected
    // at analysis
    def ok(t: DataType): Boolean = t match {
      case NullType => true
      case ArrayType(e, _) => e.isInstanceOf[NumericType] || e == NullType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two numeric arrays, got ${left.dataType} and ${right.dataType}")
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType // NullType child: eval never reaches the getter
  }

  private def getAsDouble(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType   => a.getLong(i).toDouble
    case ShortType  => a.getShort(i).toDouble
    case ByteType   => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    // array<null> elements are all null: the isNullAt guard fires first,
    // so this is only reached for n == 0 (never) — keep a total function
    case NullType => 0.0
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (ta, tb) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += getAsDouble(a, i, ta) * getAsDouble(b, i, tb)
      i += 1
    }
    sum
  }

  /** Java source for reading element `i` of array `v` as a double. */
  private def getterSrc(v: String, i: String, t: DataType): String = t match {
    case FloatType   => s"((double) $v.getFloat($i))"
    case DoubleType  => s"$v.getDouble($i)"
    case IntegerType => s"((double) $v.getInt($i))"
    case LongType    => s"((double) $v.getLong($i))"
    case ShortType   => s"((double) $v.getShort($i))"
    case ByteType    => s"((double) $v.getByte($i))"
    case d: DecimalType =>
      s"$v.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case NullType => "0.0" // unreachable at runtime (isNullAt guard)
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (left.dataType == NullType || right.dataType == NullType) {
      // a NULL-literal child is null on every row — don't emit the array
      // loop (its ArrayData assignment would not compile for NullType)
      return ev.copy(code = code"""
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;""")
    }
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("a"); val b = ctx.freshName("b")
    val i = ctx.freshName("i"); val n = ctx.freshName("n")
    val sum = ctx.freshName("sum"); val bad = ctx.freshName("bad")
    val (ga, gb) = (getterSrc(a, i, elemType(left)), getterSrc(b, i, elemType(right)))
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${leftGen.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rightGen.value};
          int $n = $a.numElements();
          if ($n == $b.numElements()) {
            boolean $bad = false;
            double $sum = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
              $sum += $ga * $gb;
            }
            if (!$bad) { ${ev.isNull} = false; ${ev.value} = $sum; }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpr {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
