package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate/expression language of the engine.
  *
  * Mirrors the reference's `FilterExpression` tree
  * (graflo/filter/onto.py:123-596): leaf comparisons
  * `== != >= <= > < IN IS_NULL IS_NOT_NULL` (onto.py:78-101) and composites
  * `AND OR NOT IF_THEN` (implication == `!a || b`, onto.py:36-49,556-583).
  *
  * Where the reference renders the same tree to six dialects (AQL, Cypher,
  * nGQL, GSQL, SQL, Python-eval), this engine needs exactly ONE compiler:
  * `FilterExpr → Column`. Catalyst then pushes the resulting predicates into
  * the scan (parquet/JDBC) for free — predicate pushdown that the reference
  * had to hand-render per backend.
  */
sealed trait FilterExpr {
  def &&(other: FilterExpr): FilterExpr = FilterExpr.And(Seq(this, other))
  def ||(other: FilterExpr): FilterExpr = FilterExpr.Or(Seq(this, other))
  def unary_! : FilterExpr              = FilterExpr.Not(this)
}

object FilterExpr {
  sealed trait CmpOp
  object CmpOp {
    case object Eq        extends CmpOp
    case object Neq       extends CmpOp
    case object Gt        extends CmpOp
    case object Gte       extends CmpOp
    case object Lt        extends CmpOp
    case object Lte       extends CmpOp
    case object In        extends CmpOp
    case object IsNull    extends CmpOp
    case object IsNotNull extends CmpOp

    def fromToken(s: String): CmpOp = s match {
      case "==" | "=" | "__eq__"  => Eq
      case "!=" | "<>" | "__ne__" => Neq
      case ">" | "__gt__"         => Gt
      case ">=" | "__ge__"        => Gte
      case "<" | "__lt__"         => Lt
      case "<=" | "__le__"        => Lte
      case "in" | "IN" | "__in__" => In
      case "is_null" | "IS_NULL"         => IsNull
      case "is_not_null" | "IS_NOT_NULL" => IsNotNull
      case other => throw new IllegalArgumentException(s"unknown comparison op: $other")
    }
  }

  /** Leaf comparison. `value` coercion mirrors onto.py:144-152 (scalar→list
    * for IN; None allowed).
    */
  final case class Cmp(field: String, op: CmpOp, value: Any = null) extends FilterExpr
  final case class And(exprs: Seq[FilterExpr])                      extends FilterExpr
  final case class Or(exprs: Seq[FilterExpr])                       extends FilterExpr
  final case class Not(expr: FilterExpr)                            extends FilterExpr
  /** Implication: `cond → cons` ≡ `!cond || cons` (onto.py:556-583). */
  final case class IfThen(cond: FilterExpr, cons: FilterExpr)       extends FilterExpr

  // -- convenience constructors -------------------------------------------
  def eq(f: String, v: Any): FilterExpr        = Cmp(f, CmpOp.Eq, v)
  def neq(f: String, v: Any): FilterExpr       = Cmp(f, CmpOp.Neq, v)
  def gt(f: String, v: Any): FilterExpr        = Cmp(f, CmpOp.Gt, v)
  def gte(f: String, v: Any): FilterExpr       = Cmp(f, CmpOp.Gte, v)
  def lt(f: String, v: Any): FilterExpr        = Cmp(f, CmpOp.Lt, v)
  def lte(f: String, v: Any): FilterExpr       = Cmp(f, CmpOp.Lte, v)
  def in(f: String, vs: Seq[Any]): FilterExpr  = Cmp(f, CmpOp.In, vs)
  def isNull(f: String): FilterExpr            = Cmp(f, CmpOp.IsNull)
  def isNotNull(f: String): FilterExpr         = Cmp(f, CmpOp.IsNotNull)

  /** Compile to a Catalyst Column. The single replacement for the
    * reference's six dialect renderers.
    */
  def compile(e: FilterExpr): Column = e match {
    case Cmp(f, op, v) =>
      val c = col(f)
      op match {
        case CmpOp.Eq        => c === lit(v)
        case CmpOp.Neq       => c =!= lit(v)
        case CmpOp.Gt        => c > lit(v)
        case CmpOp.Gte       => c >= lit(v)
        case CmpOp.Lt        => c < lit(v)
        case CmpOp.Lte       => c <= lit(v)
        case CmpOp.In =>
          val vs = v match {
            case s: Seq[_]      => s
            case a: Array[_]    => a.toSeq
            case null           => Seq(null)
            case single         => Seq(single) // scalar→list coercion
          }
          c.isin(vs: _*)
        case CmpOp.IsNull    => c.isNull
        case CmpOp.IsNotNull => c.isNotNull
      }
    case And(es)        => es.map(compile).reduceLeft(_ && _)
    case Or(es)         => es.map(compile).reduceLeft(_ || _)
    case Not(x)         => !compile(x)
    case IfThen(a, b)   => !compile(a) || compile(b)
  }

  /** Field names referenced by a filter tree (used to decide which vertex
    * frames a traversal filter can apply to).
    */
  def fields(e: FilterExpr): Set[String] = e match {
    case Cmp(f, _, _) => Set(f)
    case And(es)      => es.flatMap(fields).toSet
    case Or(es)       => es.flatMap(fields).toSet
    case Not(x)       => fields(x)
    case IfThen(a, b) => fields(a) ++ fields(b)
  }

  /** Parse the reference's compact list form `["op", value, field]`
    * (onto.py:238-269) and dict shorthand `{"AND": [...]}` represented as
    * Scala collections (e.g. produced by a JSON parser).
    */
  def parse(node: Any): FilterExpr = node match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      mm.toList match {
        case (k @ ("AND" | "and"), v: Seq[_]) :: Nil => And(v.map(parse))
        case (k @ ("OR" | "or"), v: Seq[_]) :: Nil   => Or(v.map(parse))
        case ("NOT", v) :: Nil                       => Not(parse(v))
        case ("not", v) :: Nil                       => Not(parse(v))
        case (k @ ("IF_THEN" | "if_then"), v: Seq[_]) :: Nil if v.size == 2 =>
          IfThen(parse(v.head), parse(v(1)))
        case _ =>
          // discriminated form {"field":..., "cmp_operator":..., "value":...};
          // YAML manifests use "foo"/"operator" aliases with dunder tokens
          // (reference filter/onto.py:106-183)
          val f  = mm("field").toString
          val op = CmpOp.fromToken(mm.get("cmp_operator").orElse(mm.get("foo"))
            .orElse(mm.get("operator")).getOrElse("==").toString)
          Cmp(f, op, mm.get("value").orNull)
      }
    case s: Seq[_] if s.size == 3 =>
      Cmp(s(2).toString, CmpOp.fromToken(s.head.toString), s(1))
    case s: Seq[_] if s.size == 2 =>
      Cmp(s(1).toString, CmpOp.fromToken(s.head.toString), null)
    case other =>
      throw new IllegalArgumentException(s"cannot parse filter: $other")
  }
}
