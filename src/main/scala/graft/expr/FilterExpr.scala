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

  /** Compile to a Catalyst Column under the reference's strict PYTHON
    * evaluation flavor (`_cast_python`, graflo/filter/onto.py:499-523) —
    * the no-coercion semantics of calling the comparison dunder directly
    * and accepting only a literal `True`:
    *
    *  - cross-TYPE comparisons are False, never coerced: `1 == "1"` is
    *    False, and so are `1 != "1"` and `1 < "2"` (the dunder returns
    *    `NotImplemented`, which `is True` rejects — the `!=` case is the
    *    famous quirk);
    *  - numeric kinds inter-compare exactly (`1 == 1.0`), and bool is an
    *    int (`True == 1`);
    *  - a missing or None field is False for every operator except
    *    IS_NULL (True when missing/None) / IS_NOT_NULL;
    *  - a None/empty comparison value is False (`if ... not self.value`);
    *  - IN is per-element `==` with the same strictness;
    *  - every leaf collapses to a DEFINITE boolean (no SQL three-valued
    *    logic), so `NOT` over a null field is True where the engine
    *    flavor would yield null-dropped.
    *
    * Type compatibility is decided statically against the frame schema —
    * a Spark column is uniformly typed, which is exactly why the default
    * [[compile]] uses the engine flavor; this compiler serves manifests
    * authored against the reference's Python evaluator. Parity is
    * executed-fixture-tested in `ReferenceFilterParitySpec`.
    */
  def compilePython(e: FilterExpr, schema: org.apache.spark.sql.types.StructType): Column = {
    import org.apache.spark.sql.types._
    def isIntegral(dt: DataType) = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    def isFloating(dt: DataType) = dt match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    }
    def litKind(v: Any): String = v match {
      case null => "null"
      case _: Boolean | _: java.lang.Boolean => "bool"
      case _: Int | _: Long | _: Short | _: Byte |
           _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
           _: java.lang.Byte | _: java.math.BigInteger | _: BigInt => "int"
      case _: Double | _: Float | _: java.lang.Double | _: java.lang.Float |
           _: java.math.BigDecimal | _: BigDecimal => "float"
      case _: String => "str"
      case _ => "other"
    }
    def boolAsInt(v: Any): Any = v match {
      case b: Boolean => if (b) 1 else 0
      case b: java.lang.Boolean => if (b) 1 else 0
      case other => other
    }
    // dunder-DIRECT comparability (`field_val.__op__(value)` with no
    // reflected fallback — onto.py:516-522): the FIELD's type decides.
    // int.__eq__(float) is NotImplemented, so an integral column never
    // compares to a float value; float dunders accept ints and bools;
    // bool is an int (accepts int values, rejects floats).
    def operandsStrict(f: String, v: Any): Option[(Column, Column)] =
      schema.find(_.name == f).map(_.dataType).flatMap { dt =>
        (dt, litKind(v)) match {
          case (StringType, "str")                       => Some((col(f), lit(v)))
          case (BooleanType, "bool")                     => Some((col(f), lit(v)))
          case (BooleanType, "int")                      => Some((col(f).cast("int"), lit(v)))
          case (t, "int") if isIntegral(t)               => Some((col(f), lit(v)))
          case (t, "bool") if isIntegral(t)              => Some((col(f), lit(boolAsInt(v))))
          case (t, "int" | "float" | "bool") if isFloating(t) =>
            Some((col(f), lit(boolAsInt(v))))
          case _                                         => None
        }
      }
    // IN evaluates real `field_val in value` — REFLECTED equality, so all
    // numeric kinds (bool included) unify; strings only match strings.
    def operandsIn(f: String, v: Any): Option[(Column, Column)] =
      schema.find(_.name == f).map(_.dataType).flatMap { dt =>
        (dt, litKind(v)) match {
          case (StringType, "str")                          => Some((col(f), lit(v)))
          case (BooleanType, "int" | "float" | "bool")      =>
            Some((col(f).cast("int"), lit(boolAsInt(v))))
          case (t, "int" | "float" | "bool")
            if isIntegral(t) || isFloating(t)               =>
            Some((col(f), lit(boolAsInt(v))))
          case _                                            => None
        }
      }
    def leaf(f: String, op: CmpOp, v: Any): Column = {
      val fieldKnown = schema.fieldNames.contains(f)
      op match {
        case CmpOp.IsNull    => if (fieldKnown) col(f).isNull else lit(true)
        case CmpOp.IsNotNull => if (fieldKnown) col(f).isNotNull else lit(false)
        case CmpOp.In =>
          val vs = v match {
            case s: Seq[_]   => s
            case a: Array[_] => a.toSeq
            case null        => Nil
            case single      => Seq(single)
          }
          val terms = vs.filter(_ != null)
            .flatMap(x => operandsIn(f, x).map { case (a, b) => a === b })
          if (terms.isEmpty) lit(false)
          else coalesce(terms.reduceLeft(_ || _), lit(false))
        case cmp =>
          operandsStrict(f, v) match {
            case None => lit(false)
            case Some((a, b)) =>
              val raw = cmp match {
                case CmpOp.Eq  => a === b
                case CmpOp.Neq => a =!= b
                case CmpOp.Gt  => a > b
                case CmpOp.Gte => a >= b
                case CmpOp.Lt  => a < b
                case CmpOp.Lte => a <= b
                case _         => lit(false)
              }
              coalesce(raw, lit(false)) // None field → False, definite
          }
      }
    }
    e match {
      case Cmp(f, op, v)  => leaf(f, op, v)
      case And(es)        => es.map(compilePython(_, schema)).reduceLeft(_ && _)
      case Or(es)         => es.map(compilePython(_, schema)).reduceLeft(_ || _)
      case Not(x)         => !compilePython(x, schema)
      case IfThen(a, b)   => !compilePython(a, schema) || compilePython(b, schema)
    }
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
        // the reference's from_dict wraps NOT's dep in a one-element list
        // ({"NOT": [expr]}, onto.py:250-253); the bare form is also accepted
        case ("NOT" | "not", v: Seq[_]) :: Nil
          if v.size == 1 && (v.head.isInstanceOf[Seq[_]] || v.head.isInstanceOf[Map[_, _]]) =>
          Not(parse(v.head))
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
