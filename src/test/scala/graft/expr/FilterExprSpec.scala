package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FilterExprSpec extends SparkSpec {
  import FilterExpr._

  private lazy val df = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", -5.0), (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "s", "x")
  }

  test("leaf comparisons compile to the right rows") {
    assert(df.where(compile(gt("x", 0))).count() == 1)
    assert(df.where(compile(gte("x", 0))).count() == 2)
    assert(df.where(compile(FilterExpr.eq("s", "a"))).count() == 1)
    assert(df.where(compile(neq("s", "a"))).count() == 1) // null not matched
    assert(df.where(compile(in("s", Seq("a", "b")))).count() == 2)
    assert(df.where(compile(isNull("s"))).count() == 1)
    assert(df.where(compile(isNotNull("s"))).count() == 2)
  }

  test("IN coerces a scalar to a one-element list (onto.py:144-152)") {
    assert(df.where(compile(Cmp("s", CmpOp.In, "a"))).count() == 1)
  }

  test("composites: AND / OR / NOT / IF_THEN implication") {
    assert(df.where(compile(gt("x", -10) && lt("x", 5))).count() == 2)
    assert(df.where(compile(FilterExpr.eq("id", 1) || FilterExpr.eq("id", 2))).count() == 2)
    assert(df.where(compile(!FilterExpr.eq("id", 1))).count() == 2)
    // a → b ≡ !a || b : rows where (s='a') implies (x>5)
    assert(df.where(compile(IfThen(FilterExpr.eq("s", "a"), gt("x", 5))))
      .count() == 2) // id=1 satisfies consequent; id=2 vacuous; id=3 null s → not 'a'? null comparison → null → filtered
  }

  test("parse accepts list form and dict forms") {
    assert(parse(Seq(">", 0, "x")) == Cmp("x", CmpOp.Gt, 0))
    assert(parse(Seq("is_null", "s")) == Cmp("s", CmpOp.IsNull, null))
    assert(parse(Map("AND" -> Seq(Seq(">", 0, "x"), Seq("<", 5, "x")))) ==
      And(Seq(Cmp("x", CmpOp.Gt, 0), Cmp("x", CmpOp.Lt, 5))))
    assert(parse(Map("field" -> "s", "cmp_operator" -> "==", "value" -> "a")) ==
      Cmp("s", CmpOp.Eq, "a"))
  }
}
