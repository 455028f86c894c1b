package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Schema-plane validation hooks (reference vertex.py:352-416, 822-828):
  * duplicate-property merge rules and construction-time conflict surfacing.
  */
class SchemaRulesSpec extends AnyFunSuite {

  test("duplicate property: typed declaration beats untyped") {
    val v = VertexDef("v", Seq(
      FieldDef("a"), FieldDef("a", Some(FieldType.IntT)), FieldDef("b")),
      Identity.Natural(Seq("id")))
    val props = v.allProperties.filter(_.name == "a")
    assert(props == Seq(FieldDef("a", Some(FieldType.IntT))))
  }

  test("duplicate property: typed-then-untyped keeps the typed one") {
    val v = VertexDef("v", Seq(
      FieldDef("a", Some(FieldType.StringT)), FieldDef("a")),
      Identity.Natural(Seq("id")))
    assert(v.allProperties.filter(_.name == "a") ==
      Seq(FieldDef("a", Some(FieldType.StringT))))
  }

  test("conflicting declared types raise at schema construction") {
    val bad = VertexDef("v", Seq(
      FieldDef("a", Some(FieldType.IntT)), FieldDef("a", Some(FieldType.StringT))),
      Identity.Natural(Seq("id")))
    val e = intercept[IllegalArgumentException] {
      GraphSchema(Seq(bad))
    }
    assert(e.getMessage.contains("conflicting types"))
  }

  test("identical duplicate declarations dedupe silently") {
    val v = VertexDef("v", Seq(
      FieldDef("a", Some(FieldType.IntT)), FieldDef("a", Some(FieldType.IntT))),
      Identity.Natural(Seq("id")))
    assert(v.allProperties.count(_.name == "a") == 1)
    GraphSchema(Seq(v)) // construction-time validation passes
  }
}
