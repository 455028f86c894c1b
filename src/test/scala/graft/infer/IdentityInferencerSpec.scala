package graft.infer

import graft.SparkSpec

/** Full identity inference vs the reference's committed example-15 golden
  * (examples/15-identity-inference/artifacts/manifest-inferred.yaml) and
  * the algorithm's contract corners (identity_inference.py).
  */
class IdentityInferencerSpec extends SparkSpec {

  private val ex = "/root/reference/examples/15-identity-inference"

  test("example 15 golden: composite [product_code, org] and unary [supplier_code]") {
    assume(new java.io.File(s"$ex/data/products.csv").exists())
    val products = spark.read.option("header", true)
      .csv(s"$ex/data/products.csv")
    val suppliers = spark.read.option("header", true)
      .csv(s"$ex/data/suppliers.csv")
    // the committed manifest-inferred.yaml pins these exact identities
    val p = IdentityInferencer.infer(products,
      Seq("org", "product_code", "name", "category", "updated_at"))
    assert(p.strategy == "composite" && p.identity == Seq("product_code", "org"),
      s"product: $p")
    val s = IdentityInferencer.infer(suppliers,
      Seq("supplier_code", "name", "country"))
    assert(s.strategy == "unary" && s.identity == Seq("supplier_code"),
      s"supplier: $s")
    assert(s.confidence == 1.0)
  }

  test("sample too small yields no viable identity") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val r = IdentityInferencer.infer(df)
    assert(r.strategy == "no_viable_identity" &&
      r.warning.contains("sample too small"))
  }

  test("semantic suffix ranks a *_code column above equally-cheap columns") {
    val spark0 = spark
    import spark0.implicits._
    // both columns unique; the semantic bonus must pick item_code
    val df = (0 until 150).map(i => (s"C$i", s"N$i")).toDF("item_code", "plain")
    val r = IdentityInferencer.infer(df)
    assert(r.strategy == "unary" && r.identity == Seq("item_code"))
  }

  test("width cap forces the hash fallback with the minimal key recorded") {
    val spark0 = spark
    import spark0.implicits._
    // only the full 4-tuple is unique -> exceeds maxKeyWidth=3
    val rows = for (a <- 0 until 4; b <- 0 until 4; c <- 0 until 4; d <- 0 until 4)
      yield (s"a$a", s"b$b", s"c$c", s"d$d")
    val df = rows.toDF("w", "x", "y", "z")
    val r = IdentityInferencer.infer(df, maxKeyWidth = 3)
    assert(r.strategy == "hash_fallback")
    assert(r.identity == Seq("id"))
    assert(r.hashIdentityProperties.toSet == Set("w", "x", "y", "z"))
    assert(r.warning.exists(_.contains("max_key_width")))
  }

  test("long-text and mostly-null columns are disqualified") {
    assert(IdentityInferencer.typeCost(Seq("x" * 300, "y")).isEmpty)
    assert(IdentityInferencer.typeCost(Seq(null, null, null, "v")).isEmpty)
    assert(IdentityInferencer.typeCost(
      Seq("123e4567-e89b-42d3-a456-426614174000")).contains(0.0))
  }
}
