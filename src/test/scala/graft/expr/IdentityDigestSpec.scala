package graft.expr

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.functions._

class IdentityDigestSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(("alice", "a1", 1L), (null.asInstanceOf[String], "b2", 2L),
      ("", "c3", 3L), (null.asInstanceOf[String], null.asInstanceOf[String], 4L))
      .toDF("name", "code", "k")
  }

  test("hash digest is sha-256 of the reference's Python-json payload") {
    val r = df.select(IdentityDigest.hashDigest(Seq("name")).as("h")).head()
    // payload json.dumps({"name": "alice"}, sort_keys=True) — byte-compatible
    // with identity_digest.py:33-47 (proven by ReferenceDigestParitySpec)
    assert(r.getString(0) ==
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("""{"name": "alice"}""".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("null and empty render differently; the all-empty row digests to null") {
    val hs = df.select(IdentityDigest.hashDigest(Seq("name", "code")).as("h"))
      .collect().map(_.getString(0))
    // k=4 has name=null, code=null — compute_vertex_identity returns None
    assert(hs.count(_ == null) == 1)
    assert(hs.filter(_ != null).distinct.length == 3)
  }

  test("funnel picks the first branch with all fields present ('' = missing)") {
    val branches = Seq(
      FunnelBranch("by_name", Seq("name"), Seq("name")),
      FunnelBranch("by_code", Seq("code"), Seq("code")))
    val r = df.select(col("k"), IdentityDigest.funnelDigest(branches, markBranch = false).as("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L) == sha("""{"name": "alice"}"""))
    assert(r(2L) == sha("""{"code": "b2"}"""))  // name null → branch 2
    assert(r(3L) == sha("""{"code": "c3"}"""))  // name empty → branch 2
    assert(r(4L) == null)            // no branch matches → null → dropped later
  }

  test("branch marker changes the digest when enabled") {
    val branches = Seq(FunnelBranch("b", Seq("name"), Seq("name")))
    val plain = df.where(col("k") === 1)
      .select(IdentityDigest.funnelDigest(branches, markBranch = false)).head().getString(0)
    val marked = df.where(col("k") === 1)
      .select(IdentityDigest.funnelDigest(branches, markBranch = true)).head().getString(0)
    assert(plain != marked)
  }

  test("dropUnkeyed removes all-null natural keys and null digests") {
    val v = VertexDef("v", Nil, Identity.Natural(Seq("name", "code")))
    assert(IdentityDigest.dropUnkeyed(v)(df).count() == 3) // k=4 dropped
  }
}
