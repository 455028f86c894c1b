package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.{FunnelBranch, Identity, GraphSchema, VertexDef}

/** Synthetic-identity minting as pure Catalyst column expressions.
  *
  * Reference semantics — BYTE-COMPATIBLE since round 7:
  *  - hash identity: SHA-256 hex over Python
  *    `json.dumps({field: value}, sort_keys=True, default=str)`
  *    (graflo/architecture/schema/identity_digest.py:33-47), reproduced
  *    exactly by [[PyJsonCanon]] — stores written by the two engines can
  *    be key-joined on hash ids (the former SURVEY §7.3 divergence is
  *    closed; the remaining caveat is TYPE parity, see DIVERGENCES.md).
  *    A document whose source fields are ALL empty (null or "") gets a
  *    null digest and is dropped, mirroring `compute_vertex_identity`
  *    (identity_digest.py:74-90).
  *  - funnel identity: ordered fallback branches, first branch whose
  *    `when_all_present` fields are all non-empty wins; optional
  *    `"_branch": <id>` marker mixed into the payload
  *    (identity_digest.py:50-71).
  *  - blank/assigned: uuid4 minted at assemble/write time
  *    (graflo/hq/db_writer.py:240-276).
  *
  * All of these are plain `Column`s — the canonicalizer is a native
  * Catalyst expression with codegen; no UDF, no codegen break.
  */
object IdentityDigest {
  val Sep = "\u0001"

  /** "present" means non-null and non-empty-string (reference treats "" as
    * missing for funnel branch selection and the all-empty hash rule).
    */
  private def present(f: String): Column =
    col(f).isNotNull && (col(f).cast("string") =!= lit(""))

  /** Reference-canonical digest payload: the Python-json rendering of
    * `{field: value}` (+ the `_branch` marker when given). Key order is
    * handled inside [[PyJsonCanon]] (sort_keys).
    */
  private def payload(fields: Seq[String], marker: Option[String]): Column = {
    val parts = fields.map(f => col(f).as(f)) ++
      marker.map(m => lit(m).as("_branch"))
    PyJsonCanon.column(struct(parts: _*))
  }

  def hashDigest(fields: Seq[String]): Column = {
    val anyPresent = fields.map(present).reduceLeft(_ || _)
    when(anyPresent, sha2(payload(fields, None), 256))
  }

  /** First branch whose `whenAllPresent` fields are all present wins;
    * no branch matching → null (the row is dropped before write, mirroring
    * `_drop_unkeyed_docs`, db_writer.py:206-238).
    */
  def funnelDigest(branches: Seq[FunnelBranch], markBranch: Boolean): Column = {
    val cases = branches.map { b =>
      val cond = b.whenAllPresent.map(present).reduceLeft(_ && _)
      when(cond, sha2(payload(b.digestFields, if (markBranch) Some(b.name) else None), 256))
    }
    coalesce(cases: _*)
  }

  /** The `_id` column for a vertex, or None for natural identities (which key
    * on their own fields).
    */
  def idColumn(v: VertexDef): Option[Column] = v.identity match {
    case Identity.Natural(_)     => None
    case Identity.Hash(fs)       => Some(hashDigest(fs))
    case Identity.Funnel(bs, mk) => Some(funnelDigest(bs, mk))
    case Identity.Blank | Identity.Assigned(_) =>
      // NOT uuid(): uuid() re-evaluates per action, so a caller that writes
      // the frame and then joins against it would see two disjoint id sets.
      // A digest over a stable row ordinal is deterministic per evaluation;
      // callers deriving multiple outputs from the frame must persist it
      // first (as Evolution.migrateStore and the pipeline compiler do).
      Some(sha2(concat_ws(Sep, lit(v.name),
        monotonically_increasing_id().cast("string")), 256))
  }

  /** Append the identity column if the vertex needs one (assigned mode
    * fills its REAL field, keeping present values — identity_uuid.py:38-50;
    * here at the rewrite plane the mint is the ordinal digest in UUID
    * shape).
    */
  def withIdentity(v: VertexDef)(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    (v.identity, idColumn(v)) match {
      case (Identity.Assigned(field), Some(c)) =>
        val minted = concat_ws("-",
          substring(c, 1, 8), substring(c, 9, 4),
          concat(lit("4"), substring(c, 14, 3)),
          concat(lit("8"), substring(c, 18, 3)),
          substring(c, 21, 12))
        val present = if (df.columns.contains(field))
          col(field).cast("string") else lit(null).cast("string")
        df.withColumn(field,
          when(present.isNull || present === "", minted).otherwise(present))
      case (_, Some(c)) => df.withColumn(GraphSchema.SyntheticId, c)
      case _            => df
    }

  /** Drop rows whose identity is entirely missing, mirroring
    * `_drop_unkeyed_docs` (db_writer.py:206-238): natural → all key fields
    * null; synthetic → null digest (funnel with no matching branch).
    */
  def dropUnkeyed(v: VertexDef)(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    v.identity match {
      case Identity.Natural(fs) =>
        // identity fields the frame never produced are absent from every
        // doc (the reference keys on the PRESENT subset — ticker.yaml
        // declares (cusip, cname, oftic) over data carrying only oftic);
        // a frame with NO identity field at all has only unkeyed docs.
        // "present" means non-null AND non-empty-string — the reference's
        // blank-identity prune drops a doc whose identity value is ""
        // (executed parity case edge_blank_string_identity)
        val present = fs.filter(df.columns.contains)
        if (present.isEmpty) df.where(lit(false))
        else df.where(present
          .map(f => col(f).isNotNull && col(f).cast("string") =!= "")
          .reduceLeft(_ || _))
      case Identity.Hash(_) | Identity.Funnel(_, _) =>
        df.where(col(GraphSchema.SyntheticId).isNotNull)
      case _ => df // blank/assigned always mint
    }
}
