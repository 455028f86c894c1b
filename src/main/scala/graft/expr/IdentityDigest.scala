package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.{FunnelBranch, Identity, GraphSchema, VertexDef}

/** Synthetic-identity minting as pure Catalyst column expressions.
  *
  * Reference semantics:
  *  - hash identity: SHA-256 over a canonical rendering of the named source
  *    fields (graflo/architecture/schema/identity_digest.py:39-47). The
  *    reference canonicalizes via Python `json.dumps(sort_keys=True,
  *    default=str)`; byte-parity with that is NOT a goal (documented
  *    divergence, SURVEY §7.3) — we need determinism and collision
  *    resistance, so we render `name=value` pairs in declared field order
  *    joined with an unlikely separator, all inside whole-stage codegen.
  *  - funnel identity: ordered fallback branches, first branch whose
  *    `when_all_present` fields are all non-empty wins; optional branch
  *    marker mixed into the digest (identity_digest.py:50-71).
  *  - blank/assigned: uuid4 minted at assemble/write time
  *    (graflo/hq/db_writer.py:240-276).
  *
  * All of these are plain `Column`s — no UDF, no codegen break.
  */
object IdentityDigest {
  val Sep = "\u0001"

  /** "present" means non-null and non-empty-string (reference treats "" as
    * missing for funnel branch selection).
    */
  private def present(f: String): Column =
    col(f).isNotNull && (col(f).cast("string") =!= lit(""))

  /** Canonical digest payload: `f1=v1␁f2=v2…` in declared order; nulls render
    * as the empty marker so that (null, "x") != ("x", null).
    */
  private def payload(fields: Seq[String], marker: Option[String]): Column = {
    val parts = fields.map(f =>
      concat(lit(f), lit("="), coalesce(col(f).cast("string"), lit("\u0000"))))
    val all = marker.map(m => lit(s"_branch=$m") +: parts).getOrElse(parts)
    concat_ws(Sep, all: _*)
  }

  def hashDigest(fields: Seq[String]): Column =
    sha2(payload(fields, None), 256)

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
    case Identity.Blank | Identity.Assigned =>
      // NOT uuid(): uuid() re-evaluates per action, so a caller that writes
      // the frame and then joins against it would see two disjoint id sets.
      // A digest over a stable row ordinal is deterministic per evaluation;
      // callers deriving multiple outputs from the frame must persist it
      // first (as Evolution.migrateStore and the pipeline compiler do).
      Some(sha2(concat_ws(Sep, lit(v.name),
        monotonically_increasing_id().cast("string")), 256))
  }

  /** Append the synthetic `_id` column if the vertex needs one. */
  def withIdentity(v: VertexDef)(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    idColumn(v) match {
      case Some(c) => df.withColumn(GraphSchema.SyntheticId, c)
      case None    => df
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
        // a frame with NO identity field at all has only unkeyed docs
        val present = fs.filter(df.columns.contains)
        if (present.isEmpty) df.where(lit(false))
        else df.where(present.map(col(_).isNotNull).reduceLeft(_ || _))
      case Identity.Hash(_) | Identity.Funnel(_, _) =>
        df.where(col(GraphSchema.SyntheticId).isNotNull)
      case _ => df // blank/assigned always mint
    }
}
