package graft.model

import graft.expr.FilterExpr

/** Field types mirroring the reference's schema plane.
  *
  * Reference: graflo/architecture/schema/vertex.py:54-98 — INT, UINT, FLOAT,
  * DOUBLE, BOOL, STRING, DATETIME, UUID, LIST (scalar item only); types are
  * optional (vertex.py:177-187).
  */
sealed trait FieldType { def sparkDdl: String }
object FieldType {
  case object IntT      extends FieldType { val sparkDdl = "bigint"    }
  case object UIntT     extends FieldType { val sparkDdl = "bigint"    }
  case object FloatT    extends FieldType { val sparkDdl = "double"    }
  case object DoubleT   extends FieldType { val sparkDdl = "double"    }
  case object BoolT     extends FieldType { val sparkDdl = "boolean"   }
  case object StringT   extends FieldType { val sparkDdl = "string"    }
  case object DatetimeT extends FieldType { val sparkDdl = "timestamp" }
  case object UuidT     extends FieldType { val sparkDdl = "string"    }
  final case class ListT(item: FieldType) extends FieldType {
    def sparkDdl = s"array<${item.sparkDdl}>"
  }

  /** strict allowlist, reference: graflo/util/casting.py:9-59 */
  def fromName(s: String): FieldType = s.toLowerCase match {
    case "int" | "long"     => IntT
    case "uint"             => UIntT
    case "float"            => FloatT
    case "double"           => DoubleT
    case "bool" | "boolean" => BoolT
    case "str" | "string"   => StringT
    case "datetime"         => DatetimeT
    case "uuid"             => UuidT
    case l if l.startsWith("list<") && l.endsWith(">") =>
      ListT(fromName(l.substring(5, l.length - 1)))
    case other              => throw new IllegalArgumentException(s"unknown field type: $other")
  }
}

/** Optional grounding of a schema element in external vocabularies
  * (reference graflo/architecture/schema/semantics.py, meta-ontology
  * 1.4.0): purely additive — identity, storage naming and ingestion behave
  * identically whether or not the block is present. `unit` is valid on
  * FIELDS only (the reference splits `FieldSemantics` from `Semantics` so
  * `unit:` on a vertex is a validation error; graft's loader enforces the
  * same rejection). Serialized through `gf:semanticIri` / `gf:unit` and
  * the reused `skos:exactMatch` / `skos:altLabel`.
  */
final case class Semantics(
    iri: Option[String] = None,
    exactMatch: Seq[String] = Nil,
    synonyms: Seq[String] = Nil,
    unit: Option[String] = None
)

/** A declared vertex property; type is optional (schema-agnostic mode). */
final case class FieldDef(name: String, ftype: Option[FieldType] = None,
    semantics: Option[Semantics] = None)

/** One ordered fallback branch of an identity funnel.
  * Reference: graflo/architecture/schema/identity_funnel.py:40-120.
  */
final case class FunnelBranch(
    name: String,
    whenAllPresent: Seq[String],
    digestFields: Seq[String]
)

/** The four identity modes per vertex (reference vertex.py:777-790), plus
  * `assigned` (db_writer.py:257-276).
  */
sealed trait Identity
object Identity {
  /** Declared natural key; upsert key. */
  final case class Natural(fields: Seq[String]) extends Identity
  /** SHA-256 over canonical rendering of the named fields → synthetic `_id`.
    * Reference: graflo/architecture/schema/identity_digest.py:39-47.
    */
  final case class Hash(fields: Seq[String]) extends Identity
  /** Ordered fallback branches; first branch with all fields present wins.
    * Reference: identity_digest.py:50-71.
    */
  final case class Funnel(branches: Seq[FunnelBranch], markBranch: Boolean = false)
      extends Identity
  /** No natural identity; UUID minted at write. Reference db_writer.py:240-256. */
  case object Blank extends Identity
  /** Intentional UUID primary key in a REAL doc field (reference
    * `assigned: true`, identity_uuid.py:38-84): a present value is KEPT
    * (validated as a UUID — overwriting it would rekey data the caller
    * already holds references to); only empty values mint. `field` is the
    * declared identity field (reference `identity_fields[0] or "id"`).
    */
  final case class Assigned(field: String = "id") extends Identity
}

/** Alternate lookup-only field set ("match on ISIN instead of the PK").
  * Reference: vertex.py:303-349,522-529.
  */
final case class SecondaryIdentity(name: String, fields: Seq[String])

/** Secondary-index declaration (reference graph_types Index,
  * index_config.py:63-110; the physical-profile plane of
  * evolution/physical.py:132-278). Backend-portable metadata: graft's
  * store is parquet so indexes carry no execution weight here, but the
  * manifest contract (db_profile.vertex_indexes / edge_specs[].indexes)
  * round-trips and the evolution ops validate against it.
  */
final case class IndexDef(
    fields: Seq[String],
    unique: Boolean = true, // the reference Index model's default
    name: Option[String] = None)

/** Ambiguity policy when resolving a secondary identity to primaries.
  * Reference: graflo/onto.py:176-188.
  */
sealed trait AmbiguityPolicy
object AmbiguityPolicy {
  case object All   extends AmbiguityPolicy
  case object First extends AmbiguityPolicy
  case object Skip  extends AmbiguityPolicy
  case object Error extends AmbiguityPolicy
}

/** Vertex type declaration. Reference: graflo/architecture/schema/vertex.py:431-529. */
final case class VertexDef(
    name: String,
    properties: Seq[FieldDef] = Nil,
    identity: Identity = Identity.Blank,
    secondary: Seq[SecondaryIdentity] = Nil,
    filters: Option[FilterExpr] = None,
    forceTypes: Map[String, FieldType] = Map.empty,
    semantics: Option[Semantics] = None,
    /** AUTHORED secondary indexes (db_profile.vertex_indexes). Derived
      * lookup indexes come from [[secondary]] — see [[derivedIndexes]].
      */
    indexes: Seq[IndexDef] = Nil,
    /** Physical storage-name override (db_profile.vertex_storage_names,
      * reference database_features.py:320-321: effective name defaults to
      * the logical vertex name). The sanitize cascade rewrites this
      * against a flavor's reserved words (evolution/db_profile.py:257).
      */
    storageName: Option[String] = None
) {
  /** Effective physical storage name (reference `vertex_storage_name`). */
  def effectiveStorageName: String = storageName.getOrElse(name)

  /** The reference's flat `vertex.identity` list as the normalization
    * plane sees it (vertex.py:884-902 `_normalize_vertex_identities`:
    * hash/funnel/blank vertices get the synthetic `id` field).
    */
  def identityList: Seq[String] = identity match {
    case Identity.Natural(fs)  => fs
    case Identity.Assigned(f)  => Seq(f)
    case _                     => Seq("id")
  }
  /** Every secondary identity derives a non-unique lookup index that
    * finish_init re-registers (reference database_features.py — probe:
    * secondary [email] yields a persistent unique=false index on [email]).
    */
  def derivedIndexes: Seq[IndexDef] = secondary.map(s => IndexDef(s.fields, unique = false))
  // duplicate-property merge rules (reference vertex.py:352-416): a name
  // declared twice merges typed-beats-untyped; two DIFFERENT declared types
  // conflict and raise (enforced schema-wide in GraphSchema's validation)
  private def mergedDeclared: Seq[FieldDef] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, FieldDef]
    properties.foreach { p =>
      seen.get(p.name) match {
        case None => seen += p.name -> p
        case Some(prev) => (prev.ftype, p.ftype) match {
          case (None, Some(_)) => seen += p.name -> p // typed beats untyped
          case (Some(a), Some(b)) if a != b =>
            throw new IllegalArgumentException(
              s"vertex $name: property '${p.name}' declared with conflicting types $a and $b")
          case _ => () // keep the earlier (typed or equal) declaration
        }
      }
    }
    seen.values.toSeq
  }

  /** The reference's MATERIALIZED property list (vertex.py:884-931
    * `_normalize_vertex_identities`): merged declared properties plus
    * missing identity / hash / digest-source fields appended untyped in
    * that order — including the synthetic `id` a hash/funnel/blank
    * vertex gains. The sanitize/normalize parity plane walks this list
    * (sanitize.py walks `vertex.properties`, which the reference
    * materializes at validation).
    */
  lazy val referenceProperties: Seq[FieldDef] = {
    val merged = mergedDeclared
    val declared = merged.map(_.name).toSet
    val hashFields = identity match {
      case Identity.Hash(fs) => fs
      case _                 => Nil
    }
    val digestFields = identity match {
      case Identity.Hash(fs)      => fs
      case Identity.Funnel(bs, _) => bs.flatMap(b => b.whenAllPresent ++ b.digestFields)
      case _                      => Nil
    }
    val missing = (identityList ++ hashFields ++ digestFields)
      .distinct.filterNot(declared)
    merged ++ missing.map(FieldDef(_))
  }

  /** Identity fields are auto-appended to properties (vertex.py:657-678);
    * duplicate declarations are merged typed-beats-untyped first.
    */
  lazy val allProperties: Seq[FieldDef] = {
    val merged = mergedDeclared
    val declared = merged.map(_.name).toSet
    val idFields = identity match {
      case Identity.Natural(fs)  => fs
      case Identity.Hash(fs)     => fs
      case Identity.Assigned(f)  => Seq(f)
      case Identity.Funnel(bs, _) =>
        bs.flatMap(b => b.whenAllPresent ++ b.digestFields).distinct
      case _ => Nil
    }
    merged ++ idFields.filterNot(declared).map(FieldDef(_))
  }

  /** Columns that form the merge/upsert key on the vertex DataFrame.
    * Assigned keys on its REAL field (the minted/kept UUID lives in the
    * doc, reference db_writer.py:257-276), not on the engine-synthetic id.
    */
  def idColumns: Seq[String] = identity match {
    case Identity.Natural(fs)    => fs
    case Identity.Assigned(f)    => Seq(f)
    case _                       => Seq(GraphSchema.SyntheticId)
  }

  def secondaryByName(n: String): SecondaryIdentity =
    secondary.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"vertex $name has no secondary identity '$n'"))
}

/** Extra-weight source (reference `Weight`, graflo/architecture/graph_types/
  * index_config.py:20-43 + db_writer.py:355-387): merge `fields` of the
  * STORED `vertex` collection into the edge's weight columns at write time,
  * matching on the edge's endpoint identity. Composite naming `vertex@field`
  * unless `keepVertexName = false`.
  */
final case class VertexWeightSpec(
    vertex: String,
    fields: Seq[String],
    keepVertexName: Boolean = true,
    /** "source" | "target"; None = infer from which endpoint type matches */
    endpoint: Option[String] = None
)

/** Edge identity key token: a property name, or the `source`/`target` endpoint
  * markers (reference edge.py:141-151).
  */
final case class EdgeDef(
    source: String,
    target: String,
    relation: String,
    directed: Boolean = true,
    properties: Seq[FieldDef] = Nil,
    /** uniqueness keys; "source"/"target" tokens refer to the endpoints */
    identities: Seq[String] = Seq("source", "target"),
    sourceMatch: Option[String] = None, // secondary-identity name on source
    targetMatch: Option[String] = None,
    ambiguity: AmbiguityPolicy = AmbiguityPolicy.All,
    /** extra-weight enrichment from stored vertex docs (db_writer.py:355-387) */
    extraWeights: Seq[VertexWeightSpec] = Nil,
    semantics: Option[Semantics] = None,
    /** false when the manifest declared the edge WITHOUT a relation (the
      * reference's relation=None): the strict per-relation gate must not
      * constrain data-driven relations to the synthesized default name
      * (csv-edge-weights.yaml relation_field edges).
      */
    relationDeclared: Boolean = true,
    /** The edge's PHYSICAL spec indexes (db_profile.edge_specs[].indexes):
      * None = no physical spec declared (the reference's
      * `add_edge_indexes: no physical spec for ...` refusal), Some(...) =
      * spec present with its authored index list.
      */
    specIndexes: Option[Seq[IndexDef]] = None,
    /** Physical relation-name override (db_profile.edge_specs[]
      * .relation_name, reference database_features.py:44-47): the
      * DB-specific name the sanitize cascade rewrites and the TigerGraph
      * identity normalization groups on (sanitize.py:281-290
      * `edge_relation_name(...) or edge.relation`).
      */
    relationName: Option[String] = None
) {
  /** Effective physical relation name (reference `edge_relation_name`
    * with `default_relation=edge.relation`, falling back through `or`).
    */
  def effectiveRelationName: String =
    relationName.filter(_.nonEmpty).getOrElse(relation)
  def key: EdgeKey = EdgeKey(source, target, relation)
}

final case class EdgeKey(source: String, target: String, relation: String) {
  /** stable path-safe name used by the graph store layout */
  def storeName: String = s"${source}__${relation}__${target}"
  override def toString: String = s"($source)-[$relation]->($target)"
}

/** The logical graph schema: vertex + edge declarations with the reference's
  * validation/merge hooks (graflo/architecture/schema/core.py:30-47).
  */
final case class GraphSchema(vertices: Seq[VertexDef], edges: Seq[EdgeDef] = Nil) {
  val vertexByName: Map[String, VertexDef] = vertices.map(v => v.name -> v).toMap
  val edgeByKey: Map[EdgeKey, EdgeDef]     = edges.map(e => e.key -> e).toMap

  require(vertexByName.size == vertices.size, "duplicate vertex names")
  // EdgeKey.storeName encodes (source, relation, target) as
  // "src__rel__tgt"; a "__" inside any component would make that encoding
  // ambiguous and mis-key collections read back from disk.
  vertices.foreach(v => require(!v.name.contains("__"),
    s"vertex name '${v.name}' must not contain '__' (reserved by the store layout)"))
  // surface duplicate-property TYPE conflicts at schema construction
  // (vertex.py:352-416 raises on merge) rather than first use
  vertices.foreach(_.allProperties: Unit)
  edges.foreach { e =>
    require(vertexByName.contains(e.source), s"edge $e references unknown vertex ${e.source}")
    require(vertexByName.contains(e.target), s"edge $e references unknown vertex ${e.target}")
    require(!e.relation.contains("__"),
      s"relation '${e.relation}' must not contain '__' (reserved by the store layout)")
  }

  def vertex(n: String): VertexDef =
    vertexByName.getOrElse(n, throw new IllegalArgumentException(s"unknown vertex: $n"))

  def edgesBetween(src: String, tgt: String): Seq[EdgeDef] =
    edges.filter(e => e.source == src && e.target == tgt)

  /** Schema-level set difference: drop vertices with no incident edge.
    * Reference: graflo/architecture/schema/core.py:49-55.
    */
  def removeDisconnectedVertices: GraphSchema = {
    val connected = edges.flatMap(e => Seq(e.source, e.target)).toSet
    copy(vertices = vertices.filter(v => connected(v.name)))
  }
}

object GraphSchema {
  /** Name of the synthetic identity column minted for hash/funnel/blank/assigned. */
  val SyntheticId = "_id"
  /** Lineage column (array<string>) tracking descend path. */
  val LocCol = "_loc"
  /** Per-source-row id used for edge assembly joins. */
  val RowIdCol = "_row_id"
  /** Intra-document sequence for order-sensitive merge. */
  val SeqCol = "_seq"
}
