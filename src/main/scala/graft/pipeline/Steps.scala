package graft.pipeline

import org.apache.spark.sql.Column
import graft.expr.FilterExpr

/** Actor-pipeline step declarations — the manifest plane of the engine.
  *
  * Mirrors the reference's actor configs
  * (graflo/architecture/pipeline/steps/models.py) but compiles to DataFrame
  * transformations instead of a per-document Python interpreter. Actor
  * ordering inside a level is fixed: descend < transform < vertex_router <
  * vertex < edge (reference actor/descend.py:208-216); here that ordering is
  * simply the order the compiler visits steps.
  */
sealed trait Step

/** Navigate nested documents (reference actor/descend.py:27-216).
  *  - `key = Some(k), anyKey = false`: descend into field `k`; arrays fan out
  *    (posexplode, index joins the lineage), structs just re-root.
  *  - `anyKey = true`: fan out over all keys of a struct / JSON-object column;
  *    the key itself becomes part of the lineage (used with `dress` pivots).
  *  - `key = None, anyKey = false`: iterate a top-level array column.
  * Children run per sub-document.
  */
final case class Descend(
    key: Option[String] = None,
    anyKey: Boolean = false,
    steps: Seq[Step] = Nil
) extends Step

/** Apply a named or inline transform (reference actor/transform.py:27-309).
  * `fn` resolves in [[graft.functions.TransformRegistry]] unless `inline` is
  * given. `strategy each` = unary map over input/output pairs; `single` = one
  * n-ary call producing `output.last` (scalar maps to last output).
  * `dress`: package the scalar result as `{key: <input-field>, value: result}`
  * rows — the reference's pivot/melt (transform.py:95-109).
  */
final case class TransformStep(
    fn: String = "identity",
    input: Seq[String] = Nil,
    output: Seq[String] = Nil,
    strategy: String = "each", // each | single
    inline: Option[Seq[Column] => Column] = None,
    dress: Option[(String, String)] = None, // (keyColName, valueColName)
    /** failure tolerance (reference actor/transform.py:276-294): a failed
      * per-row transform nulls the planned outputs and emits a failure record
      * (lineage + label + offending input) on the error side-channel instead
      * of aborting the batch.
      */
    errorTolerant: Boolean = false,
    label: String = "",
    /** repeated tuple-call over field groups, collision-checked outputs
      * (reference transform.py:663-678,616-661).
      */
    inputGroups: Seq[Seq[String]] = Nil,
    outputGroups: Seq[Seq[String]] = Nil
) extends Step

/** Project the current observation into a vertex document
  * (reference actor/vertex.py:22-237).
  * `from` is the rename map `{vertexField -> sourceField}`; fields absent from
  * the map pass through when `extractionScope == "full"` (vertex.py default)
  * and are dropped under `"mapped_only"`. `role` discriminates multiple
  * same-type vertices from one row (buyer/seller). `lookupOnly` marks
  * observations used for edge endpoints but excluded from the write set.
  */
final case class VertexStep(
    vertex: String,
    from: Map[String, String] = Map.empty,
    keepFields: Seq[String] = Nil,
    extractionScope: String = "full", // full | mapped_only
    filters: Option[FilterExpr] = None,
    role: Option[String] = None,
    lookupOnly: Boolean = false
) extends Step

/** Route each row to a vertex type chosen by a data value
  * (reference actor/vertex_router.py:34-168): `typeField` holds the type
  * name, `typeMap` renames data values to schema types, `perTypeFrom` gives
  * per-type projections. Compiles to a partitioned fan-out — one filtered
  * projection per target type (single scan, Catalyst merges the filters).
  */
final case class VertexRouterStep(
    typeField: String,
    typeMap: Map[String, String] = Map.empty,
    perTypeFrom: Map[String, Map[String, String]] = Map.empty,
    role: Option[String] = None,
    keepFields: Seq[String] = Nil
) extends Step

/** Declare an edge intent at the current lineage location
  * (reference actor/edge.py:57-424).
  * Static: `source`/`target` are schema vertex names. Dynamic: `sourceRole`/
  * `targetRole` point at router slots and the concrete types come from data;
  * `relationField` reads the relation name from a data column with
  * `relationMap` renames and `relation` as the static fallback.
  * `casting` overrides PAIR/PRODUCT/COMBINATIONS selection (default "auto"
  * mirrors `_choose_casting`, edge_render.py:215-228); `zip` is the
  * positional-zip fallback (db_writer.py:314-349) pairing i-th source with
  * i-th target across parallel sibling arrays.
  */
final case class EdgeStep(
    source: String = "",
    target: String = "",
    relation: String = "",
    sourceRole: Option[String] = None,
    targetRole: Option[String] = None,
    relationField: Option[String] = None,
    relationMap: Map[String, String] = Map.empty,
    /** `relation_from_key` (reference edge_derivation.py:60 +
      * edge_render.py:231-245): the per-pair relation is the last descend
      * KEY on the deeper endpoint's lineage ('-'→'_'); pairs with no such
      * key render no edge (the reference `continue`) — debian-eco.yaml's
      * package→package dependency edges.
      */
    relationFromKey: Boolean = false,
    casting: String = "auto", // auto | pair | product | combinations | zip
    weightFields: Seq[String] = Nil,
    sourceMatch: Option[String] = None,
    targetMatch: Option[String] = None,
    /** exclude_source / exclude_target (edge_derivation.py:44-51): drop
      * endpoint observations whose lineage passes through the named key.
      */
    excludeSource: Option[String] = None,
    excludeTarget: Option[String] = None,
    /** location-group selectors (reference manifest `match_source` /
      * `match_target` / `match`, kg.yaml pattern): restrict an endpoint's
      * buckets to observations made under the named descend key.
      */
    sourceGroup: Option[String] = None,
    targetGroup: Option[String] = None
) extends Step

/** Several edges from one flat row (reference edge.py:80-104 `links:`). */
final case class MultiEdgeStep(links: Seq[EdgeStep]) extends Step

/** Rename fields in place (reference manifest `transform: {rename: {a: b}}`,
  * contract/ingestion/steps/models.py rename form).
  */
final case class RenameStep(renames: Map[String, String]) extends Step

/** `target: keys` — apply a NAME function to column names with
  * all/include/exclude selection (reference contract/ingestion/transform.py
  * KeySelectionConfig + runtime actor/transform.py:739-761). Collisions
  * throw, matching the reference's key-collision validation.
  */
final case class RenameKeysStep(
    fn: String,
    mode: String = "all", // all | include | exclude
    names: Seq[String] = Nil
) extends Step

/** Top-level per-field type casters (reference util/casting.py:9-59, applied
  * runtime/resource.py:316-319).
  */
final case class CastStep(types: Map[String, String]) extends Step

/** A named resource: one input DataFrame through an actor pipeline.
  * Reference: graflo/architecture/contract/ingestion/resource.py:122.
  */
final case class ResourceDef(
    name: String,
    steps: Seq[Step],
    /** drop None/"" top-level fields (runtime/resource.py:32-35), opt-in */
    dropTrivialFields: Boolean = false,
    /** edge-inference selectors (contract/ingestion/resource.py:63-88) */
    inferEdges: Boolean = true,
    inferEdgeOnly: Seq[(String, String)] = Nil,
    inferEdgeExcept: Seq[(String, String)] = Nil,
    /** error budget: abort when more than this many documents produced
      * tolerated failures (reference `max_doc_errors`,
      * ingestion_parameters.py:199-209).
      */
    maxDocErrors: Option[Long] = None
)
