package graft.evolve

import scala.collection.immutable.VectorMap

import com.fasterxml.jackson.databind.JsonNode

import graft.model._
import Rewrite._

/** Manifest documents for the evolution cascade: Jackson trees → the
  * ordered document value model [[Rewrite]] operates on.
  */
object DocJson {
  import scala.jdk.CollectionConverters._

  def toDoc(n: JsonNode): Any = {
    if (n == null || n.isNull) null
    else if (n.isObject)
      VectorMap.from(n.properties().asScala.map(e => e.getKey -> toDoc(e.getValue)))
    else if (n.isArray) n.elements().asScala.map(toDoc).toVector
    else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()
  }

  private lazy val yaml = new com.fasterxml.jackson.databind.ObjectMapper(
    new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())

  def parseYamlDoc(text: String): Any = toDoc(yaml.readTree(text))
}

/** One vertex's identity replacement (reference IdentityReplacement,
  * ops.py:200-246): the new identity, the retire policy for the old
  * field-set, and the endpoint policy for edge steps that matched on the
  * primary identity.
  */
final case class IdentityReplacementSpec(
    to: Identity,
    retire: String = "demote",
    retireAs: Option[String] = None,
    endpoints: String = "follow_new") {
  require(Set("demote", "keep", "drop")(retire),
    s"replace_identity: retire must be demote|keep|drop, got '$retire'")
  require(Set("follow_new", "pin_to_retired")(endpoints),
    s"replace_identity: endpoints must be follow_new|pin_to_retired, got '$endpoints'")
  if (endpoints == "pin_to_retired" && retire != "demote")
    throw new IllegalArgumentException(
      "endpoints: pin_to_retired requires retire: demote — there is no " +
        "retired secondary identity to pin to otherwise")
  if (retireAs.isDefined && retire != "demote")
    throw new IllegalArgumentException("retire_as is only meaningful with retire: demote")
}

/** Evolution ops at the REFERENCE's granularity (ops.py:50-928), each
  * carrying the manifest-wide cascade: schema mutation plus the ingestion
  * -model / bindings rewrite the reference's `apply_evolution` performs
  * (apply.py, rewrite.py, identity.py, structure.py). [[EvolutionOp]] stays
  * the fine-grained schema-plane vocabulary; a [[CascadeOp]] is what a
  * migration actually ships.
  */
sealed trait CascadeOp { def opToken: String }

object CascadeOp {
  final case class RenameVertices(vertices: Seq[(String, String)]) extends CascadeOp {
    val opToken = "rename_vertices" }
  final case class RemoveVertices(names: Seq[String]) extends CascadeOp {
    val opToken = "remove_vertices" }
  final case class MergeVertices(sources: Seq[String], into: String,
      allowSelfRelations: Boolean = false, allowRowFusion: Boolean = false) extends CascadeOp {
    val opToken = "merge_vertices" }
  final case class RenameVertexProperties(renames: Seq[(String, Seq[(String, String)])]) extends CascadeOp {
    val opToken = "rename_vertex_properties" }
  final case class RemoveVertexProperties(removals: Seq[(String, Seq[String])]) extends CascadeOp {
    val opToken = "remove_vertex_properties" }
  final case class AddVertexProperties(additions: Seq[(String, Seq[String])]) extends CascadeOp {
    val opToken = "add_vertex_properties" }
  final case class RenameRelations(relations: Seq[(String, String)]) extends CascadeOp {
    val opToken = "rename_relations" }
  final case class RenameResources(resources: Seq[(String, String)]) extends CascadeOp {
    val opToken = "rename_resources" }
  final case class RemoveEdges(relations: Seq[String]) extends CascadeOp {
    val opToken = "remove_edges" }
  final case class MergeEdges(sources: Seq[String], into: String) extends CascadeOp {
    val opToken = "merge_edges" }
  final case class RenameEdgeProperties(renames: Seq[(String, Seq[(String, String)])]) extends CascadeOp {
    val opToken = "rename_edge_properties" }
  final case class RemoveEdgeProperties(removals: Seq[(String, Seq[String])]) extends CascadeOp {
    val opToken = "remove_edge_properties" }
  final case class AddInverseEdges(relations: Seq[(String, String)]) extends CascadeOp {
    val opToken = "add_inverse_edges" }
  final case class ReplaceIdentityC(vertices: Seq[(String, IdentityReplacementSpec)]) extends CascadeOp {
    val opToken = "replace_identity" }
  final case class RetargetEdges(edges: Seq[(EdgeKey, String, String)]) extends CascadeOp {
    val opToken = "retarget_edges" }
  /** reference SanitizeOp (apply.py:1368-1407 apply_sanitize): reserved
    * vertex fields rename to `<name>_attr` (then `_attr_N` while still
    * reserved, db/util.py:309-374 sanitize_attribute_name, whole-name
    * case-insensitive match) and the rename rides the
    * [[RenameVertexProperties]] cascade — the same pinned from:-map path.
    *
    * `reservedWords = None` loads the FLAVOR DEFAULT set
    * ([[SanitizeRules.defaultReserved]] — non-empty only for tigergraph);
    * an explicit list replaces the defaults, but an explicit EMPTY list
    * on tigergraph falls back to them (db_profile.py `effective_reserved
    * = reserved or defaults`). On tigergraph the identifier rules also
    * run regardless of the word list: invalid chars → `__`, forbidden
    * `gsql_sys_` prefix → `tg_` prepend, THEN the reserved check
    * (sanitize_tigergraph_identifier). Executed-parity: `san_*` and
    * `san_default_*` fixture cases.
    */
  final case class SanitizeFields(reservedWords: Option[Seq[String]],
      dbFlavor: String = "") extends CascadeOp {
    val opToken = "sanitize" }
  object SanitizeFields {
    /** legacy explicit-list face */
    def apply(reservedWords: Seq[String]): SanitizeFields =
      SanitizeFields(Some(reservedWords), "")
  }
  final case class ProjectManifest(keepVertices: Option[Seq[String]] = None,
      keepEdges: Option[Seq[EdgeKey]] = None, prune: Boolean = true,
      keepResources: Option[Seq[String]] = None) extends CascadeOp {
    val opToken = "project_manifest" }

  /** reference ops.py:992-1008 INGESTION_REWRITING_OPS. */
  val IngestionRewritingOps: Set[String] = Set(
    "add_inverse_edges", "merge_edges", "merge_vertices", "project_manifest",
    "remove_edges", "remove_vertex_properties", "remove_vertices",
    "rename_relations", "rename_resources", "rename_vertex_properties",
    "rename_vertices", "replace_identity", "sanitize")

  /** reference ops.py:1010-1017 `ops_reaching_ingestion`. */
  def opsReachingIngestion(ops: Seq[CascadeOp]): Seq[String] =
    ops.map(_.opToken).filter(IngestionRewritingOps)
}

/** The manifest as the cascade sees it: the TYPED schema plane plus the
  * ingestion/bindings DOCUMENT plane (the reference keeps
  * `Resource.pipeline` as raw dicts and rewrites the dicts — resource.py
  * `pipeline: list[dict[str, Any]]`).
  */
final case class ManifestState(
    schema: GraphSchema,
    ingestion: Obj, // {"resources": [...], "transforms": [...]}
    bindings: Obj)  // {"connectors": [...], "resource_connector": [...]}

/** The evolution ingestion-model cascade — the reference's
  * `apply_evolution` (apply.py:1534-1563) with every ingestion/bindings
  * side effect: pipeline `from:`-map rewrites on property renames,
  * resource pruning on vertex removal, `endpoints: pin_to_retired`
  * edge-step rewrites, transform rename-map rewrites, relation/edge-id
  * removal pruning, inverse-edge appends, resource renames, projection
  * keep_resources. Executed parity: `ReferenceRewriteParitySpec`.
  */
object ManifestEvolution {
  import CascadeOp._

  def evolve(state: ManifestState, ops: Seq[CascadeOp]): ManifestState =
    ops.foldLeft(state)(applyOne)

  /** Evolve a whole YAML manifest and re-load it as a runnable
    * [[graft.manifest.GraphManifest]]: the cascade rewrites the ingestion
    * document, the typed schema carries the schema-plane ops, and the
    * evolved document round-trips through the manifest loader (the
    * cascade emits loader-parsable normalized step forms). Step-level
    * `vertex_weights` that attach to schema edges at load time are the
    * original schema's concern and are not re-attached here.
    */
  def evolveManifest(yamlText: String, ops: Seq[CascadeOp]): graft.manifest.GraphManifest = {
    val loaded = graft.manifest.ManifestLoader.fromYamlString(yamlText)
    val root = asObj(DocJson.parseYamlDoc(yamlText)).getOrElse(EmptyObj)
    val im = asObj(root.getOrElse("ingestion_model", null)).getOrElse(EmptyObj)
    val b = asObj(root.getOrElse("bindings", null)).getOrElse(EmptyObj)
    val st = evolve(ManifestState(loaded.schema, im, b), ops)
    val json = SchemaContext.serializeCompact(VectorMap[String, Any](
      "schema" -> VectorMap[String, Any](
        "metadata" -> VectorMap[String, Any]("name" -> loaded.name)),
      "ingestion_model" -> st.ingestion))
    // the typed bindings follow the cascade: resource renames compose in
    // op order, then rows prune to the surviving resources — a renamed
    // resource keeps its connector, a dropped one loses its row
    val finalName: String => String = orig =>
      ops.collect { case RenameResources(rs) => rs.toMap }
        .foldLeft(orig)((n, m) => m.getOrElse(n, n))
    val survivors = asArr(st.ingestion.getOrElse("resources", Vector()))
      .getOrElse(Vector()).flatMap(r =>
        asObj(r).flatMap(rd => asStr(rd.getOrElse("name", null)))).toSet
    val bindings = loaded.bindings
      .map(b => b.copy(resource = finalName(b.resource)))
      .filter(b => survivors(b.resource))
    graft.manifest.ManifestLoader.fromJsonString(json)
      .copy(name = loaded.name, schema = st.schema, bindings = bindings)
  }

  // -------------------------------------------------------------- helpers

  /** apply_storage_name_sanitization_to_db_profile (evolution/
    * db_profile.py:257-321): vertex storage names sanitize with the
    * `_vertex` suffix; edge relation names sanitize with `_relation` and
    * then dedupe against the POST-vertex-pass storage-name set — an
    * UNCHANGED relation name colliding with a vertex storage name still
    * gains the `_relation` suffix (and `_relation_1`, ... while taken).
    * Relation-less edges are skipped (`if not edge.relation: continue`).
    */
  private def sanitizeStorageNames(schema: GraphSchema,
      sanitize: (String, String) => String): GraphSchema = {
    val s = schema.copy(vertices = schema.vertices.map { v =>
      val dbname = v.effectiveStorageName
      val sanitized = sanitize(dbname, "_vertex")
      if (sanitized != dbname) v.copy(storageName = Some(sanitized)) else v
    })
    val vertexStorageNames = s.vertices.map(_.effectiveStorageName).toSet
    s.copy(edges = s.edges.map { e =>
      if (!e.relationDeclared || e.relation.isEmpty) e
      else {
        val original = e.effectiveRelationName
        var sanitized = sanitize(original, "_relation")
        if (vertexStorageNames(sanitized)) {
          val base = sanitized + "_relation"
          var candidate = base
          var counter = 1
          while (vertexStorageNames(candidate)) {
            candidate = s"${base}_$counter"; counter += 1
          }
          sanitized = candidate
        }
        if (sanitized != original)
          // set_edge_name_spec creates the physical spec when absent
          // (database_features.py:440-460)
          e.copy(relationName = Some(sanitized),
            specIndexes = Some(e.specIndexes.getOrElse(Nil)))
        else e
      }
    })
  }

  private def resources(im: Obj): Vector[Obj] =
    asArr(im.getOrElse("resources", Vector())).getOrElse(Vector())
      .flatMap(asObj(_))

  private def withResources(im: Obj, rs: Vector[Obj]): Obj =
    im.updated("resources", rs.asInstanceOf[Vector[Any]])

  private def pipelineOf(r: Obj): Vector[Any] =
    asArr(r.getOrElse("pipeline", r.getOrElse("apply", Vector()))).getOrElse(Vector())

  private def pipelineKey(r: Obj): String = if (r.contains("pipeline")) "pipeline" else "apply"

  private def strArr(x: Any): Vector[String] =
    asArr(x).getOrElse(Vector()).collect { case s: String => s }

  /** apply.py:559-591 `_rebuild_ingestion_with_pipeline_rewrite`. */
  private def rebuildWithPipelineRewrite(im: Obj,
      rewriter: Vector[Any] => Vector[Any],
      vertexFieldRenames: Map[String, Seq[(String, String)]] = Map.empty): Obj =
    withResources(im, resources(im).map { r =>
      var out = r.updated(pipelineKey(r), rewriter(pipelineOf(r)))
      if (vertexFieldRenames.nonEmpty) asArr(out.getOrElse("extra_weights", null)).foreach { ew =>
        out = out.updated("extra_weights",
          rewriteExtraWeightsVertexFieldNames(ew, vertexFieldRenames))
      }
      out
    })

  /** The reference's Transform model rejects a payload-less transform when
    * the evolved manifest re-validates ("Either input/output, fields, map
    * or name must be provided" — executed truth, `ri_drop_empties_transform`):
    * the property-removal cascade can empty a transform's rename map.
    */
  private def validateTransforms(im: Obj): Unit = {
    def check(steps: Vector[Any]): Unit = steps.foreach(s => asObj(s).foreach { sd =>
      val n = asObj(normalizeActorStep(sd)).get
      asStr(n.getOrElse("type", null)) match {
        case Some("transform") =>
          val rename = asObj(n.getOrElse("rename", null))
          // "foo" is the reference Transform model's FUNCTION-NAME field
          // (named-transform declarations), not a placeholder
          val hasOther = Seq("name", "fields", "map", "input", "output", "call",
            "use", "foo", "module").exists(n.contains)
          if (rename.exists(_.isEmpty) && !hasOther)
            throw new IllegalArgumentException(
              "transform step left without payload: either input/output, " +
                "fields, map or name must be provided")
        case Some("descend") =>
          asArr(n.getOrElse("pipeline", null)).foreach(check)
        case _ =>
      }
    })
    resources(im).foreach(r => check(pipelineOf(r)))
  }

  /** apply.py:147-165 `_filter_bindings_for_resources` (resource_connector
    * rows only — `connectors` keeps its catalog).
    */
  private def filterBindings(b: Obj, surviving: Set[String]): Obj =
    asArr(b.getOrElse("resource_connector", null)) match {
      case None => b
      case Some(rc) => b.updated("resource_connector", rc.filter(e =>
        asObj(e).exists(ed =>
          ed.get("resource").collect { case s: String => s }.exists(surviving))))
    }

  /** apply.py:734-905 `_apply_rename_entities`, ingestion + bindings half. */
  private def renameEntities(im: Obj, b: Obj,
      vertexMap: Map[String, String] = Map.empty,
      edgeMap: Map[String, String] = Map.empty,
      resourceMap: Map[String, String] = Map.empty): (Obj, Obj) = {
    val newIm = withResources(im, resources(im).map { r0 =>
      var r = r0
      asStr(r.getOrElse("name", null)).foreach(n =>
        r = r.updated("name", resourceMap.getOrElse(n, n)))
      r = r.updated(pipelineKey(r),
        rewriteEntityNamesInPipeline(pipelineOf(r), vertexMap, edgeMap))
      // merge_collections holds vertex names; collect_vertex_names counts
      // them, so leaving them behind strands the reference
      asArr(r.getOrElse("merge_collections", null)).foreach { mc =>
        r = r.updated("merge_collections", mc.map {
          case s: String => vertexMap.getOrElse(s, s); case x => x
        })
      }
      Seq("infer_edge_only", "infer_edge_except").foreach { key =>
        asArr(r.getOrElse(key, null)).foreach { specs =>
          r = r.updated(key, specs.map { spec =>
            asObj(spec) match {
              case None => spec
              case Some(sd0) =>
                var sd = sd0
                asStr(sd.getOrElse("source", null)).foreach(s =>
                  sd = sd.updated("source", vertexMap.getOrElse(s, s)))
                asStr(sd.getOrElse("target", null)).foreach(s =>
                  sd = sd.updated("target", vertexMap.getOrElse(s, s)))
                asStr(sd.getOrElse("relation", null)).foreach(s =>
                  sd = sd.updated("relation", edgeMap.getOrElse(s, s)))
                sd
            }
          })
        }
      }
      asArr(r.getOrElse("extra_weights", null)).foreach { ew =>
        r = r.updated("extra_weights", ew.map { entry =>
          asObj(entry) match {
            case None => entry
            case Some(ed0) =>
              var ed = ed0
              asObj(ed.getOrElse("edge", null)).foreach { e0 =>
                var e = e0
                asStr(e.getOrElse("source", null)).foreach(s =>
                  e = e.updated("source", vertexMap.getOrElse(s, s)))
                asStr(e.getOrElse("target", null)).foreach(s =>
                  e = e.updated("target", vertexMap.getOrElse(s, s)))
                asStr(e.getOrElse("relation", null)).foreach(s =>
                  e = e.updated("relation", edgeMap.getOrElse(s, s)))
                // vertex_weights[].name is a vertex name on the entry and
                // on its nested edge alike
                e = rewriteVertexWeightNames(e, n => vertexMap.getOrElse(n, n))
                ed = ed.updated("edge", e)
              }
              rewriteVertexWeightNames(ed, n => vertexMap.getOrElse(n, n))
          }
        })
      }
      r
    })
    var newB = b
    asArr(b.getOrElse("connectors", null)).foreach { cs =>
      newB = newB.updated("connectors", cs.map { c =>
        asObj(c) match {
          case Some(cd) => cd.get("resource_name") match {
            case Some(n: String) => cd.updated("resource_name", resourceMap.getOrElse(n, n))
            case _ => cd
          }
          case None => c
        }
      })
    }
    asArr(b.getOrElse("resource_connector", null)).foreach { rc =>
      newB = newB.updated("resource_connector", rc.map { m =>
        asObj(m) match {
          case Some(md) => md.get("resource") match {
            case Some(n: String) => md.updated("resource", resourceMap.getOrElse(n, n))
            case _ => md
          }
          case None => m
        }
      })
    }
    (newIm, newB)
  }

  /** apply.py:168-184 `_edge_id_from_resource_spec`. */
  private def edgeIdFromSpec(spec: Any): Option[EdgeIdKey] =
    asObj(spec).flatMap { sd =>
      asObj(sd.getOrElse("edge", null)) match {
        case Some(e) =>
          (asStr(e.getOrElse("source", null)).orElse(asStr(e.getOrElse("from", null))),
            asStr(e.getOrElse("target", null)).orElse(asStr(e.getOrElse("to", null)))) match {
            case (Some(s), Some(t)) => Some((s, t, asStr(e.getOrElse("relation", null))))
            case _ => None
          }
        case None =>
          (asStr(sd.getOrElse("source", null)), asStr(sd.getOrElse("target", null))) match {
            case (Some(s), Some(t)) => Some((s, t, asStr(sd.getOrElse("relation", null))))
            case _ => None
          }
      }
    }

  /** apply.py:112-144 `_prune_ingestion_for_removed_vertices`: drop
    * resources referencing removed vertices (pipeline mention OR the wider
    * actor-plane reference set that includes edge vertex_weights names),
    * drop resources left referencing NO vertices, filter merge_collections,
    * abort when nothing survives.
    */
  private def pruneForRemovedVertices(im: Obj, removed: Set[String]): Obj = {
    // a resource that references NO vertex types at all (transform-only)
    // is dropped too — apply.py:128-130's "no actor references any
    // vertex" check runs on every resource the mention check kept
    def referencesAnyVertex(steps: Vector[Any]): Boolean =
      steps.exists(step => asObj(step).exists { sd =>
        val s = asObj(normalizeActorStep(sd)).get
        asStr(s.getOrElse("type", null)).getOrElse("") match {
          case "vertex" => asStr(s.getOrElse("vertex", null)).isDefined
          case "vertex_router" =>
            asObj(s.getOrElse("type_map", null)).exists(_.values.exists(_.isInstanceOf[String])) ||
              asObj(s.getOrElse("vertex_from_map", null)).exists(_.nonEmpty)
          case "edge" => Seq("source", "from", "target", "to")
            .exists(k => asStr(s.getOrElse(k, null)).isDefined)
          case "descend" =>
            asArr(s.getOrElse("pipeline", null)).exists(referencesAnyVertex)
          case _ => false
        }
      })
    val kept = resources(im).filterNot { r =>
      val pl = pipelineOf(r)
      pipelineMentionsAnyVertex(pl, removed) || !referencesAnyVertex(pl)
    }.map { r =>
      asArr(r.getOrElse("merge_collections", null)) match {
        case Some(mc) => r.updated("merge_collections", mc.filterNot {
          case s: String => removed(s); case _ => false
        })
        case None => r
      }
    }
    if (kept.isEmpty) throw new IllegalArgumentException(
      "remove_vertices would leave ingestion_model.resources empty; aborting.")
    withResources(im, kept)
  }

  /** apply.py:187-209 `_apply_keep_resources`. */
  private def applyKeepResources(im: Obj, b: Obj, allowed: Set[String]): (Obj, Obj) = {
    val present = resources(im).flatMap(r => asStr(r.getOrElse("name", null))).toSet
    val missing = (allowed -- present).toSeq.sorted
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"keep_resources not found on ingestion_model: ${missing.mkString("[", ", ", "]")}")
    val kept = resources(im).filter(r =>
      asStr(r.getOrElse("name", null)).exists(allowed))
    if (kept.isEmpty) throw new IllegalArgumentException(
      "project_manifest would leave ingestion_model.resources empty; aborting.")
    (withResources(im, kept), filterBindings(b, allowed))
  }

  /** apply.py:333-369 `_merged_name_step_counts`: pipeline levels where the
    * merged name is produced by more than one step (row fusion).
    */
  private def mergedNameStepCounts(steps: Vector[Any], merged: String,
      path: String = "pipeline"): Vector[String] = {
    val hits = scala.collection.mutable.ArrayBuffer.empty[String]
    var produced = 0
    steps.zipWithIndex.foreach { case (step, index) =>
      asObj(step).foreach { sd =>
        val s = asObj(normalizeActorStep(sd)).get
        asStr(s.getOrElse("type", null)).getOrElse("") match {
          case "vertex" =>
            if (asStr(s.getOrElse("vertex", null)).contains(merged)) produced += 1
          case "vertex_router" =>
            if (asObj(s.getOrElse("type_map", null))
              .exists(_.values.exists(_ == merged))) produced += 1
          case "descend" =>
            asArr(s.getOrElse("pipeline", null)).foreach(sub =>
              hits ++= mergedNameStepCounts(sub, merged, s"$path[$index].pipeline"))
          case _ =>
        }
      }
    }
    if (produced > 1) hits += s"$path ($produced steps produce '$merged')"
    hits.toVector
  }

  /** apply.py:309-330 `_rewrite_ingestion_for_merge`. */
  private def rewriteIngestionForMerge(im: Obj, mapping: Map[String, String]): Obj =
    withResources(im, resources(im).map { r0 =>
      var r = r0
      r = r.updated(pipelineKey(r), rewriteVertexNamesInPipeline(pipelineOf(r), mapping))
      asArr(r.getOrElse("merge_collections", null)).foreach { mc =>
        r = r.updated("merge_collections", mc.map {
          case s: String => mapping.getOrElse(s, s); case x => x
        })
      }
      // reference: `if d.get(...)` — empty lists are falsy and untouched
      Seq("infer_edge_only", "infer_edge_except", "extra_weights").foreach { key =>
        asArr(r.getOrElse(key, null)).foreach { xs =>
          if (xs.nonEmpty)
            r = r.updated(key, rewriteVertexNamesInValue(xs, mapping))
        }
      }
      r
    })

  /** identity.py:140-159 `_demoted_secondary_identities` naming rules:
    * reuse an existing secondary with the same field-set, reject a name
    * collision, else mint `retire_as`/"retired_identity".
    */
  private def retiredNameFor(v: VertexDef, spec: IdentityReplacementSpec,
      oldIdentity: Seq[String]): String = {
    val requested = spec.retireAs.getOrElse("retired_identity")
    val oldSet = oldIdentity.toSet
    v.secondary.find(_.fields.toSet == oldSet) match {
      case Some(existing) => if (existing.name.nonEmpty) existing.name else requested
      case None =>
        v.secondary.find(_.name == requested).foreach { clash =>
          throw new IllegalArgumentException(
            s"replace_identity: vertex '${v.name}' already declares a secondary " +
              s"identity named '$requested' with fields ${clash.fields}; " +
              "pass a different retire_as")
        }
        requested
    }
  }

  private def naturalFields(i: Identity): Seq[String] = i match {
    case Identity.Natural(fs) => fs
    case _                    => Nil
  }

  // ------------------------------------------------------------- dispatch

  private def applyOne(state: ManifestState, op: CascadeOp): ManifestState = op match {

    case RenameVertices(vs) =>
      val typed = EvolutionOp.RenameVertices(vs.toMap)
      val schema = typed(state.schema)
      val (im, b) = renameEntities(state.ingestion, state.bindings, vertexMap = vs.toMap)
      ManifestState(schema, im, b)

    case RenameRelations(rs) =>
      val typed = EvolutionOp.RenameRelations(rs.toMap)
      val schema = typed(state.schema)
      val (im, b) = renameEntities(state.ingestion, state.bindings, edgeMap = rs.toMap)
      ManifestState(schema, im, b)

    case RenameResources(rs) =>
      // apply.py:999-1008 guards: unknown sources error; targets colliding
      // with resources staying put error
      val existing = resources(state.ingestion)
        .flatMap(r => asStr(r.getOrElse("name", null))).toSet
      val unknown = rs.map(_._1).filterNot(existing).sorted
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"rename_resources: unknown resources: ${unknown.mkString("[", ", ", "]")}")
      val surviving = existing -- rs.map(_._1)
      val collisions = rs.collect { case (f, t) if surviving(t) => s"'$f' -> '$t'" }.sorted
      if (collisions.nonEmpty) throw new IllegalArgumentException(
        "rename_resources: renamed resources collide with existing ones: " +
          collisions.mkString("[", ", ", "]"))
      val (im, b) = renameEntities(state.ingestion, state.bindings, resourceMap = rs.toMap)
      state.copy(ingestion = im, bindings = b)

    case RemoveVertices(names) =>
      val removed = names.toSet
      val known = state.schema.vertices.map(_.name).toSet
      val missing = (removed -- known).toSeq.sorted
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"Unknown vertices to remove: ${missing.mkString("[", ", ", "]")}")
      val schema = names.foldLeft(state.schema)((s, n) => EvolutionOp.RemoveVertex(n)(s))
      val im = pruneForRemovedVertices(state.ingestion, removed)
      val surviving = resources(im).flatMap(r => asStr(r.getOrElse("name", null))).toSet
      ManifestState(schema, im, filterBindings(state.bindings, surviving))

    case MergeVertices(sources, into, allowSelf, allowFusion) =>
      // reference error precedence (apply.py:431-485): vertex-config errors,
      // then ingestion-rewrite errors, then self-relations, then row fusion
      val beforeEdges = state.schema.edges
      val schema = EvolutionOp.MergeVertices(sources, into,
        allowSelfRelations = true, allowRowFusion = true)(state.schema)
      val m = sources.map(_ -> into).toMap
      val im = rewriteIngestionForMerge(state.ingestion, m)
      val selfRelations = beforeEdges.filter(e => e.source != e.target &&
        m.getOrElse(e.source, e.source) == m.getOrElse(e.target, e.target))
        .map(e => s"(${e.source}, ${e.target}, ${e.relation})").sorted
      if (selfRelations.nonEmpty && !allowSelf) throw new IllegalArgumentException(
        s"merge_vertices: merging ${sources.sorted.mkString("[", ", ", "]")} into " +
          s"'$into' turns edges into self-relations: ${selfRelations.mkString("; ")}. " +
          "Remove or retarget those edges first, or set allow_self_relations=true.")
      val fused = resources(im).flatMap { r =>
        val name = asStr(r.getOrElse("name", null)).getOrElse("")
        mergedNameStepCounts(pipelineOf(r), into).map(h => s"$name: $h")
      }
      if (fused.nonEmpty && !allowFusion) throw new IllegalArgumentException(
        s"merge_vertices: merging ${sources.sorted.mkString("[", ", ", "]")} into " +
          s"'$into' leaves pipeline levels producing '$into' more than once: " +
          s"${fused.mkString("; ")}. Split the resource, or set allow_row_fusion=true.")
      ManifestState(schema, im, state.bindings)

    case RenameVertexProperties(renames) =>
      val known = state.schema.vertices.map(_.name).toSet
      val unknown = renames.map(_._1).filterNot(known).sorted
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"rename_vertex_properties: unknown vertices in renames: ${unknown.mkString("[", ", ", "]")}")
      // atomic per-vertex field rename (apply.py:501-556 _rename_fields_in_schema)
      val byVertex = renames.toMap
      val schema = state.schema.copy(vertices = state.schema.vertices.map { v =>
        byVertex.get(v.name).filter(_.nonEmpty) match {
          case None => v
          case Some(per) =>
            val perMap = per.toMap
            def ren(f: String) = perMap.getOrElse(f, f)
            def renList(fs: Seq[String]) = fs.map(ren).distinct
            v.copy(
              properties = {
                val seen = scala.collection.mutable.LinkedHashMap.empty[String, FieldDef]
                v.properties.foreach { p =>
                  val nn = ren(p.name)
                  if (!seen.contains(nn)) seen(nn) = p.copy(name = nn)
                }
                seen.values.toSeq
              },
              identity = v.identity match {
                case Identity.Natural(fs)   => Identity.Natural(renList(fs))
                case Identity.Hash(fs)      => Identity.Hash(renList(fs))
                case Identity.Assigned(f)   => Identity.Assigned(ren(f))
                case Identity.Funnel(bs, mk) => Identity.Funnel(bs.map(bb =>
                  bb.copy(whenAllPresent = renList(bb.whenAllPresent),
                    digestFields = renList(bb.digestFields))), mk)
                case other => other
              },
              secondary = v.secondary.map(s => s.copy(fields = renList(s.fields))))
        }
      })
      val renMap = renames.map { case (v, per) => v -> per }.toMap
      val im = rebuildWithPipelineRewrite(state.ingestion,
        pl => rewriteVertexFieldNamesInPipeline(pl, renMap),
        vertexFieldRenames = renMap)
      ManifestState(schema, im, state.bindings)

    case RemoveVertexProperties(removals) =>
      val known = state.schema.vertices.map(_.name).toSet
      val unknown = removals.map(_._1).filterNot(known).sorted
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"remove_vertex_properties: unknown vertices in removals: ${unknown.mkString("[", ", ", "]")}")
      val schema = removals.foldLeft(state.schema) { case (s, (v, fields)) =>
        fields.foldLeft(s)((s2, f) => EvolutionOp.RemoveProperty(v, f)(s2))
      }
      val remMap = removals.map { case (v, fs) => v -> fs.toSet }.toMap
      var im = rebuildWithPipelineRewrite(state.ingestion,
        pl => rewriteRemoveVertexPropertiesInPipeline(pl, remMap))
      // apply.py:708-731 extra_weights prune per weight.name
      im = withResources(im, resources(im).map { r =>
        asArr(r.getOrElse("extra_weights", null)) match {
          case None => r
          case Some(ew) => r.updated("extra_weights", ew.map { entry =>
            asObj(entry) match {
              case None => entry
              case Some(ed) => asArr(ed.getOrElse("vertex_weights", null)) match {
                case None => ed
                case Some(ws) => ed.updated("vertex_weights", ws.map { w =>
                  asObj(w) match {
                    case Some(wd) =>
                      asStr(wd.getOrElse("name", null)).map(remMap.getOrElse(_, Set.empty[String])) match {
                        case Some(removed) if removed.nonEmpty =>
                          var out = wd
                          asArr(out.getOrElse("fields", null)).foreach(fs =>
                            out = out.updated("fields", fs.filterNot {
                              case s: String => removed(s); case _ => false
                            }))
                          asObj(out.getOrElse("map", null)).foreach(m =>
                            out = out.updated("map", m.filter { case (k, _) => !removed(k) }))
                          asObj(out.getOrElse("filter", null)).foreach(f =>
                            out = out.updated("filter", f.filter { case (k, _) => !removed(k) }))
                          out
                        case _ => wd
                      }
                    case None => w
                  }
                })
              }
            }
          })
        }
      })
      validateTransforms(im)
      ManifestState(schema, im, state.bindings)

    case AddVertexProperties(additions) =>
      val known = state.schema.vertices.map(_.name).toSet
      val unknown = additions.map(_._1).filterNot(known).sorted
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"add_vertex_properties: unknown vertices: ${unknown.mkString("[", ", ", "]")}")
      val schema = additions.foldLeft(state.schema) { case (s, (v, fields)) =>
        fields.foldLeft(s) { (s2, f) =>
          if (s2.vertex(v).properties.exists(_.name == f)) s2
          else EvolutionOp.AddProperty(v, FieldDef(f))(s2)
        }
      }
      state.copy(schema = schema)

    case RemoveEdges(relations) =>
      val removed = relations.toSet
      val schema = state.schema.copy(
        edges = state.schema.edges.filterNot(e => removed(e.relation)))
      val im = withResources(state.ingestion, resources(state.ingestion).map { r0 =>
        var r = r0
        r = r.updated(pipelineKey(r),
          rewriteRemoveRelationsInPipeline(pipelineOf(r), removed))
        Seq("infer_edge_only", "infer_edge_except").foreach { key =>
          asArr(r.getOrElse(key, null)).foreach { specs =>
            r = r.updated(key, specs.filterNot(spec => asObj(spec).exists(sd =>
              asStr(sd.getOrElse("relation", null)).exists(removed))))
          }
        }
        asArr(r.getOrElse("extra_weights", null)).foreach { ew =>
          r = r.updated("extra_weights", ew.filterNot(entry => asObj(entry).exists(ed =>
            asObj(ed.getOrElse("edge", null)).exists(e =>
              asStr(e.getOrElse("relation", null)).exists(removed)))))
        }
        r
      })
      ManifestState(schema, im, state.bindings)

    case MergeEdges(sources, into) =>
      if (sources.contains(into)) throw new IllegalArgumentException(
        "merge_edges: `sources` must not include `into`")
      val schema = EvolutionOp.MergeEdges(sources, into)(state.schema)
      val relationMap = sources.map(_ -> into).toMap
      val (im, b) = renameEntities(state.ingestion, state.bindings, edgeMap = relationMap)
      ManifestState(schema, im, b)

    case RenameEdgeProperties(renames) =>
      val byRel = renames.map { case (rel, per) => rel -> per.toMap }.toMap
      val schema = state.schema.copy(edges = state.schema.edges.map { e =>
        byRel.get(e.relation) match {
          case None => e
          case Some(per) =>
            val seen = scala.collection.mutable.LinkedHashMap.empty[String, FieldDef]
            e.properties.foreach { p =>
              val nn = per.getOrElse(p.name, p.name)
              if (!seen.contains(nn)) seen(nn) = p.copy(name = nn)
            }
            e.copy(properties = seen.values.toSeq,
              identities = e.identities.map(t =>
                if (t == "source" || t == "target" || t == "relation") t
                else per.getOrElse(t, t)))
        }
      })
      val im = rebuildWithPipelineRewrite(state.ingestion,
        pl => rewriteEdgePropertiesInPipeline(pl, renamesByRelation = byRel))
      ManifestState(schema, im, state.bindings)

    case RemoveEdgeProperties(removals) =>
      val byRel = removals.map { case (rel, fs) => rel -> fs.toSet }.toMap
      val schema = state.schema.copy(edges = state.schema.edges.map { e =>
        byRel.get(e.relation) match {
          case None => e
          case Some(rm) =>
            val blocked = e.identities.filterNot(t =>
              t == "source" || t == "target" || t == "relation").toSet
            val overlap = (blocked & rm).toSeq.sorted
            if (overlap.nonEmpty) throw new IllegalArgumentException(
              "remove_edge_properties cannot remove identity fields for relation " +
                s"${e.relation}: ${overlap.mkString("[", ", ", "]")}")
            e.copy(properties = e.properties.filterNot(p => rm(p.name)))
        }
      })
      val im = rebuildWithPipelineRewrite(state.ingestion,
        pl => rewriteEdgePropertiesInPipeline(pl, removalsByRelation = byRel))
      ManifestState(schema, im, state.bindings)

    case AddInverseEdges(relations) =>
      val relationMap = relations.toMap
      val schemaAfter = InverseEdges.schemaEdgesWithInverses(state.schema, relationMap)
      val im = withResources(state.ingestion, resources(state.ingestion).map { r0 =>
        var r = r0
        val appended = InverseEdges.appendInversesToPipeline(
          pipelineOf(r), relationMap, schemaAfter.edges)
        // the reference re-validates every resource through the pydantic
        // step adapter at the END of the op (apply.py:1360) — an invalid
        // edge payload anywhere fails the whole op (inv_invalid_* parity)
        InverseEdges.requireValidEdgePayloads(appended)
        r = r.updated(pipelineKey(r), appended)
        Seq("infer_edge_only", "infer_edge_except").foreach { key =>
          asArr(r.getOrElse(key, null)).foreach { specs =>
            if (specs.nonEmpty)
              r = r.updated(key, InverseEdges.appendInverseFlatSpecs(
                specs.flatMap(asObj(_)), relationMap).asInstanceOf[Vector[Any]])
          }
        }
        asArr(r.getOrElse("extra_weights", null)).foreach { ew =>
          if (ew.nonEmpty)
            r = r.updated("extra_weights", InverseEdges.appendInversesForNestedEdges(
              ew.flatMap(asObj(_)), relationMap, schemaAfter.edges).asInstanceOf[Vector[Any]])
        }
        r
      })
      ManifestState(schemaAfter, im, state.bindings)

    case ReplaceIdentityC(vertices) =>
      var schema = state.schema
      var pinned = Map.empty[String, String]
      var dropped = Map.empty[String, Seq[String]]
      vertices.foreach { case (name, spec) =>
        val v = schema.vertex(name)
        val oldIdentity = naturalFields(v.identity)
        // demotion downgrades to keep when the old identity was synthetic
        // or already equals the new one (identity.py:120-137)
        val effectiveRetire =
          if (spec.retire == "demote" &&
            (oldIdentity.isEmpty || v.identity == spec.to)) "keep"
          else spec.retire
        if (effectiveRetire == "demote") {
          val retired = retiredNameFor(v, spec, oldIdentity)
          if (spec.endpoints == "pin_to_retired") pinned += name -> retired
        } else if (spec.endpoints == "pin_to_retired")
          throw new IllegalArgumentException(
            s"replace_identity: vertex '$name' cannot pin endpoints to a " +
              "retired identity because demotion did not happen")
        if (effectiveRetire == "drop") {
          val preserved = (naturalFields(spec.to) ++ (spec.to match {
            case Identity.Hash(fs) => fs
            case Identity.Funnel(bs, _) => bs.flatMap(b => b.whenAllPresent ++ b.digestFields)
            case _ => Nil
          }) ++ v.secondary.flatMap(_.fields)).toSet
          val toDrop = oldIdentity.filterNot(preserved)
          if (toDrop.nonEmpty) dropped += name -> toDrop
        }
        schema = EvolutionOp.ReplaceIdentity(name, spec.to,
          retire = spec.retire, retireAs = spec.retireAs)(schema)
      }
      var im = state.ingestion
      if (pinned.nonEmpty)
        im = rebuildWithPipelineRewrite(im,
          pl => rewriteEndpointSelectorsInPipeline(pl, pinned))
      var st = ManifestState(schema, im, state.bindings)
      if (dropped.nonEmpty) {
        // identity.py:592-599 `_drop_retired_properties` reuses the
        // property-removal cascade (fields already gone from the schema
        // via the typed op's drop path; rerun only the ingestion side)
        val remMap = dropped.map { case (v, fs) => v -> fs.toSet }
        st = st.copy(ingestion = rebuildWithPipelineRewrite(st.ingestion,
          pl => rewriteRemoveVertexPropertiesInPipeline(pl, remMap)))
        validateTransforms(st.ingestion)
      }
      st

    case RetargetEdges(edges) =>
      var schema = state.schema
      var mapping = Map.empty[EdgeIdKey, (String, String)]
      edges.foreach { case (key, ns, nt) =>
        schema = EvolutionOp.RetargetEdge(key, ns, nt)(schema)
        // the mapping is keyed on the exact triple (rewrite.py:427-441);
        // a relation-less edge def maps to the None-relation key
        val rel = if (key.relation.isEmpty) None else Some(key.relation)
        mapping += ((key.source, key.target, rel)) -> ((ns, nt))
      }
      val im = rebuildWithPipelineRewrite(state.ingestion,
        pl => rewriteEdgeEndpointsInPipeline(pl, mapping))
      ManifestState(schema, im, state.bindings)

    case SanitizeFields(explicit, dbFlavor) =>
      val isTg = dbFlavor == "tigergraph"
      val explicitUpper = explicit.map(_.map(_.toUpperCase).toSet)
      // apply.py:1385-1390: explicit words (upper) else flavor defaults;
      // name sanitization runs iff words are non-empty OR flavor is tg
      val loaded = explicitUpper.getOrElse(SanitizeRules.defaultReserved(dbFlavor))
      val runNameSanitization = loaded.nonEmpty || isTg
      // db_profile.py effective_reserved = reserved or rules defaults:
      // an explicit EMPTY list on tigergraph falls back to the defaults
      val reservedUpper =
        if (isTg && loaded.isEmpty) SanitizeRules.TigerGraphReserved else loaded
      def escapeReserved(name: String, suffix: String): String = {
        if (name.isEmpty || reservedUpper.isEmpty) return name
        if (!reservedUpper(name.toUpperCase)) return name
        val candidate = name + suffix
        if (!reservedUpper(candidate.toUpperCase)) return candidate
        var k = 1
        while (reservedUpper(s"$name${suffix}_$k".toUpperCase) && k <= 1000) k += 1
        s"$name${suffix}_$k"
      }
      // sanitize_tigergraph_identifier order: invalid chars, forbidden
      // prefix, THEN the reserved escape (db/util.py:289-307)
      def sanitizeName(name: String, suffix: String): String = {
        if (!runNameSanitization || name.isEmpty) return name
        if (!isTg) return escapeReserved(name, suffix)
        val replaced = name.flatMap(c =>
          if (SanitizeRules.TigerGraphInvalidChars(c))
            SanitizeRules.InvalidCharReplacement
          else c.toString)
        val prefixed = SanitizeRules.TigerGraphForbiddenPrefixes
          .find(replaced.startsWith)
          .map(_ => SanitizeRules.ForbiddenPrefixReplacement + replaced)
          .getOrElse(replaced)
        escapeReserved(prefixed, suffix)
      }
      var st = state
      if (runNameSanitization) {
        // 1. db_profile storage-name sanitization (apply.py:1392-1398,
        // db_profile.py:257-321 apply_storage_name_sanitization_to_db_
        // profile): vertex storage names escape with "_vertex", THEN edge
        // relation names escape with "_relation" and dedupe against the
        // post-pass vertex storage-name set
        st = st.copy(schema = sanitizeStorageNames(st.schema, sanitizeName))
        // 2. vertex FIELD renames (compute_vertex_field_renames walks the
        // reference's MATERIALIZED property list, sanitize.py:64-95)
        val renames = st.schema.vertices.flatMap { v =>
          val per = v.referenceProperties.map(_.name).flatMap { f =>
            val nn = sanitizeName(f, "_attr")
            if (nn != f) Some(f -> nn) else None
          }
          if (per.nonEmpty) Some(v.name -> per) else None
        }
        if (renames.nonEmpty) st = applyOne(st, RenameVertexProperties(renames))
      }
      // 3. TigerGraph consistent-identity-per-relation normalization
      // (apply.py:1409-1419; sanitize.py:191-257) — runs OUTSIDE the
      // name-sanitization gate, no-op for non-tigergraph flavors
      if (isTg) {
        val (schema2, idRenames) = NormalizeIdentity(st.schema)
        if (idRenames.nonEmpty) {
          val renMap = idRenames.toMap
          // apply_field_rename_to_db_profile (db_profile.py:337-401):
          // vertex indexes rewrite per-vertex; edge spec indexes rewrite
          // with the MERGED source+target maps (target wins key clashes);
          // then finish_init re-registers the secondary-derived lookup
          // indexes (idempotent on the field tuple)
          val schema3 = schema2.copy(
            vertices = schema2.vertices.map { v =>
              renMap.get(v.name).filter(_.nonEmpty) match {
                case None => v
                case Some(per) =>
                  val m = per.toMap
                  val renamed = v.indexes.map(ix =>
                    ix.copy(fields = ix.fields.map(f => m.getOrElse(f, f))))
                  val seen = scala.collection.mutable.LinkedHashMap.empty[Seq[String], IndexDef]
                  (renamed ++ v.derivedIndexes).foreach(ix =>
                    if (!seen.contains(ix.fields)) seen(ix.fields) = ix)
                  v.copy(indexes = seen.values.toSeq)
              }
            },
            edges = schema2.edges.map { e =>
              e.specIndexes match {
                case None => e
                case Some(spec) =>
                  val merged = renMap.getOrElse(e.source, Nil).toMap ++
                    renMap.getOrElse(e.target, Nil).toMap
                  if (merged.isEmpty) e
                  else e.copy(specIndexes = Some(spec.map(ix =>
                    ix.copy(fields = ix.fields.map(f => merged.getOrElse(f, f))))))
              }
            })
          val im = rebuildWithPipelineRewrite(st.ingestion,
            pl => rewriteVertexFieldNamesInPipeline(pl, renMap),
            vertexFieldRenames = renMap)
          st = ManifestState(schema3, im, st.bindings)
        } else st = st.copy(schema = schema2)
      }
      st

    case ProjectManifest(keepV, keepE, prune, keepResources) =>
      val sel = Project.selectInduced(state.schema, keepV, keepE, prune)
      var st = state
      if (sel.removedEdges.nonEmpty) {
        val removedIds: Set[EdgeIdKey] = sel.removedEdges.map(k =>
          (k.source, k.target,
            if (k.relation.isEmpty) None else Some(k.relation)): EdgeIdKey)
        val schema = st.schema.copy(
          edges = st.schema.edges.filterNot(e => sel.removedEdges(e.key)))
        val im = withResources(st.ingestion, resources(st.ingestion).map { r0 =>
          var r = r0
          r = r.updated(pipelineKey(r),
            rewriteRemoveEdgeIdsInPipeline(pipelineOf(r), removedIds))
          Seq("infer_edge_only", "infer_edge_except").foreach { key =>
            asArr(r.getOrElse(key, null)).foreach { specs =>
              r = r.updated(key, specs.filterNot(spec =>
                edgeIdFromSpec(spec).exists(removedIds)))
            }
          }
          asArr(r.getOrElse("extra_weights", null)).foreach { ew =>
            r = r.updated("extra_weights", ew.filterNot(entry =>
              edgeIdFromSpec(entry).exists(removedIds)))
          }
          r
        })
        st = ManifestState(schema, im, st.bindings)
      }
      if (sel.removedVertices.nonEmpty)
        st = applyOne(st, RemoveVertices(sel.removedVertices.toSeq.sorted))
      keepResources.foreach { keep =>
        val (im, b) = applyKeepResources(st.ingestion, st.bindings, keep.toSet)
        st = st.copy(ingestion = im, bindings = b)
      }
      st
  }
}
