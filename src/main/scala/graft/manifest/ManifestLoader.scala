package graft.manifest

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.functions._

import graft.model._
import graft.expr.FilterExpr
import graft.pipeline._

/** One resource→source binding (reference bindings/connectors.py:85-230:
  * `FileConnector` et al — matched to resources by name). Only the file kind
  * is loadable offline; table/api/kafka bindings parse but need live
  * endpoints.
  */
final case class ResourceBinding(
    resource: String,
    kind: String = "file", // file | table | api | kafka | sparql
    path: Option[String] = None,
    format: Option[String] = None,
    options: Map[String, String] = Map.empty,
    /** reference `connectors:` form: bind by filename regex under subPath */
    regex: Option[String] = None,
    subPath: Option[String] = None
)

/** Parsed manifest: the reference's `GraphManifest`
  * (graflo/architecture/contract/manifest.py:17-90) — schema + ingestion
  * resources + bindings, loaded from YAML or JSON.
  */
final case class GraphManifest(
    name: String,
    schema: GraphSchema,
    resources: Seq[ResourceDef],
    bindings: Seq[ResourceBinding]
) {
  def resource(n: String): ResourceDef =
    resources.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"manifest has no resource '$n'"))
}

/** YAML/JSON manifest loader — the reference's declarative contract plane
  * (`GraphManifest.from_config`, manifest.py:17-90; step forms in
  * contract/ingestion/steps/models.py) parsed with Jackson (bundled with
  * Spark) into the typed Scala manifest plane. A user can now declare a whole
  * pipeline without compiling Scala, same as the reference's
  * test/config/schema YAML fixtures.
  */
object ManifestLoader {

  private val yaml = new ObjectMapper(new YAMLFactory())
  private val json = new ObjectMapper()

  def load(path: String): GraphManifest = {
    val text = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    if (path.endsWith(".json")) fromJsonString(text) else fromYamlString(text)
  }

  def fromYamlString(text: String): GraphManifest = fromTree(yaml.readTree(text))
  def fromJsonString(text: String): GraphManifest = fromTree(json.readTree(text))

  // ------------------------------------------------------------- tree walk

  private def fromTree(root: JsonNode): GraphManifest = new Parser().parse(root)

  /** One parse = one Parser: edge-step vertex_weights accumulate per load
    * (they belong on the schema's EdgeDef, where the store write applies
    * them — the reference resolves step-level extra_weights into the edge
    * config at finish_init, contract/ingestion/resource.py:93-119).
    */
  private final class Parser {
    private val weightBuf =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Seq[VertexWeightSpec])]
    /** named transform declarations (reference ingestion_model.transforms:
      * [{name, foo, module, params, input, output}]) referenced from calls
      * via `use:` (oa-institution.yaml's keep_suffix_id).
      */
    private var namedTransforms: Map[String, JsonNode] = Map.empty

    def parse(root: JsonNode): GraphManifest = {
      val sNode = root.path("schema")
      val name = sNode.path("metadata").path("name").asText("manifest")
      val schema0 = parseSchema(sNode)
      namedTransforms = root.path("ingestion_model").path("transforms") match {
        case a if a.isArray =>
          a.elements().asScala.map(n => n.path("name").asText() -> n).toMap
        case _ => Map.empty
      }
      val resources = root.path("ingestion_model").path("resources") match {
        case n if n.isArray => n.elements().asScala.map(parseResource).toSeq
        case _              => Nil
      }
      val schema = if (weightBuf.isEmpty) schema0 else schema0.copy(
        edges = schema0.edges.map { ed =>
          val extra = weightBuf.collect {
            case (s, t, rel, vw)
              if s == ed.source && t == ed.target &&
                (rel.isEmpty || rel == ed.relation) => vw
          }.flatten
          if (extra.isEmpty) ed else ed.copy(extraWeights = ed.extraWeights ++ extra.toSeq)
        })
      val bindings = parseBindings(root.path("bindings"))
      // step-level secondary-identity endpoint selectors propagate to the
      // schema edge so the STORE's write-time resolution sees them (the
      // reference's registry_builder wires resource edge actors'
      // source_match/target_match into the auto-join lookups,
      // hq/registry_builder.py:325; hq/auto_join.py:42-97), along with
      // the manifest-level endpoints_on_ambiguous policy
      def edgeSteps(steps: Seq[graft.pipeline.Step]): Seq[graft.pipeline.EdgeStep] =
        steps.flatMap {
          case e: graft.pipeline.EdgeStep      => Seq(e)
          case m: graft.pipeline.MultiEdgeStep => m.links
          case d: graft.pipeline.Descend       => edgeSteps(d.steps)
          case _                               => Nil
        }
      val policy = root.path("ingestion_model").path("endpoints_on_ambiguous")
        .asText("") match {
        case "first" => Some(AmbiguityPolicy.First)
        case "skip"  => Some(AmbiguityPolicy.Skip)
        case "error" => Some(AmbiguityPolicy.Error)
        case "all"   => Some(AmbiguityPolicy.All)
        case _       => None
      }
      val stepSel = resources.flatMap(r => edgeSteps(r.steps))
        .filter(es => es.source.nonEmpty && es.target.nonEmpty &&
          (es.sourceMatch.nonEmpty || es.targetMatch.nonEmpty))
      val schemaSel =
        if (stepSel.isEmpty && policy.isEmpty) schema
        else schema.copy(edges = schema.edges.map { ed =>
          val sel = stepSel.find(es => es.source == ed.source &&
            es.target == ed.target &&
            (es.relation.isEmpty || es.relation == ed.relation))
          val patched = sel.map(es => ed.copy(
            sourceMatch = ed.sourceMatch.orElse(es.sourceMatch),
            targetMatch = ed.targetMatch.orElse(es.targetMatch))).getOrElse(ed)
          policy.map(p => patched.copy(ambiguity = p)).getOrElse(patched)
        })
      GraphManifest(name, schemaSel, resources, bindings)
    }

  // ---------------------------------------------------------------- schema

  private def parseSchema(sNode: JsonNode): GraphSchema = {
    val g = sNode.path("graph")
    val vertices = g.path("vertex_config").path("vertices") match {
      case n if n.isArray => n.elements().asScala.map(parseVertex).toSeq
      case _              => Nil
    }
    val edges = g.path("edge_config").path("edges") match {
      case n if n.isArray => n.elements().asScala.map(parseEdgeDef).toSeq
      case _              => Nil
    }
    // db_profile physical plane (reference database_features.py):
    // authored vertex indexes and edge physical specs — the metadata the
    // index evolution ops (evolution/physical.py:132-278) validate against
    val profile = sNode.path("db_profile")
    val vIndexes: Map[String, Seq[IndexDef]] = profile.path("vertex_indexes") match {
      case n if n.isObject => n.properties().asScala.map(e =>
        e.getKey -> parseIndexes(e.getValue)).toMap
      case _ => Map.empty
    }
    val eSpecs: Map[EdgeKey, (Seq[IndexDef], Option[String])] = profile.path("edge_specs") match {
      case n if n.isArray => n.elements().asScala.map { sp =>
        EdgeKey(sp.path("source").asText(), sp.path("target").asText(),
          sp.path("relation").asText()) ->
          ((parseIndexes(sp.path("indexes")),
            Option(sp.get("relation_name")).filterNot(_.isNull).map(_.asText())))
      }.toMap
      case _ => Map.empty
    }
    // physical storage-name overrides (db_profile.vertex_storage_names)
    val vStorage: Map[String, String] = profile.path("vertex_storage_names") match {
      case n if n.isObject => n.properties().asScala.map(e =>
        e.getKey -> e.getValue.asText()).toMap
      case _ => Map.empty
    }
    // registration order matches the reference profile: YAML-authored
    // entries first, then the secondary-identity-DERIVED lookup indexes
    // finish_init appends (idempotent on the field tuple); op additions
    // land after both (executed-parity fixture `avi_basic` ordering)
    def withDerived(v0: VertexDef): VertexDef = {
      val v = vStorage.get(v0.name).map(sn => v0.copy(storageName = Some(sn))).getOrElse(v0)
      val authored = vIndexes.getOrElse(v.name, Nil)
      val seen = scala.collection.mutable.LinkedHashMap.empty[Seq[String], IndexDef]
      (authored ++ v.derivedIndexes).foreach(ix =>
        if (!seen.contains(ix.fields)) seen(ix.fields) = ix)
      if (seen.isEmpty) v else v.copy(indexes = seen.values.toSeq)
    }
    GraphSchema(
      vertices.map(withDerived),
      edges.map(e => eSpecs.get(e.key).map { case (ix, rn) =>
        e.copy(specIndexes = Some(ix), relationName = rn)
      }.getOrElse(e)))
  }

  private def parseIndexes(n: JsonNode): Seq[IndexDef] = n match {
    case a if a.isArray => a.elements().asScala.map(io => IndexDef(
      fields = strings(io.path("fields")),
      unique = io.path("unique").asBoolean(true),
      name = Option(io.get("name")).filterNot(_.isNull).map(_.asText()))).toSeq
    case _ => Nil
  }

  /** Optional `semantics:` block (reference schema/semantics.py): `unit`
    * is valid on FIELD semantics only — the reference's
    * Semantics/FieldSemantics split makes `unit:` on a vertex or edge a
    * validation error, and the loader owes the same rejection.
    */
  private def parseSemantics(owner: JsonNode, allowUnit: Boolean,
      where: String): Option[graft.model.Semantics] = {
    val n = owner.path("semantics")
    if (n.isMissingNode || n.isNull) None
    else {
      if (!allowUnit && n.has("unit"))
        throw new IllegalArgumentException(
          s"$where: 'unit' is only valid on field semantics " +
            "(reference semantics.py FieldSemantics vs Semantics)")
      Some(graft.model.Semantics(
        iri = Option(n.get("iri")).filterNot(_.isNull).map(_.asText()),
        exactMatch = strings(n.path("exact_match")),
        synonyms = strings(n.path("synonyms")),
        unit = Option(n.get("unit")).filterNot(_.isNull).map(_.asText())))
    }
  }

  private def parseFieldDef(p: JsonNode): FieldDef =
    if (p.isTextual) FieldDef(p.asText())
    else FieldDef(p.path("name").asText(),
      Option(p.get("type")).filterNot(_.isNull)
        .map(t => FieldType.fromName(t.asText())),
      semantics = parseSemantics(p, allowUnit = true,
        where = s"field ${p.path("name").asText()}"))

  private def parseVertex(v: JsonNode): VertexDef = {
    val name = v.path("name").asText()
    val props = v.path("properties") match {
      case n if n.isArray => n.elements().asScala.map(parseFieldDef).toSeq
      case _ => Nil
    }
    val idFields = strings(v.path("identity"))
    val identity =
      if (v.path("blank").asBoolean(false)) Identity.Blank
      // assigned: true (vertex.py:498, identity_uuid.py): UUID PK in a real
      // field — identity_fields[0] or "id" — kept when present, minted when
      // empty
      else if (v.path("assigned").asBoolean(false))
        Identity.Assigned(idFields.headOption.getOrElse("id"))
      // identity_funnel (identity_funnel.py): ordered fallback branches;
      // a branch's condition defaults to its own fields; include_branch_id
      // (default true) folds the branch name into the digest payload
      else if (v.has("identity_funnel")) {
        val f = v.path("identity_funnel")
        val branches = f.path("branches").elements().asScala.map { b =>
          val fields = strings(b.path("fields"))
          val when =
            if (b.has("when_all_present")) strings(b.path("when_all_present"))
            else fields
          FunnelBranch(b.path("id").asText(), when, fields)
        }.toSeq
        require(branches.nonEmpty, s"vertex $name: identity_funnel needs branches")
        Identity.Funnel(branches,
          markBranch = !f.has("include_branch_id") ||
            f.path("include_branch_id").asBoolean(true))
      }
      else if (v.has("identity_hash")) Identity.Hash(strings(v.path("identity_hash")))
      // the reference's canonical spelling (vertex.py hash_identity_properties)
      else if (v.has("hash_identity_properties"))
        Identity.Hash(strings(v.path("hash_identity_properties")))
      else if (idFields.nonEmpty) Identity.Natural(idFields)
      // identity_from_all_properties fallback (reference vertex.py:822-828):
      // no declared identity and not blank → hash over every property
      else if (props.nonEmpty) Identity.Hash(props.map(_.name))
      else Identity.Blank
    val filters = v.path("filters") match {
      case n if n.isArray && n.size() > 0 =>
        val fs = n.elements().asScala.map(x => FilterExpr.parse(toScala(x))).toSeq
        Some(if (fs.size == 1) fs.head else FilterExpr.And(fs))
      case _ => None
    }
    // secondary identities (vertex.py secondary_identities): named field
    // sets edges may select with source_match/target_match
    val secondary = v.path("secondary_identities") match {
      case n if n.isArray => n.elements().asScala.map { s =>
        graft.model.SecondaryIdentity(s.path("name").asText(),
          strings(s.path("fields")))
      }.toSeq
      case _ => Nil
    }
    VertexDef(name, props, identity, secondary = secondary, filters = filters,
      semantics = parseSemantics(v, allowUnit = false, where = s"vertex $name"))
  }

  private def parseEdgeDef(e: JsonNode): EdgeDef = {
    val source = e.path("source").asText()
    val target = e.path("target").asText()
    val relation = e.path("relation").asText("related")
    // properties accept the bare-string and the {name, type} dict forms
    // (edge.py _normalize_direct_item; examples/16 declares
    // {name: share, type: FLOAT})
    val props = e.path("properties") match {
      case n if n.isArray => n.elements().asScala.map(parseFieldDef).toSeq
      case _ => Nil
    }
    // identities may be a flat token list or a list of key-sets (kg.yaml);
    // the first set is the uniqueness key (reference edge.py:141-151)
    // ABSENT identities mean NO uniqueness constraint — the reference's
    // default (schema/edge.py:141 default_factory=list) inserts every
    // observation (db_writer.py:470 filter_uniques=False); ticker.yaml's
    // 398-edge golden depends on it
    val ids = e.path("identities") match {
      case n if n.isArray && n.size() > 0 =>
        val head = n.get(0)
        val fields =
          if (head.isArray) head.elements().asScala.map(_.asText()).toSeq
          else n.elements().asScala.map(_.asText()).toSeq
        // declared identity fields AUGMENT the endpoints: the reference's
        // edge upsert matches on (_from, _to) PLUS the index fields
        // (db/conn.py upsert keys) — kg's [[_role]] means one edge per
        // (source, target, _role), never one edge per role value globally
        (Seq("source", "target") ++ fields).distinct
      case _ => Nil
    }
    EdgeDef(source, target, relation, properties = props, identities = ids,
      relationDeclared = e.has("relation"),
      semantics = parseSemantics(e, allowUnit = false,
        where = s"edge $source->$target"))
  }

  // ------------------------------------------------------------- resources

  private def parseResource(r: JsonNode): ResourceDef = {
    def pairList(n: JsonNode): Seq[(String, String)] = n match {
      case x if x.isArray => x.elements().asScala.map(p =>
        (p.path("source").asText(), p.path("target").asText())).toSeq
      case _ => Nil
    }
    parseExtraWeights(r)
    ResourceDef(
      name = r.path("name").asText(),
      steps = parseSteps(pipelineNode(r)),
      dropTrivialFields = r.path("strip_trivial").asBoolean(false),
      inferEdges = r.path("infer_edges").asBoolean(true),
      inferEdgeOnly = pairList(r.path("infer_edge_only")),
      inferEdgeExcept = pairList(r.path("infer_edge_except")),
      maxDocErrors = Option(r.get("max_doc_errors")).filterNot(_.isNull).map(_.asLong())
    )
  }

  /** Resource-level `extra_weights` (reference ResourceExtraWeightEntry,
    * contract/ingestion/resource.py:89-145: bare edge dict or
    * `{edge: {...}, vertex_weights: [...]}`): vertex_weights merge onto the
    * schema edge exactly like step-level ones (the reference's
    * `_init_extra_weights` merges both into one registry,
    * pipeline/runtime/resource.py:303-308). The reference's own DB-fetch
    * enrichment for these entries is unreachable as written — it reads
    * `weight.properties` where the model declares `fields`
    * (graflo/hq/db_writer.py:378, executed writer-parity case
    * xw_active_reference_crash) — so the store-side enrichment here
    * implements the documented intent (`fields`), see DIVERGENCES.md.
    */
  private def parseExtraWeights(r: JsonNode): Unit =
    r.path("extra_weights") match {
      case a if a.isArray => a.elements().asScala.foreach { e =>
        val edge = if (e.has("edge")) e.path("edge") else e
        val vw = parseVertexWeights(e.path("vertex_weights"))
        if (vw.nonEmpty)
          weightBuf += ((edge.path("source").asText(),
            edge.path("target").asText(),
            edge.path("relation").asText(""), vw))
      }
      case _ => ()
    }

  /** Sibling-actor type priority (reference descend.py:208-216
    * `_NodeTypePriority`): the reference STABLE-SORTS every pipeline
    * level so all transforms run before any vertex extraction and edges
    * render last, regardless of listed order — ibes.yaml lists its vertex
    * steps before the renames that produce their fields and relies on
    * this. A YAML-dialect normalization only: the programmatic Scala API
    * stays sequential (it can descend into transform-produced keys).
    */
  private def stepPriority(s: Step): Int = s match {
    case _: Descend          => 10
    case _: TransformStep    => 20
    case _: RenameStep       => 20
    case _: RenameKeysStep   => 20
    case _: CastStep         => 20
    case _: VertexRouterStep => 30
    case _: VertexStep       => 50
    case _: EdgeStep         => 90
    case _: MultiEdgeStep    => 90
  }

  /** `apply:` is the reference's older spelling of `pipeline:` (conftest
    * deb resources; steps/models.py accepts both).
    */
  private def pipelineNode(s: JsonNode): JsonNode =
    if (s.has("pipeline")) s.path("pipeline") else s.path("apply")

  private def parseSteps(n: JsonNode): Seq[Step] =
    if (!n.isArray) Nil
    else n.elements().asScala.map(parseStep).toSeq.sortBy(stepPriority)

  private def parseStep(s: JsonNode): Step = {
    if (s.has("vertex")) parseVertexStep(s)
    else if (s.has("transform")) parseTransform(s.path("transform"))
    // flat multi-link edge step — the cascade/inverse machinery emits the
    // normalized `{type: edge, links: [...]}` shape; it must win over the
    // type-tag dispatch below or every link silently drops (the re-loaded
    // step would parse as ONE empty EdgeStep)
    else if (s.has("links")) MultiEdgeStep(
      s.path("links").elements().asScala.map(l => parseEdgeStep(l)).toSeq)
    // normalized edge actor (`type: edge`) — the cascade flattens `edge:`
    // wrappers into this form, so it must keep the wrapper's semantics
    // (relation_map APPLIES); it must win over the source/target shorthand
    // below or a wrapped edge step with a relation_map silently stops
    // applying it after an evolution round-trip
    else if (s.has("type") && s.path("type").asText() == "edge") parseEdgeStep(s)
    // the source/target SHORTHAND binds a schema edge directly; its
    // relation_field values pass through RAW — relation_map renames only
    // apply on the explicit `edge:` actor form (executed actor-parity:
    // the reference leaves OWNS/RENTS unmapped in the shorthand)
    else if (s.has("source") && s.has("target")) parseEdgeStep(s, applyRelationMap = false)
    // flat from/to edge actor (reference EdgeActorConfig canonical spelling,
    // examples/16: `from: instrument, to: issuer, source_match: by_isin`)
    else if (s.has("from") && s.has("to") &&
      s.path("from").isTextual && s.path("to").isTextual) parseEdgeStep(s)
    else if (s.has("edge")) {
      val e = s.path("edge")
      if (e.has("links")) MultiEdgeStep(
        e.path("links").elements().asScala.map(l => parseEdgeStep(l)).toSeq)
      else parseEdgeStep(e)
    }
    // role-bound edge without a type tag: dynamic endpoints only —
    // source_role/target_role/…_type_field (`type: edge` handled above)
    else if (s.has("source_role") || s.has("target_role") ||
        s.has("source_type_field") || s.has("target_type_field")) parseEdgeStep(s)
    else if (s.has("cast")) CastStep(
      s.path("cast").properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
    else if (s.has("vertex_router") || s.has("type_field")) {
      val r = if (s.has("vertex_router")) s.path("vertex_router") else s
      val typeMap = objMap(r.path("type_map"))
      // flat `from:` applies to every routed type (objects-relations.yaml);
      // per_type_from entries override per type
      val flatFrom = objMap(r.path("from"))
      // `vertex_from_map` is the reference spelling (steps/models.py:791);
      // `per_type_from` is the older dialect — accept both, reference wins
      def typedFrom(n: JsonNode): Map[String, Map[String, String]] = n match {
        case x if x.isObject => x.properties().asScala.map(e =>
          e.getKey -> objMap(e.getValue)).toMap
        case _ => Map.empty[String, Map[String, String]]
      }
      val perType0 = typedFrom(r.path("per_type_from")) ++
        typedFrom(r.path("vertex_from_map"))
      val perType =
        if (flatFrom.isEmpty) perType0
        else typeMap.values.toSeq.distinct.map(v =>
          v -> (flatFrom ++ perType0.getOrElse(v, Map.empty))).toMap ++
          (perType0 -- typeMap.values.toSet)
      VertexRouterStep(
        typeField = r.path("type_field").asText(),
        typeMap = typeMap,
        perTypeFrom = perType,
        keepFields = strings(r.path("keep_fields")),
        // synthetic role so `edge:` steps can reference this router slot by
        // its type field (source_type_field / target_type_field)
        role = text(r, "role").orElse(Some(s"__tf_${r.path("type_field").asText()}")))
    }
    else if (s.has("descend")) {
      // wrapped form (steps/normalize.py:42-59): `descend: {key, apply|pipeline}`
      val d = s.path("descend")
      Descend(
        key = Option(d.get("key")).filterNot(_.isNull).map(_.asText()),
        anyKey = d.path("any_key").asBoolean(false),
        steps = parseSteps(pipelineNode(d)))
    }
    else if (s.has("pipeline") || s.has("apply")) Descend(
      key = Option(s.get("key")).filterNot(_.isNull).map(_.asText()),
      anyKey = s.path("any_key").asBoolean(false),
      steps = parseSteps(pipelineNode(s)))
    else if (s.has("rename") || s.has("call")) parseTransform(s)
    else throw new IllegalArgumentException(s"unrecognized pipeline step: $s")
  }

  private def parseVertexStep(s: JsonNode): VertexStep =
    VertexStep(
      vertex = s.path("vertex").asText(),
      from = objMap(s.path("from")),
      keepFields = strings(s.path("keep_fields")),
      extractionScope =
        if (s.path("mapped_only").asBoolean(false)) "mapped_only"
        else s.path("extraction_scope").asText("full"),
      filters = Option(s.get("filters"))
        .filter(n => n.isArray && n.size() > 0).map { n =>
          val fs = n.elements().asScala.map(x => FilterExpr.parse(toScala(x))).toSeq
          if (fs.size == 1) fs.head else FilterExpr.And(fs)
        },
      role = text(s, "role"),
      lookupOnly = s.path("lookup_only").asBoolean(false))

  private def parseEdgeStep(s: JsonNode, applyRelationMap: Boolean = true): EdgeStep = {
    // `match` selects one location group for BOTH endpoints (kg.yaml)
    val both = text(s, "match")
    // nested `edge:` form (objects-relations.yaml): `from`/`to` are static
    // endpoint names; `source_type_field`/`target_type_field` bind an
    // endpoint to a vertex_router slot via its synthetic `__tf_` role
    val srcName = if (s.has("source")) s.path("source").asText()
      else s.path("from").asText("")
    val dstName = if (s.has("target")) s.path("target").asText()
      else s.path("to").asText("")
    val step = EdgeStep(
      source = if (s.has("source_type_field")) "" else srcName,
      target = if (s.has("target_type_field")) "" else dstName,
      relation = s.path("relation").asText(""),
      sourceRole = text(s, "source_role")
        .orElse(text(s, "source_type_field").map("__tf_" + _)),
      targetRole = text(s, "target_role")
        .orElse(text(s, "target_type_field").map("__tf_" + _)),
      relationField = text(s, "relation_field"),
      relationMap = if (applyRelationMap) objMap(s.path("relation_map")) else Map.empty,
      relationFromKey = s.path("relation_from_key").asBoolean(false),
      casting = s.path("casting").asText("auto"),
      weightFields = strings(s.path("properties")) ++ strings(s.path("weights")),
      sourceMatch = text(s, "source_match"),
      targetMatch = text(s, "target_match"),
      excludeSource = text(s, "exclude_source"),
      excludeTarget = text(s, "exclude_target"),
      sourceGroup = text(s, "match_source").orElse(both),
      targetGroup = text(s, "match_target").orElse(both))
    val vw = parseVertexWeights(s.path("vertex_weights"))
    if (vw.nonEmpty) weightBuf += ((step.source, step.target, step.relation, vw))
    step
  }

  private def parseVertexWeights(n: JsonNode): Seq[VertexWeightSpec] = n match {
    case a if a.isArray => a.elements().asScala.map(w =>
      VertexWeightSpec(
        vertex = w.path("name").asText(),
        fields = strings(w.path("fields")) ++ strings(w.path("properties")),
        keepVertexName = w.path("keep_vertex_name").asBoolean(true),
        endpoint = text(w, "endpoint"))).toSeq
    case _ => Nil
  }

  /** transform step: `rename:` map form or `call:` named-function form
    * (reference steps/models.py + actor/transform.py:147-243).
    */
  private def parseTransform(t: JsonNode): Step = {
    if (t.has("rename"))
      return RenameStep(objMap(t.path("rename")))
    val call0 = t.path("call")
    if (!call0.isObject)
      throw new IllegalArgumentException(s"transform needs 'rename' or 'call': $t")
    // `use:` pulls a named declaration's fields as defaults; explicit call
    // fields override (reference named-transform registry)
    val call: JsonNode =
      if (!call0.has("use")) call0
      else {
        val nm = call0.path("use").asText()
        val base = namedTransforms.getOrElse(nm, throw new IllegalArgumentException(
          s"unknown named transform: $nm"))
        val merged = base.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        call0.properties().asScala.foreach { e =>
          if (e.getKey != "use") merged.set[com.fasterxml.jackson.databind.JsonNode](
            e.getKey, e.getValue): Unit
        }
        merged
      }
    // target: keys — name-function over COLUMN NAMES with a keys selector
    // (reference contract/ingestion/transform.py:217-232; string/list forms
    // normalize to include mode, transform.py:70-80)
    val target = Seq(t.path("target").asText(""), call.path("target").asText(""))
      .find(_.nonEmpty).getOrElse("values")
    if (target == "keys") {
      val keysNode = if (t.has("keys")) t.path("keys") else call.path("keys")
      val (mode, names) =
        if (keysNode.isTextual) ("include", Seq(keysNode.asText()))
        else if (keysNode.isArray) ("include", strings(keysNode))
        else if (keysNode.isObject)
          (keysNode.path("mode").asText("all"), strings(keysNode.path("names")))
        else ("all", Seq.empty[String])
      return RenameKeysStep(call.path("foo").asText(), mode, names)
    }
    val module = call.path("module").asText("")
    // dress shorthand WITHOUT a function (test_actor.py:762): the raw
    // value is dressed as-is — an identity transform
    val fn = Option(call.path("foo").asText()).filter(_.nonEmpty)
      .getOrElse("identity")
    val input = strings(call.path("input"))
    val output = strings(call.path("output"))
    val dress = call.path("dress") match {
      case n if n.isObject =>
        Some((n.path("key").asText("key"), n.path("value").asText("value")))
      case _ => None
    }
    val params: Map[String, JsonNode] = call.path("params") match {
      case n if n.isObject => n.properties().asScala.map(e => e.getKey -> e.getValue).toMap
      case _               => Map.empty
    }
    // resolve module.foo → engine transform; parameterized fns become inline
    // columns (the reference imports the Python callable; here the names map
    // onto the Catalyst-native TransformLib surface)
    val inline: Option[Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column] =
      (module, fn) match {
        case (_, "round_str") =>
          val nd = params.get("ndigits").map(_.asInt()).getOrElse(0)
          Some(cs => graft.functions.TransformLib.roundStr(cs.head, nd))
        case ("builtins", "int") => Some(cs => cs.head.cast("string").try_cast("bigint"))
        case ("builtins", "float") => Some(cs => cs.head.cast("double"))
        case ("builtins", "str") => Some(cs => cs.head.cast("string"))
        case (_, "split_keep_part") =>
          // reference defaults: sep="/", keep=-1 (util/transform.py:449) —
          // a manifest omitting params keeps the LAST slash-separated part
          val sep = params.get("sep").map(_.asText()).getOrElse("/")
          // reference param name is `keep` (negative = from the end; a
          // LIST keeps several indices re-joined with the separator)
          params.get("keep").orElse(params.get("idx")) match {
            case Some(n) if n.isArray =>
              val idxs = n.elements().asScala.map(_.asInt()).toSeq
              Some(cs => graft.functions.TransformLib.splitKeepParts(cs.head, sep, idxs))
            case other =>
              val idx = other.map(_.asInt()).getOrElse(-1)
              Some(cs => graft.functions.TransformLib.splitKeepPart(cs.head, sep, idx))
          }
        case (_, "snake_to_camel") if params.contains("upper_first") =>
          val uf = params("upper_first").asBoolean(false)
          Some(cs => graft.functions.TransformLib.snakeToCamel(cs.head, uf))
        case (_, "remove_prefix") =>
          val p = params.get("prefix").map(_.asText()).getOrElse("")
          Some(cs => graft.functions.TransformLib.removePrefix(cs.head, p))
        case (_, "remove_suffix") =>
          val p = params.get("suffix").map(_.asText()).getOrElse("")
          Some(cs => graft.functions.TransformLib.removeSuffix(cs.head, p))
        case _ => None // named registry fn (TransformRegistry) resolves at compile
      }
    // repeated tuple-call groups (reference transform.py:663-678)
    def groups(n: JsonNode): Seq[Seq[String]] =
      if (!n.isArray) Nil else n.elements().asScala.map(strings).toSeq
    val inGroups = groups(call.path("input_groups"))
    val outGroups = groups(call.path("output_groups"))
    TransformStep(
      fn = fn,
      input = input,
      output = output,
      strategy = if (((input.size > 1 || inGroups.exists(_.size > 1)) &&
        graft.functions.TransformRegistry.nary.contains(fn)) ||
        output.size > input.size) "single" else "each", // tuple-result fns
      inline = inline,
      dress = dress,
      errorTolerant = t.path("error_tolerant").asBoolean(false) ||
        call.path("error_tolerant").asBoolean(false),
      label = call.path("label").asText(""),
      inputGroups = inGroups,
      outputGroups = outGroups)
  }

  } // end Parser

  // -------------------------------------------------------------- bindings

  private def parseBindings(b: JsonNode): Seq[ResourceBinding] = b match {
    case n if n.isObject =>
      // reference form: bindings.connectors = [{regex, sub_path, resource_name}]
      val connectors = n.path("connectors") match {
        case a if a.isArray => a.elements().asScala.map { c =>
          ResourceBinding(
            resource = c.path("resource_name").asText(),
            kind = c.path("kind").asText("file"),
            regex = text(c, "regex"),
            subPath = text(c, "sub_path").filterNot(_ == "."),
            path = text(c, "path").orElse(text(c, "file")),
            format = text(c, "format"))
        }.toSeq
        case _ => Nil
      }
      val direct = n.properties().asScala.filter(_.getKey != "connectors").map { e =>
        val res = e.getKey; val v = e.getValue
        if (v.isTextual) ResourceBinding(res, path = Some(v.asText()))
        else ResourceBinding(res,
          kind = v.path("kind").asText("file"),
          path = text(v, "path").orElse(text(v, "file")),
          format = text(v, "format"),
          options = objMap(v.path("options")),
          regex = text(v, "regex"),
          subPath = text(v, "sub_path"))
      }.toSeq
      connectors ++ direct
    case _ => Nil
  }

  // --------------------------------------------------------------- helpers

  private def text(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)

  private def strings(n: JsonNode): Seq[String] =
    if (!n.isArray) Nil else n.elements().asScala.map(_.asText()).toSeq

  private def objMap(n: JsonNode): Map[String, String] =
    if (!n.isObject) Map.empty
    else n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

  /** JsonNode → plain Scala structures for FilterExpr.parse. */
  private def toScala(n: JsonNode): Any = {
    if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> toScala(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(toScala).toSeq
    else if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else null
  }
}
