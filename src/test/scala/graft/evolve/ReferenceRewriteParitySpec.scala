package graft.evolve

import scala.collection.immutable.VectorMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.SparkSpec
import graft.model._
import Rewrite.Obj

/** Executed-parity for the evolution INGESTION-MODEL cascade:
  * `tools/gen_rewrite_fixture.py` runs each (manifest, ops) case through
  * the reference's own `apply_evolution` (apply.py + rewrite.py +
  * identity.py + structure.py + inverse_edges.py) and records the evolved
  * ingestion/bindings projection as a canonical JSON STRING
  * (`json.dumps(sort_keys, separators)`); this spec replays the same ops
  * through [[ManifestEvolution]] over the recorded pre-op document and
  * compares BYTE-EXACTLY via [[SchemaContext.serializeCompact]].
  *
  * Covered cascade axes: entity renames through pipelines / merge
  * collections / infer specs / extra weights / bindings, vertex-removal
  * resource pruning (incl. the transform-only-resource drop and the
  * empty-resources abort), merge rewrites (vertex_from_map union with
  * conflict rejection, self-relation + row-fusion gates), property renames
  * (`from:`-map coverage + injection, keep_fields, transform rename
  * values, vertex_weights field/map/filter keys, resource extra_weights),
  * property removals (incl. the payload-less-transform rejection),
  * relation/edge-id removals (incl. the normalized-flat-edge-step drop),
  * edge property renames/removals, replace_identity `endpoints:
  * pin_to_retired` (default + retire_as + explicit-secondary-untouched +
  * name-clash rejection) and the drop path, retargets, projection with
  * keep_resources, and inverse-edge appends (flat, dedup, relation_map).
  */
class ReferenceRewriteParitySpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_rewrite_fixture.json"))

  import scala.jdk.CollectionConverters._

  private def pairs(n: JsonNode): Seq[(String, JsonNode)] =
    n.properties().asScala.map(e => e.getKey -> e.getValue).toSeq

  private def strs(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  private def identityOf(n: JsonNode): Identity = n.path("mode").asText() match {
    case "natural"  => Identity.Natural(strs(n.path("identity")))
    case "hash"     => Identity.Hash(strs(n.path("hash_from")))
    case "blank"    => Identity.Blank
    case "assigned" => Identity.Assigned("id")
    case other      => throw new IllegalArgumentException(s"mode $other")
  }

  /** one reference op dict → a graft [[CascadeOp]] */
  private def translate(op: JsonNode): CascadeOp = {
    import CascadeOp._
    def strPairs(n: JsonNode) = pairs(n).map { case (k, v) => k -> v.asText() }
    def nested(n: JsonNode) = pairs(n).map { case (k, v) => k -> strPairs(v) }
    def lists(n: JsonNode) = pairs(n).map { case (k, v) => k -> strs(v) }
    op.path("op").asText() match {
      case "rename_vertices"   => RenameVertices(strPairs(op.path("vertices")))
      case "remove_vertices"   => RemoveVertices(strs(op.path("names")))
      case "merge_vertices"    => MergeVertices(strs(op.path("sources")),
        op.path("into").asText(),
        allowSelfRelations = op.path("allow_self_relations").asBoolean(false),
        allowRowFusion = op.path("allow_row_fusion").asBoolean(false))
      case "rename_vertex_properties" => RenameVertexProperties(nested(op.path("renames")))
      case "remove_vertex_properties" => RemoveVertexProperties(lists(op.path("removals")))
      case "add_vertex_properties"    => AddVertexProperties(lists(op.path("additions")))
      case "rename_relations"  => RenameRelations(strPairs(op.path("relations")))
      case "rename_resources"  => RenameResources(strPairs(op.path("resources")))
      case "remove_edges"      => RemoveEdges(strs(op.path("relations")))
      case "merge_edges"       => MergeEdges(strs(op.path("sources")), op.path("into").asText())
      case "rename_edge_properties" => RenameEdgeProperties(nested(op.path("renames")))
      case "remove_edge_properties" => RemoveEdgeProperties(lists(op.path("removals")))
      case "add_inverse_edges" => AddInverseEdges(strPairs(op.path("relations")))
      case "replace_identity"  => ReplaceIdentityC(pairs(op.path("vertices")).map {
        case (v, r) => v -> IdentityReplacementSpec(
          to = identityOf(r.path("to")),
          retire = r.path("retire").asText("demote"),
          retireAs = Option(r.get("retire_as")).filterNot(_.isNull).map(_.asText()),
          endpoints = r.path("endpoints").asText("follow_new"))
      })
      case "retarget_edges" => RetargetEdges(
        op.path("edges").elements().asScala.toSeq.map { e =>
          val key = EdgeKey(e.path("source").asText(), e.path("target").asText(),
            e.path("relation").asText())
          (key,
            Option(e.get("new_source")).filterNot(_.isNull).map(_.asText()).getOrElse(key.source),
            Option(e.get("new_target")).filterNot(_.isNull).map(_.asText()).getOrElse(key.target))
        })
      case "sanitize" =>
        SanitizeFields(
          Option(op.get("reserved_words")).filterNot(_.isNull).map(strs),
          op.path("db_flavor").asText(""))
      case "project_manifest" => ProjectManifest(
        keepVertices = Option(op.get("keep_vertices")).filterNot(_.isNull).map(strs),
        keepEdges = Option(op.get("keep_edges")).filterNot(_.isNull).map(
          _.elements().asScala.toSeq.map(e => EdgeKey(e.path("source").asText(),
            e.path("target").asText(), e.path("relation").asText()))),
        keepResources = Option(op.get("keep_resources")).filterNot(_.isNull).map(strs))
      case other => throw new IllegalArgumentException(s"untranslated op: $other")
    }
  }

  private def stateOf(c: JsonNode): (ManifestState, Boolean) = {
    val schema = graft.manifest.ManifestLoader
      .fromYamlString(c.path("manifest").asText()).schema
    val before = DocJson.toDoc(mapper.readTree(c.path("before").asText()))
      .asInstanceOf[Obj]
    val bindingsIsNull = before.getOrElse("bindings", null) == null
    val bindings = Rewrite.asObj(before.getOrElse("bindings", null))
      .getOrElse(Rewrite.EmptyObj)
    val ingestion = VectorMap[String, Any](
      "resources" -> before.getOrElse("resources", Vector()))
    (ManifestState(schema, ingestion, bindings), bindingsIsNull)
  }

  private def render(st: ManifestState, bindingsIsNull: Boolean): String =
    SchemaContext.serializeCompact(VectorMap[String, Any](
      "bindings" -> (if (bindingsIsNull) null else st.bindings),
      "resources" -> st.ingestion.getOrElse("resources", Vector())))

  fixture.elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    test(s"rewrite-parity: $name") {
      val (state, bindingsIsNull) = stateOf(c)
      val expectedError = Option(c.get("error")).filterNot(_.isNull).map(_.asText())
      val result = scala.util.Try {
        val ops = c.path("ops").elements().asScala.toSeq.map(translate)
        // the reference computes ops_reaching_ingestion over the validated
        // ops before applying them — pin the token map where recorded
        Option(c.get("reaching_ingestion")).filterNot(_.isNull).foreach { r =>
          assert(CascadeOp.opsReachingIngestion(ops) == strs(r),
            s"$name: ops_reaching_ingestion mismatch")
        }
        ManifestEvolution.evolve(state, ops)
      }
      expectedError match {
        case Some(err) =>
          assert(result.isFailure,
            s"$name: reference rejected ($err) but graft accepted")
        case None =>
          val st = result.fold(e => throw new AssertionError(
            s"$name: graft rejected but reference accepted: $e", e), identity)
          val got = render(st, bindingsIsNull)
          val want = c.path("after").asText()
          assert(got == want, {
            val i = got.zip(want).indexWhere { case (a, b) => a != b }
            val at = if (i < 0) math.min(got.length, want.length) else i
            s"$name mismatch at char $at:\n got …${got.slice(math.max(0, at - 80), at + 120)}\nwant …${want.slice(math.max(0, at - 80), at + 120)}"
          })
      }
    }
  }
}
