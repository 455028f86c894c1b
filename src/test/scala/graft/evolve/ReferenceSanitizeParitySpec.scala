package graft.evolve

import scala.collection.immutable.VectorMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.SparkSpec
import graft.model._
import Rewrite.Obj

/** Executed-parity for the SANITIZE composition (reference apply.py:
  * 1368-1419 `apply_sanitize`): `tools/gen_sanitize_fixture.py` runs each
  * (manifest, sanitize-op) case through the reference's own
  * `apply_evolution` and records a canonical JSON projection of BOTH
  * planes — the schema plane (vertex identity/properties/secondary,
  * db_profile vertex_storage_names / vertex_indexes / edge_specs) and the
  * ingestion plane (same projection as the rewrite fixture). This spec
  * replays the ops through [[ManifestEvolution]] and compares BYTE-EXACTLY.
  *
  * Covered legs: storage-name sanitization (`san_storage_*` — the
  * `_vertex` / `_relation` suffixes, the vertex-collision dedupe loop,
  * authored overrides, TigerGraph identifier rules on storage names,
  * explicit words on a generic flavor) and TigerGraph
  * consistent-identity-per-relation normalization (`nri_*` — zip renames,
  * length-mismatch head rename + untyped field additions, first-insertion
  * tie-break, stale-target role collection, accumulation across
  * relations, physical relation_name grouping/ungrouping, profile index
  * rewrites with derived re-registration, pipeline from-map rewrites,
  * the hash-identity synthetic `id` tuple, non-TigerGraph no-op).
  *
  * The `before` comparison doubles as LOADER parity for the schema plane:
  * graft's YAML loader must materialize the same identity lists,
  * properties, storage names and physical specs the reference does.
  */
class ReferenceSanitizeParitySpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_sanitize_fixture.json"))

  import scala.jdk.CollectionConverters._

  private def strs(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  private def translate(op: JsonNode): CascadeOp = {
    op.path("op").asText() match {
      case "sanitize" => CascadeOp.SanitizeFields(
        Option(op.get("reserved_words")).filterNot(_.isNull).map(strs),
        op.path("db_flavor").asText(""))
      case other => throw new IllegalArgumentException(s"untranslated op: $other")
    }
  }

  private def ftName(ft: FieldType): String = ft match {
    case FieldType.IntT      => "INT"
    case FieldType.UIntT     => "UINT"
    case FieldType.FloatT    => "FLOAT"
    case FieldType.DoubleT   => "DOUBLE"
    case FieldType.BoolT     => "BOOL"
    case FieldType.StringT   => "STRING"
    case FieldType.DatetimeT => "DATETIME"
    case FieldType.UuidT     => "UUID"
    case FieldType.ListT(i)  => s"LIST[${ftName(i)}]"
  }

  /** graft's rendering of the generator's `proj_schema`. */
  private def projSchema(s: GraphSchema): VectorMap[String, Any] = {
    val vertices = s.vertices.map { v =>
      VectorMap[String, Any](
        "name" -> v.name,
        "identity" -> v.identityList,
        "properties" -> v.referenceProperties.map(f => VectorMap[String, Any](
          "name" -> f.name, "type" -> f.ftype.map(ftName).orNull)),
        "secondary" -> v.secondary.map(si => VectorMap[String, Any](
          "name" -> si.name, "fields" -> si.fields)))
    }
    val storage: Map[String, Any] =
      s.vertices.flatMap(v => v.storageName.map(sn => v.name -> (sn: Any))).toMap
    val vi: Map[String, Any] = s.vertices.filter(_.indexes.nonEmpty).map(v =>
      v.name -> (v.indexes.map(ix => VectorMap[String, Any](
        "fields" -> ix.fields, "unique" -> ix.unique)): Any)).toMap
    val specs = s.edges
      .filter(e => e.specIndexes.isDefined || e.relationName.isDefined)
      .sortBy(e => (e.source, e.target, e.relation))
      .map(e => VectorMap[String, Any](
        "source" -> e.source, "target" -> e.target, "relation" -> e.relation,
        "relation_name" -> e.relationName.orNull,
        "indexes" -> e.specIndexes.getOrElse(Nil).map(ix =>
          VectorMap[String, Any]("fields" -> ix.fields, "unique" -> ix.unique))))
    VectorMap[String, Any](
      "vertices" -> vertices,
      "vertex_storage_names" -> storage,
      "vertex_indexes" -> vi,
      "edge_specs" -> specs)
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
      "resources" -> st.ingestion.getOrElse("resources", Vector()),
      "schema" -> projSchema(st.schema)))

  private def diff(name: String, got: String, want: String): String = {
    val i = got.zip(want).indexWhere { case (a, b) => a != b }
    val at = if (i < 0) math.min(got.length, want.length) else i
    s"$name mismatch at char $at:\n got …${got.slice(math.max(0, at - 80), at + 140)}\nwant …${want.slice(math.max(0, at - 80), at + 140)}"
  }

  fixture.elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    test(s"sanitize-parity: $name") {
      val (state, bindingsIsNull) = stateOf(c)
      // loader parity on the schema plane (the ingestion side replays the
      // recorded projection, so only the schema rendering is load-bearing)
      val gotBefore = render(state, bindingsIsNull)
      assert(gotBefore == c.path("before").asText(),
        diff(s"$name (before)", gotBefore, c.path("before").asText()))
      val expectedError = Option(c.get("error")).filterNot(_.isNull).map(_.asText())
      val result = scala.util.Try {
        val ops = c.path("ops").elements().asScala.toSeq.map(translate)
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
          assert(got == c.path("after").asText(),
            diff(name, got, c.path("after").asText()))
      }
    }
  }
}
