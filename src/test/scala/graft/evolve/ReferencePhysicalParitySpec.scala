package graft.evolve

import scala.collection.immutable.VectorMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.SparkSpec
import graft.model._

/** Executed-parity for the physical-profile index ops
  * (reference evolution/physical.py:132-278): each fixture case runs
  * through the reference's own `apply_evolution`
  * (tools/gen_physical_fixture.py) and records the DatabaseProfile's index
  * surface; this spec replays the translated [[EvolutionOp]]s and compares
  * byte-exactly. Covered: add/remove vertex indexes (field-tuple idempotent
  * add, derived-from-secondary refusal on remove, unknown-vertex and
  * undeclared-field and no-such-index rejections), add/remove edge spec
  * indexes (pre-existing-physical-spec requirement, duplicate-add and
  * unmatched-remove and empty-list rejections), and a round-trip chain.
  */
class ReferencePhysicalParitySpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_physical_fixture.json"))

  import scala.jdk.CollectionConverters._

  private def indexOf(n: JsonNode): IndexDef = IndexDef(
    fields = n.path("fields").elements().asScala.map(_.asText()).toSeq,
    unique = n.path("unique").asBoolean(true))

  private def translate(op: JsonNode): Seq[EvolutionOp] = {
    import EvolutionOp._
    def entries(n: JsonNode) = n.properties().asScala.toSeq
    op.path("op").asText() match {
      case "add_vertex_indexes" => entries(op.path("indexes")).map { e =>
        AddVertexIndexes(e.getKey,
          e.getValue.elements().asScala.map(indexOf).toSeq)
      }
      case "remove_vertex_indexes" => entries(op.path("indexes")).map { e =>
        RemoveVertexIndexes(e.getKey,
          e.getValue.elements().asScala
            .map(_.elements().asScala.map(_.asText()).toSeq).toSeq)
      }
      case "add_edge_indexes" => op.path("edges").elements().asScala.toSeq.map { e =>
        AddEdgeIndexes(
          EdgeKey(e.path("source").asText(), e.path("target").asText(),
            e.path("relation").asText()),
          e.path("indexes").elements().asScala.map(indexOf).toSeq)
      }
      case "remove_edge_indexes" => op.path("edges").elements().asScala.toSeq.map { e =>
        RemoveEdgeIndexes(
          EdgeKey(e.path("source").asText(), e.path("target").asText(),
            e.path("relation").asText()),
          e.path("fields").elements().asScala
            .map(_.elements().asScala.map(_.asText()).toSeq).toSeq)
      }
      case "change_field_types" =>
        def ftOf(n: JsonNode): FieldType =
          if (n.path("type").asText() == "LIST")
            FieldType.ListT(FieldType.fromName(n.path("item_type").asText().toLowerCase))
          else FieldType.fromName(n.path("type").asText().toLowerCase)
        entries(op.path("vertices")).flatMap { v =>
          entries(v.getValue).map(f =>
            SetFieldType(v.getKey, f.getKey, ftOf(f.getValue)))
        } ++ Option(op.get("edges")).filterNot(_.isNull).toSeq.flatMap(e =>
          entries(e).flatMap { r =>
            entries(r.getValue).map(f =>
              SetEdgeFieldType(r.getKey, f.getKey, ftOf(f.getValue)))
          })
      // the rename/removal interplay cases ride the property ops
      case "rename_vertex_properties" => entries(op.path("renames")).flatMap { v =>
        entries(v.getValue).map(p =>
          RenameProperty(v.getKey, p.getKey, p.getValue.asText()))
      }
      case "remove_vertex_properties" => entries(op.path("removals")).flatMap { v =>
        v.getValue.elements().asScala.toSeq.map(f => RemoveProperty(v.getKey, f.asText()))
      }
      case "rename_edge_properties" => entries(op.path("renames")).flatMap { r =>
        entries(r.getValue).map(p => RenameEdgeProperty(
          EdgeKey("person", "city", r.getKey), p.getKey, p.getValue.asText()))
      }
      case "remove_edge_properties" => entries(op.path("removals")).flatMap { r =>
        r.getValue.elements().asScala.toSeq.map(f =>
          RemoveEdgeProperty(EdgeKey("person", "city", r.getKey), f.asText()))
      }
      case "remove_secondary_identities" => entries(op.path("removals")).flatMap { v =>
        v.getValue.elements().asScala.toSeq.map(n =>
          RemoveSecondaryIdentity(v.getKey, n.asText()))
      }
      case other => throw new IllegalArgumentException(s"untranslated op: $other")
    }
  }

  private def ftName(t: FieldType): String = t match {
    case FieldType.IntT      => "INT"
    case FieldType.UIntT     => "UINT"
    case FieldType.FloatT    => "FLOAT"
    case FieldType.DoubleT   => "DOUBLE"
    case FieldType.BoolT     => "BOOL"
    case FieldType.StringT   => "STRING"
    case FieldType.DatetimeT => "DATETIME"
    case FieldType.UuidT     => "UUID"
    case FieldType.ListT(i)  => s"LIST<${ftName(i)}>"
  }

  /** Mirror of the generator's projection of the profile index surface. */
  private def render(s: GraphSchema): String = {
    def ix(i: IndexDef): Any =
      VectorMap[String, Any]("fields" -> i.fields.toVector, "unique" -> i.unique)
    val fieldTypes = VectorMap.from(s.vertices.flatMap { v =>
      val typed = VectorMap.from(v.properties.flatMap(p =>
        p.ftype.map(t => p.name -> (ftName(t): Any))))
      if (typed.isEmpty) None else Some(v.name -> (typed: Any))
    })
    val edgeFieldTypes = VectorMap.from(s.edges.flatMap { e =>
      val typed = VectorMap.from(e.properties.flatMap(p =>
        p.ftype.map(t => p.name -> (ftName(t): Any))))
      if (typed.isEmpty) None else Some(e.relation -> (typed: Any))
    })
    // the loader already materializes derived indexes into v.indexes in
    // registration order; NO dedup here — the reference keeps a
    // pruned-authored duplicate of a derived index (idx_prunes_vertex_removal)
    val vertexIndexes = VectorMap.from(s.vertices.flatMap { v =>
      if (v.indexes.isEmpty) None
      else Some(v.name -> (v.indexes.map(ix).toVector: Any))
    })
    val edgeIndexes = s.edges.flatMap(e => e.specIndexes.map(spec =>
      VectorMap[String, Any]("source" -> e.source, "target" -> e.target,
        "relation" -> e.relation, "indexes" -> spec.map(ix).toVector))).toVector
    SchemaContext.serializeCompact(VectorMap[String, Any](
      "field_types" -> fieldTypes, "edge_field_types" -> edgeFieldTypes,
      "vertex_indexes" -> vertexIndexes, "edge_indexes" -> edgeIndexes))
  }

  fixture.elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    test(s"physical-parity: $name") {
      val schema = graft.manifest.ManifestLoader
        .fromYamlString(c.path("manifest").asText()).schema
      assert(render(schema) == c.path("before").asText(),
        s"$name: pre-op profile mismatch")
      val expectedError = Option(c.get("error")).filterNot(_.isNull).map(_.asText())
      val result = scala.util.Try {
        val ops = c.path("ops").elements().asScala.toSeq.flatMap(translate)
        Evolution(schema, ops)
      }
      expectedError match {
        case Some(err) => assert(result.isFailure,
          s"$name: reference rejected ($err) but graft accepted")
        case None =>
          val got = render(result.get)
          assert(got == c.path("after").asText(),
            s"$name:\n got $got\nwant ${c.path("after").asText()}")
      }
    }
  }

  test("index ops: risk + ingestion-reach classification + codec round-trip") {
    import EvolutionOp._
    val ops: Seq[EvolutionOp] = Seq(
      AddVertexIndexes("v", Seq(IndexDef(Seq("a", "b"), unique = false))),
      RemoveVertexIndexes("v", Seq(Seq("a", "b"))),
      AddEdgeIndexes(EdgeKey("a", "b", "r"), Seq(IndexDef(Seq("w")))),
      RemoveEdgeIndexes(EdgeKey("a", "b", "r"), Seq(Seq("w"))))
    // reference migrate/risk.py: ADD_*_INDEX low, REMOVE_*_INDEX medium
    assert(Risk.classify(ops(0)) == Risk.Low)
    assert(Risk.classify(ops(2)) == Risk.Low)
    assert(Risk.classify(ops(1)) == Risk.Medium)
    assert(Risk.classify(ops(3)) == Risk.Medium)
    // not in INGESTION_REWRITING_OPS
    ops.foreach(op => assert(!Risk.reachesIngestion(op)))
    ops.foreach(op =>
      assert(RevisionStore.opFromJson(RevisionStore.opToJson(op)) == op))
    // index ADDS are idempotent-skip on present field tuples, so a blind
    // Remove inverse would delete indexes the op never added (or hit the
    // derived refusal): like SetEdgeDirected, NOT invertible
    ops.foreach(op => assert(Evolution.invert(op).isEmpty))
  }
}
