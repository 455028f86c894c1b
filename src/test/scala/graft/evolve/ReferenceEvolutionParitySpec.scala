package graft.evolve

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.SparkSpec
import graft.model._
import graft.evolve.EvolutionOp._

/** Executed-parity against the reference's schema-evolution runtime:
  * `tools/gen_evolution_fixture.py` runs each (manifest, ops) corner case
  * through the reference's own `apply_evolution`
  * (graflo/architecture/evolution/apply.py) and records the normalized
  * post-evolution SCHEMA block; this spec loads the same manifest, applies
  * the translated graft [[EvolutionOp]]s, and compares.
  *
  * Covered axes: vertex rename/remove with edge cascade, merge_vertices
  * (property union typed-beats-untyped, IDENTITY UNION, self-relation
  * waiver + rejection), property rename cascading into identity fields,
  * property remove/add (identity-field removal rejected on both engines),
  * replace_identity with the full retire lattice (demote →
  * retired_identity / retire_as, keep, drop removes the old fields,
  * natural→hash/blank mode changes), secondary identity add/remove,
  * relation renames (collision REJECTED on both engines — executed truth;
  * MergeEdges is the merge path), merge_edges, remove_edges by relation,
  * add_inverse_edges, edge property add/rename, replace_edge_identities
  * (non-endpoint token materializes as a property), retarget_edges
  * (collision rejected).
  *
  * The comparison plane is schema-only: graft's evolution is schema-plane
  * by design; the reference's ingestion-model cascades (pipeline rewrites,
  * endpoints: pin_to_retired) are the documented manifest-plane
  * difference (DIVERGENCES.md).
  */
class ReferenceEvolutionParitySpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_evolution_fixture.json"))

  import scala.jdk.CollectionConverters._

  private def fields(n: JsonNode): Seq[String] =
    n.elements().asScala.map(_.asText()).toSeq

  /** reference IdentityTarget dict → graft Identity */
  private def identityOf(n: JsonNode): Identity = n.path("mode").asText() match {
    case "natural" => Identity.Natural(fields(n.path("identity")))
    case "hash"    => Identity.Hash(fields(n.path("hash_from")))
    case "blank"   => Identity.Blank
    case "assigned" => Identity.Assigned("id")
    case other     => throw new IllegalArgumentException(s"mode $other")
  }

  /** one reference op dict → graft ops (some reference ops are keyed by
    * relation NAME and expand against the current schema)
    */
  private def translate(op: JsonNode, s: GraphSchema): Seq[EvolutionOp] = {
    def entries(n: JsonNode) = n.properties().asScala.toSeq
    op.path("op").asText() match {
      case "rename_vertices" =>
        // one ATOMIC map, like the reference — a swap is legal, a partial
        // sequential application would collide on itself
        Seq(RenameVertices(entries(op.path("vertices"))
          .map(e => e.getKey -> e.getValue.asText()).toMap))
      case "remove_vertices" =>
        fields(op.path("names")).map(RemoveVertex.apply)
      case "merge_vertices" =>
        Seq(MergeVertices(fields(op.path("sources")), op.path("into").asText(),
          allowSelfRelations = op.path("allow_self_relations").asBoolean(false),
          allowRowFusion = op.path("allow_row_fusion").asBoolean(false)))
      case "rename_vertex_properties" =>
        entries(op.path("renames")).flatMap { v =>
          entries(v.getValue).map(p =>
            RenameProperty(v.getKey, p.getKey, p.getValue.asText()))
        }
      case "remove_vertex_properties" =>
        entries(op.path("removals")).flatMap { v =>
          fields(v.getValue).map(f => RemoveProperty(v.getKey, f))
        }
      case "add_vertex_properties" =>
        entries(op.path("additions")).flatMap { v =>
          fields(v.getValue).map(f => AddProperty(v.getKey, FieldDef(f)))
        }
      case "replace_identity" =>
        entries(op.path("vertices")).map { v =>
          val r = v.getValue
          ReplaceIdentity(v.getKey, identityOf(r.path("to")),
            retire = r.path("retire").asText("demote"),
            retireAs = Option(r.get("retire_as")).filterNot(_.isNull).map(_.asText()))
        }
      case "add_secondary_identities" =>
        entries(op.path("additions")).flatMap { v =>
          v.getValue.elements().asScala.toSeq.map(sec =>
            AddSecondaryIdentity(v.getKey,
              SecondaryIdentity(sec.path("name").asText(), fields(sec.path("fields")))))
        }
      case "remove_secondary_identities" =>
        entries(op.path("removals")).flatMap { v =>
          v.getValue.elements().asScala.toSeq.map(n =>
            RemoveSecondaryIdentity(v.getKey, n.asText()))
        }
      case "rename_relations" =>
        Seq(RenameRelations(entries(op.path("relations"))
          .map(e => e.getKey -> e.getValue.asText()).toMap))
      case "merge_edges" =>
        Seq(MergeEdges(fields(op.path("sources")), op.path("into").asText()))
      case "remove_edges" =>
        val rels = fields(op.path("relations")).toSet
        s.edges.filter(e => rels(e.relation)).map(e => RemoveEdge(e.key))
      case "add_inverse_edges" =>
        entries(op.path("relations")).flatMap { r =>
          s.edges.filter(_.relation == r.getKey)
            .map(e => InverseEdge(e.key, r.getValue.asText()))
        }
      case "add_edge_properties" =>
        entries(op.path("additions")).flatMap { r =>
          s.edges.filter(_.relation == r.getKey).flatMap(e =>
            fields(r.getValue).map(f => AddEdgeProperty(e.key, FieldDef(f))))
        }
      case "rename_edge_properties" =>
        entries(op.path("renames")).flatMap { r =>
          s.edges.filter(_.relation == r.getKey).flatMap(e =>
            entries(r.getValue).map(p =>
              RenameEdgeProperty(e.key, p.getKey, p.getValue.asText())))
        }
      case "replace_edge_identities" =>
        op.path("edges").elements().asScala.toSeq.map { e =>
          ReplaceEdgeIdentities(
            EdgeKey(e.path("source").asText(), e.path("target").asText(),
              e.path("relation").asText()),
            fields(e.path("identities").get(0)))
        }
      case "retarget_edges" =>
        op.path("edges").elements().asScala.toSeq.map { e =>
          RetargetEdge(
            EdgeKey(e.path("source").asText(), e.path("target").asText(),
              e.path("relation").asText()),
            e.path("new_source").asText(), e.path("new_target").asText())
        }
      case other => throw new IllegalArgumentException(s"untranslated op $other")
    }
  }

  private def ftypeName(t: FieldType): String = t match {
    case FieldType.IntT | FieldType.UIntT => "INT"
    case FieldType.FloatT | FieldType.DoubleT => "FLOAT"
    case FieldType.BoolT => "BOOL"
    case FieldType.StringT => "STRING"
    case FieldType.DatetimeT => "DATETIME"
    case FieldType.UuidT => "UUID"
    case other => other.toString
  }

  /** graft schema → the fixture's normalized shape (the reference's
    * DB-aware view gives synthetic-identity vertices the `id` field)
    */
  private def normalize(s: GraphSchema): String = {
    def props(ps: Seq[FieldDef], extraId: Boolean): Seq[Map[String, String]] = {
      val base = ps.map(p =>
        Map("name" -> p.name) ++ p.ftype.map(t => "type" -> ftypeName(t)))
      if (extraId && !ps.exists(_.name == "id")) base :+ Map("name" -> "id")
      else base
    }
    val vs = s.vertices.sortBy(_.name).map { v =>
      val empty = Seq.empty[String]
      val noF = Seq.empty[(String, Seq[String], Seq[String])]
      val (idFields, blank, assigned, hashFrom, funnel, synthetic) =
        v.identity match {
          case Identity.Natural(fs) => (fs, false, false, empty, noF, false)
          case Identity.Hash(fs)    => (Seq("id"), false, false, fs, noF, true)
          case Identity.Blank       => (Seq("id"), true, false, empty, noF, true)
          case Identity.Assigned(f) => (Seq(f), false, true, empty, noF, false)
          case Identity.Funnel(bs, _) => (Seq("id"), false, false, empty,
            bs.map(b => (b.name, b.digestFields, b.whenAllPresent)), true)
        }
      Map(
        "name" -> v.name,
        "properties" -> props(v.properties, synthetic),
        "identity" -> idFields,
        "blank" -> blank,
        "assigned" -> assigned,
        "hash_from" -> hashFrom,
        "funnel_branches" -> funnel.map { case (id, fs, wap) =>
          Map("id" -> id, "fields" -> fs, "when_all_present" -> wap) },
        "secondary" -> v.secondary.map(sec =>
          Map("name" -> sec.name, "fields" -> sec.fields))
          .sortBy(_("fields").toString).sortBy(_("name").toString)
      ).toString
    }
    val es = s.edges
      .sortBy(e => (e.source, e.target, e.relation))
      .map { e =>
        val keys =
          if (e.identities.isEmpty ||
            e.identities.sorted == Seq("source", "target")) Nil
          else Seq(e.identities)
        Map(
          "source" -> e.source, "target" -> e.target,
          "relation" -> e.relation, "directed" -> e.directed,
          "identities" -> keys,
          "properties" -> props(e.properties, extraId = false)
        ).toString
      }
    (vs ++ es).mkString("\n")
  }

  /** fixture schema node → the same normalized rendering */
  private def normalizeRef(n: JsonNode): String = {
    def props(arr: JsonNode): Seq[Map[String, String]] =
      arr.elements().asScala.toSeq.map { p =>
        Map("name" -> p.path("name").asText()) ++
          (if (p.has("type")) Map("type" -> p.path("type").asText()) else Map.empty)
      }
    val vs = n.path("vertices").elements().asScala.toSeq.map { v =>
      Map(
        "name" -> v.path("name").asText(),
        "properties" -> props(v.path("properties")),
        "identity" -> fields(v.path("identity")),
        "blank" -> v.path("blank").asBoolean(),
        "assigned" -> v.path("assigned").asBoolean(),
        "hash_from" -> fields(v.path("hash_from")),
        "funnel_branches" -> v.path("funnel_branches").elements().asScala.toSeq
          .map(b => Map("id" -> b.path("id").asText(),
            "fields" -> fields(b.path("fields")),
            "when_all_present" -> fields(b.path("when_all_present")))),
        "secondary" -> v.path("secondary").elements().asScala.toSeq
          .map(sec => Map("name" -> sec.path("name").asText(),
            "fields" -> fields(sec.path("fields"))))
          .sortBy(_("fields").toString).sortBy(_("name").toString)
      ).toString
    }
    val es = n.path("edges").elements().asScala.toSeq.map { e =>
      Map(
        "source" -> e.path("source").asText(),
        "target" -> e.path("target").asText(),
        "relation" -> e.path("relation").asText(),
        "directed" -> e.path("directed").asBoolean(),
        "identities" -> e.path("identities").elements().asScala.toSeq
          .map(k => fields(k)),
        "properties" -> props(e.path("properties"))
      ).toString
    }
    (vs ++ es).mkString("\n")
  }

  fixture.elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    test(s"reference evolution parity: $name") {
      val tmp = java.io.File.createTempFile(s"evo_parity_$name", ".yaml")
      tmp.deleteOnExit()
      java.nio.file.Files.writeString(tmp.toPath, c.path("manifest").asText())
      val m = graft.manifest.ManifestLoader.load(tmp.getAbsolutePath)

      val ran = scala.util.Try {
        c.path("ops").elements().asScala.foldLeft(m.schema) { (s, op) =>
          Evolution(s, translate(op, s))
        }
      }

      if (!c.path("error").isNull) {
        assert(ran.isFailure,
          s"[$name] reference rejected (${c.path("error").asText().take(100)}) " +
            "but graft applied the ops")
      } else {
        assert(ran.isSuccess, s"[$name] graft failed: ${ran.failed.toOption}")
        val act = normalize(ran.get)
        val exp = normalizeRef(c.path("schema"))
        assert(act == exp, s"[$name]\n--- spark ---\n$act\n--- ref ---\n$exp")
      }
    }
  }
}
