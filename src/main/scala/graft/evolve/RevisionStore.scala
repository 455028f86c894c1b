package graft.evolve

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.model._

/** Durable revision chain — the reference's `FileRevisionStore`
  * (evolution/revision.py:351-400): revisions serialize to
  * `<root>/revisions.json` next to the store's INDEX.json and load back
  * into a [[RevisionChain]]. Ops serialize structurally (vertex/edge defs
  * included); vertex filters and force_types are declarative-manifest
  * concerns and are not carried through DDL ops (matching the reference's
  * op payloads).
  */
object RevisionStore {
  import EvolutionOp._

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------------ save

  def save(root: String, chain: RevisionChain): Unit = {
    val arr = mapper.createArrayNode()
    chain.ordered.foreach { r =>
      val o = mapper.createObjectNode()
      o.put("id", r.id)
      r.downRevision.foreach(d => o.put("down", d))
      o.put("label", r.label)
      val ops = o.putArray("ops")
      r.ops.foreach(op => ops.add(opToJson(op)))
      arr.add(o)
    }
    Files.createDirectories(Paths.get(root))
    Files.write(Paths.get(root, "revisions.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  def load(root: String): RevisionChain = {
    val p = Paths.get(root, "revisions.json")
    if (!Files.exists(p)) return RevisionChain(Nil)
    val arr = mapper.readTree(Files.readAllBytes(p))
    RevisionChain(arr.elements().asScala.map { o =>
      Revision(
        id = o.path("id").asText(),
        downRevision = Option(o.get("down")).map(_.asText()),
        ops = o.path("ops").elements().asScala.map(opFromJson).toSeq,
        label = o.path("label").asText(""))
    }.toSeq)
  }

  // ------------------------------------------------------------- op codec

  private def identityToJson(o: ObjectNode, id: Identity): Unit = id match {
    case Identity.Natural(fs) => o.put("kind", "natural"); strArr(o, "fields", fs)
    case Identity.Hash(fs)    => o.put("kind", "hash"); strArr(o, "fields", fs)
    case Identity.Funnel(bs, mk) =>
      o.put("kind", "funnel"); o.put("mark_branch", mk)
      val arr = o.putArray("branches")
      bs.foreach { b =>
        val bo = mapper.createObjectNode()
        bo.put("name", b.name)
        strArr(bo, "when_all_present", b.whenAllPresent)
        strArr(bo, "digest_fields", b.digestFields)
        arr.add(bo)
      }
    case Identity.Blank    => o.put("kind", "blank"): Unit
    case Identity.Assigned(f) => o.put("kind", "assigned"); o.put("field", f): Unit
  }

  private def identityFromJson(n: JsonNode): Identity = n.path("kind").asText() match {
    case "natural" => Identity.Natural(strs(n, "fields"))
    case "hash"    => Identity.Hash(strs(n, "fields"))
    case "funnel"  => Identity.Funnel(
      n.path("branches").elements().asScala.map(b => FunnelBranch(
        b.path("name").asText(), strs(b, "when_all_present"),
        strs(b, "digest_fields"))).toSeq,
      n.path("mark_branch").asBoolean(false))
    case "blank"    => Identity.Blank
    case "assigned" => Identity.Assigned(
      Option(n.get("field")).map(_.asText()).getOrElse("id"))
    case other => throw new IllegalArgumentException(s"bad identity kind: $other")
  }

  private def typeName(t: FieldType): String = t match {
    case FieldType.IntT      => "int"
    case FieldType.UIntT     => "uint"
    case FieldType.FloatT    => "float"
    case FieldType.DoubleT   => "double"
    case FieldType.BoolT     => "bool"
    case FieldType.StringT   => "string"
    case FieldType.DatetimeT => "datetime"
    case FieldType.UuidT     => "uuid"
    case FieldType.ListT(item) => s"list<${typeName(item)}>"
  }

  private def fieldToJson(f: FieldDef): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", f.name)
    f.ftype.foreach(t => o.put("type", typeName(t)))
    o
  }

  private def fieldFromJson(n: JsonNode): FieldDef =
    FieldDef(n.path("name").asText(),
      Option(n.get("type")).map(t => FieldType.fromName(t.asText())))

  private def vertexToJson(v: VertexDef): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", v.name)
    val ps = o.putArray("properties"); v.properties.foreach(f => ps.add(fieldToJson(f)))
    val io = o.putObject("identity"); identityToJson(io, v.identity)
    if (v.secondary.nonEmpty) {
      val ss = o.putArray("secondary")
      v.secondary.foreach { s =>
        val so = mapper.createObjectNode()
        so.put("name", s.name); strArr(so, "fields", s.fields); ss.add(so)
      }
    }
    o
  }

  private def vertexFromJson(n: JsonNode): VertexDef = VertexDef(
    n.path("name").asText(),
    n.path("properties").elements().asScala.map(fieldFromJson).toSeq,
    identityFromJson(n.path("identity")),
    secondary = n.path("secondary") match {
      case a: ArrayNode => a.elements().asScala.map(s =>
        SecondaryIdentity(s.path("name").asText(), strs(s, "fields"))).toSeq
      case _ => Nil
    })

  private def edgeToJson(e: EdgeDef): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("source", e.source); o.put("target", e.target); o.put("relation", e.relation)
    o.put("directed", e.directed)
    val ps = o.putArray("properties"); e.properties.foreach(f => ps.add(fieldToJson(f)))
    strArr(o, "identities", e.identities)
    o
  }

  private def edgeFromJson(n: JsonNode): EdgeDef = EdgeDef(
    n.path("source").asText(), n.path("target").asText(), n.path("relation").asText(),
    directed = n.path("directed").asBoolean(true),
    properties = n.path("properties").elements().asScala.map(fieldFromJson).toSeq,
    identities = strs(n, "identities"))

  private def keyToJson(o: ObjectNode, k: EdgeKey): Unit = {
    o.put("source", k.source); o.put("target", k.target)
    o.put("relation", k.relation): Unit
  }
  private def keyFromJson(n: JsonNode): EdgeKey = EdgeKey(
    n.path("source").asText(), n.path("target").asText(), n.path("relation").asText())

  def opToJson(op: EvolutionOp): ObjectNode = {
    val o = mapper.createObjectNode()
    op match {
      case AddVertex(v) => o.put("op", "add_vertex"); o.set[JsonNode]("vertex", vertexToJson(v))
      case RemoveVertex(n) => o.put("op", "remove_vertex"); o.put("name", n)
      case RenameVertex(a, b) => o.put("op", "rename_vertex"); o.put("from", a); o.put("to", b)
      case RenameVertices(m) =>
        o.put("op", "rename_vertices")
        val mm = mapper.createObjectNode()
        m.toSeq.sortBy(_._1).foreach { case (k, v) => mm.put(k, v) }
        o.set[JsonNode]("vertices", mm): Unit
      case AddProperty(vx, f) =>
        o.put("op", "add_property"); o.put("vertex", vx); o.set[JsonNode]("field", fieldToJson(f))
      case RemoveProperty(vx, f) =>
        o.put("op", "remove_property"); o.put("vertex", vx); o.put("field", f)
      case RenameProperty(vx, a, b) =>
        o.put("op", "rename_property"); o.put("vertex", vx); o.put("from", a); o.put("to", b)
      case SetFieldType(vx, f, t) =>
        o.put("op", "set_field_type"); o.put("vertex", vx)
        o.set[JsonNode]("field", fieldToJson(FieldDef(f, Some(t))))
      case ReplaceIdentity(vx, id, retire, retireAs) =>
        o.put("op", "replace_identity"); o.put("vertex", vx)
        o.put("retire", retire)
        retireAs.foreach(o.put("retire_as", _))
        val io = o.putObject("identity"); identityToJson(io, id)
      case AddSecondaryIdentity(vx, s) =>
        o.put("op", "add_secondary"); o.put("vertex", vx)
        o.put("name", s.name); strArr(o, "fields", s.fields)
      case RemoveSecondaryIdentity(vx, n) =>
        o.put("op", "remove_secondary"); o.put("vertex", vx); o.put("name", n)
      case AddEdge(e) => o.put("op", "add_edge"); o.set[JsonNode]("edge", edgeToJson(e))
      case RemoveEdge(k) => o.put("op", "remove_edge"); keyToJson(o, k)
      case RenameRelation(k, to) =>
        o.put("op", "rename_relation"); keyToJson(o, k); o.put("to", to)
      case RetargetEdge(k, ns, nt) =>
        o.put("op", "retarget_edge"); keyToJson(o, k)
        o.put("new_source", ns); o.put("new_target", nt)
      case InverseEdge(k, rel) =>
        o.put("op", "inverse_edge"); keyToJson(o, k); o.put("relation2", rel)
      case AddEdgeProperty(k, f) =>
        o.put("op", "add_edge_property"); keyToJson(o, k)
        o.set[JsonNode]("field", fieldToJson(f))
      case RenameEdgeProperty(k, a, b) =>
        o.put("op", "rename_edge_property"); keyToJson(o, k); o.put("from", a); o.put("to", b)
      case RemoveEdgeProperty(k, f) =>
        o.put("op", "remove_edge_property"); keyToJson(o, k); o.put("field", f)
      case SetEdgeDirected(k, d) =>
        o.put("op", "set_edge_directed"); keyToJson(o, k); o.put("directed", d)
      case MergeVertices(srcs, into, allow, allowFusion) =>
        o.put("op", "merge_vertices"); strArr(o, "sources", srcs)
        o.put("into", into); o.put("allow_self_relations", allow)
        o.put("allow_row_fusion", allowFusion)
      case RenameRelations(m) =>
        o.put("op", "rename_relations")
        val mo = o.putObject("relations"); m.foreach { case (k, v) => mo.put(k, v) }
      case MergeEdges(srcs, into) =>
        o.put("op", "merge_edges"); strArr(o, "sources", srcs); o.put("into", into)
      case ReplaceEdgeIdentities(k, ids) =>
        o.put("op", "replace_edge_identities"); keyToJson(o, k)
        strArr(o, "identities", ids)
      case SetEdgeFieldType(rel, f, t) =>
        o.put("op", "set_edge_field_type"); o.put("relation", rel)
        o.set[JsonNode]("field", fieldToJson(FieldDef(f, Some(t))))
      case AddVertexIndexes(vx, ixs) =>
        o.put("op", "add_vertex_indexes"); o.put("vertex", vx)
        val arr = o.putArray("indexes")
        ixs.foreach { ix =>
          val io = arr.addObject()
          strArr(io, "fields", ix.fields); io.put("unique", ix.unique)
          ix.name.foreach(io.put("name", _))
        }
      case RemoveVertexIndexes(vx, sets) =>
        o.put("op", "remove_vertex_indexes"); o.put("vertex", vx)
        val arr = o.putArray("field_sets")
        sets.foreach(fs => { val a = arr.addArray(); fs.foreach(a.add) })
      case AddEdgeIndexes(k, ixs) =>
        o.put("op", "add_edge_indexes"); keyToJson(o, k)
        val arr = o.putArray("indexes")
        ixs.foreach { ix =>
          val io = arr.addObject()
          strArr(io, "fields", ix.fields); io.put("unique", ix.unique)
          ix.name.foreach(io.put("name", _))
        }
      case RemoveEdgeIndexes(k, sets) =>
        o.put("op", "remove_edge_indexes"); keyToJson(o, k)
        val arr = o.putArray("field_sets")
        sets.foreach(fs => { val a = arr.addArray(); fs.foreach(a.add) })
    }
    o
  }

  def opFromJson(n: JsonNode): EvolutionOp = n.path("op").asText() match {
    case "add_vertex" => AddVertex(vertexFromJson(n.path("vertex")))
    case "remove_vertex" => RemoveVertex(n.path("name").asText())
    case "rename_vertex" => RenameVertex(n.path("from").asText(), n.path("to").asText())
    case "rename_vertices" =>
      import scala.jdk.CollectionConverters._
      RenameVertices(n.path("vertices").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
    case "add_property" =>
      AddProperty(n.path("vertex").asText(), fieldFromJson(n.path("field")))
    case "remove_property" =>
      RemoveProperty(n.path("vertex").asText(), n.path("field").asText())
    case "rename_property" =>
      RenameProperty(n.path("vertex").asText(), n.path("from").asText(), n.path("to").asText())
    case "set_field_type" =>
      val f = fieldFromJson(n.path("field"))
      SetFieldType(n.path("vertex").asText(), f.name, f.ftype.get)
    case "replace_identity" =>
      ReplaceIdentity(n.path("vertex").asText(),
        identityFromJson(n.path("identity")),
        retire = n.path("retire").asText("demote"),
        retireAs = Option(n.get("retire_as")).filterNot(_.isNull).map(_.asText()))
    case "add_secondary" => AddSecondaryIdentity(n.path("vertex").asText(),
      SecondaryIdentity(n.path("name").asText(), strs(n, "fields")))
    case "remove_secondary" =>
      RemoveSecondaryIdentity(n.path("vertex").asText(), n.path("name").asText())
    case "add_edge" => AddEdge(edgeFromJson(n.path("edge")))
    case "remove_edge" => RemoveEdge(keyFromJson(n))
    case "rename_relation" => RenameRelation(keyFromJson(n), n.path("to").asText())
    case "retarget_edge" => RetargetEdge(keyFromJson(n),
      n.path("new_source").asText(), n.path("new_target").asText())
    case "inverse_edge" => InverseEdge(keyFromJson(n), n.path("relation2").asText())
    case "add_edge_property" => AddEdgeProperty(keyFromJson(n), fieldFromJson(n.path("field")))
    case "rename_edge_property" =>
      RenameEdgeProperty(keyFromJson(n), n.path("from").asText(), n.path("to").asText())
    case "remove_edge_property" =>
      RemoveEdgeProperty(keyFromJson(n), n.path("field").asText())
    case "set_edge_directed" =>
      SetEdgeDirected(keyFromJson(n), n.path("directed").asBoolean(true))
    case "merge_vertices" => MergeVertices(strs(n, "sources"),
      n.path("into").asText(), n.path("allow_self_relations").asBoolean(false),
      n.path("allow_row_fusion").asBoolean(false))
    case "rename_relations" =>
      val mo = n.path("relations")
      RenameRelations(mo.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
    case "merge_edges" => MergeEdges(strs(n, "sources"), n.path("into").asText())
    case "replace_edge_identities" =>
      ReplaceEdgeIdentities(keyFromJson(n), strs(n, "identities"))
    case "set_edge_field_type" =>
      val fd = fieldFromJson(n.path("field"))
      SetEdgeFieldType(n.path("relation").asText(), fd.name, fd.ftype.get)
    case "add_vertex_indexes" =>
      AddVertexIndexes(n.path("vertex").asText(), indexesFromJson(n))
    case "remove_vertex_indexes" =>
      RemoveVertexIndexes(n.path("vertex").asText(), fieldSetsFromJson(n))
    case "add_edge_indexes" =>
      AddEdgeIndexes(keyFromJson(n), indexesFromJson(n))
    case "remove_edge_indexes" =>
      RemoveEdgeIndexes(keyFromJson(n), fieldSetsFromJson(n))
    case other => throw new IllegalArgumentException(s"unknown op kind: $other")
  }

  // --------------------------------------------------------------- helpers

  private def strArr(o: ObjectNode, k: String, xs: Seq[String]): Unit = {
    val a = o.putArray(k); xs.foreach(a.add): Unit
  }
  private def strs(n: JsonNode, k: String): Seq[String] =
    n.path(k).elements().asScala.map(_.asText()).toSeq

  private def indexesFromJson(n: JsonNode): Seq[IndexDef] =
    n.path("indexes").elements().asScala.map(io => IndexDef(
      fields = strs(io, "fields"),
      unique = io.path("unique").asBoolean(true),
      name = Option(io.get("name")).filterNot(_.isNull).map(_.asText()))).toSeq

  private def fieldSetsFromJson(n: JsonNode): Seq[Seq[String]] =
    n.path("field_sets").elements().asScala
      .map(a => a.elements().asScala.map(_.asText()).toSeq).toSeq
}
