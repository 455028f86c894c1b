package graft.evolve

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.evolve.SchemaContext._
import graft.model._
import graft.query.Direction

/** Executed-parity of the bounded schema-context surface against the
  * reference's own `SchemaGraph` / `score_vertices` / `subschema` /
  * `build_card` (graflo/architecture/schema/context/): the fixture
  * (`tools/gen_schema_context_fixture.py`) runs 28 cases through the
  * reference and records adjacency structures, BFS neighborhoods, path
  * enumerations, ranking signals (scores compared BIT-FOR-BIT), budgeted
  * slices (the sliced schema as its compact serialized payload STRING —
  * one assert pins the whole canonical-dict + serializer chain
  * byte-for-byte), elision reports, budget accounting, and orientation
  * cards.
  *
  * Pure metadata — no SparkSession needed.
  */
class ReferenceSchemaContextParitySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_schema_context_fixture.json"))

  import scala.jdk.CollectionConverters._

  // ----------------------------------------------- spec -> graft schema

  private def semanticsOf(n: JsonNode): Option[Semantics] =
    if (!n.has("semantics")) None
    else {
      val s = n.path("semantics")
      Some(Semantics(
        iri = if (s.has("iri")) Some(s.path("iri").asText()) else None,
        exactMatch = if (s.has("exact_match"))
          s.path("exact_match").elements().asScala.toSeq.map(_.asText()) else Nil,
        synonyms = if (s.has("synonyms"))
          s.path("synonyms").elements().asScala.toSeq.map(_.asText()) else Nil,
        unit = if (s.has("unit")) Some(s.path("unit").asText()) else None))
    }

  private def buildSchema(s: JsonNode): (GraphSchema, Map[String, Any]) = {
    val vertices = s.path("vertices").elements().asScala.toSeq.map { v =>
      val props = v.path("properties").elements().asScala.toSeq.map { p =>
        if (p.isTextual) FieldDef(p.asText())
        else FieldDef(p.path("name").asText(),
          if (p.has("type"))
            Some(FieldType.fromName(p.path("type").asText().toLowerCase))
          else None,
          semantics = semanticsOf(p))
      }
      val identity: Identity =
        if (v.path("blank").asBoolean(false)) Identity.Blank
        else if (v.has("hash"))
          Identity.Hash(v.path("hash").elements().asScala.toSeq.map(_.asText()))
        else if (v.has("funnel"))
          Identity.Funnel(v.path("funnel").elements().asScala.toSeq.map(b =>
            FunnelBranch(b.path("id").asText(),
              b.path("when_all_present").elements().asScala.toSeq.map(_.asText()),
              b.path("fields").elements().asScala.toSeq.map(_.asText()))))
        else Identity.Natural(
          v.path("identity").elements().asScala.toSeq.map(_.asText()))
      val secondary = if (v.has("secondary"))
        v.path("secondary").elements().asScala.toSeq.map(x =>
          SecondaryIdentity(x.path("name").asText(),
            x.path("fields").elements().asScala.toSeq.map(_.asText())))
      else Nil
      VertexDef(v.path("name").asText(), props, identity, secondary,
        semantics = semanticsOf(v))
    }
    val edges = s.path("edges").elements().asScala.toSeq.map { e =>
      val declared = e.has("relation") && !e.path("relation").isNull
      EdgeDef(e.path("source").asText(), e.path("target").asText(),
        relation = if (declared) e.path("relation").asText() else "related",
        directed = !e.has("directed") || e.path("directed").asBoolean(true),
        relationDeclared = declared, semantics = semanticsOf(e))
    }
    val md = s.path("metadata")
    val metadata = metadataDict(md.path("name").asText(),
      if (md.has("version")) Some(md.path("version").asText()) else None)
    (GraphSchema(vertices, edges), metadata)
  }

  private lazy val schemas: Map[String, (GraphSchema, Map[String, Any])] =
    fixture.path("schemas").properties().asScala
      .map(e => e.getKey -> buildSchema(e.getValue)).toMap

  // ------------------------------------------------------------ helpers

  /** graft EdgeId -> the fixture's [source, target, relation|null] form. */
  private def eid(schema: GraphSchema, k: EdgeKey): Seq[Any] =
    Seq(k.source, k.target,
      if (schema.edgeByKey(k).relationDeclared) k.relation else null)

  private def jsonEid(n: JsonNode): Seq[Any] =
    n.elements().asScala.toSeq.map(x => if (x.isNull) null else x.asText())

  private def jsonSeq(n: JsonNode): Seq[String] =
    n.elements().asScala.toSeq.map(_.asText())

  private def signalDict(s: VertexSignals): Map[String, String] = Map(
    "name" -> s.name,
    "hop_distance" -> s.hopDistance.map(_.toString).getOrElse("none"),
    "degree" -> s.degree.toString, "identity_mode" -> s.identityMode,
    "property_count" -> s.propertyCount.toString,
    "has_secondary_index" -> s.hasSecondaryIndex.toString,
    // render the float exactly like the fixture JSON will parse back out
    "score" -> graft.expr.PyJsonCanon.pyFloatRepr(s.score))

  private def fixtureSignal(n: JsonNode): Map[String, String] = Map(
    "name" -> n.path("name").asText(),
    "hop_distance" -> (if (n.path("hop_distance").isNull) "none"
                       else n.path("hop_distance").asInt().toString),
    "degree" -> n.path("degree").asInt().toString,
    "identity_mode" -> n.path("identity_mode").asText(),
    "property_count" -> n.path("property_count").asInt().toString,
    "has_secondary_index" -> n.path("has_secondary_index").asBoolean().toString,
    "score" -> graft.expr.PyJsonCanon.pyFloatRepr(n.path("score").asDouble()))

  private def direction(s: String): Direction = s match {
    case "out" => Direction.Out
    case "in"  => Direction.In
    case _     => Direction.Any
  }

  private def budgetOf(n: JsonNode): Budget = {
    def f(field: String, dflt: Option[Int]): Option[Int] =
      if (!n.has(field)) dflt
      else if (n.path(field).isNull) None
      else Some(n.path(field).asInt())
    Budget(f("max_elements", Some(60)), f("max_tokens", Some(4000)),
      f("max_properties_per_vertex", None))
  }

  // -------------------------------------------------------------- cases

  fixture.path("cases").elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    test(s"reference schema-context parity: $name") {
      val (schema, metadata) = schemas(c.path("schema").asText())
      val graph = new SchemaGraph(schema)
      val op = c.path("op")
      val expectError = !c.path("error").isNull

      def run(): Unit = c.path("kind").asText() match {
        case "semantics_invalid" =>
          // the reference rejects `unit:` on a vertex (ValidationError);
          // graft's loader owes the same rejection
          assert(c.path("error").asText() == "ValidationError")
          intercept[IllegalArgumentException] {
            graft.manifest.ManifestLoader.fromYamlString(
              """schema:
                |    metadata: {name: bad}
                |    graph:
                |        vertex_config:
                |            vertices:
                |            -   name: person
                |                properties: [pname]
                |                identity: [pid]
                |                semantics:
                |                    iri: https://schema.org/Person
                |                    unit: kg
                |        edge_config:
                |            edges: []
                |ingestion_model:
                |    resources: [{name: r, pipeline: [{vertex: person}]}]
                |""".stripMargin)
          }

        case "structure" =>
          val r = c.path("result")
          assert(graph.vertexTypes.toSeq.sorted == jsonSeq(r.path("vertex_types")))
          assert(graph.edgeIds.map(eid(schema, _)) ==
            r.path("edge_ids").elements().asScala.toSeq.map(jsonEid))
          graph.vertexTypes.toSeq.sorted.foreach { n =>
            assert(graph.outEdges(n).map(eid(schema, _)) ==
              r.path("out").path(n).elements().asScala.toSeq.map(jsonEid), s"out $n")
            assert(graph.inEdges(n).map(eid(schema, _)) ==
              r.path("in").path(n).elements().asScala.toSeq.map(jsonEid), s"in $n")
            assert(graph.degree(n) == r.path("degree").path(n).asInt(), s"degree $n")
          }
          assert(graph.isolatedTypes == jsonSeq(r.path("isolated")))
          assert(graph.relationVocabulary == jsonSeq(r.path("relations")))

        case "neighbors" =>
          val rels: Option[Set[Option[String]]] =
            if (op.has("edge_relations"))
              Some(op.path("edge_relations").elements().asScala.map(x =>
                if (x.isNull) None else Some(x.asText())).toSet)
            else None
          val nb = graph.schemaNeighbors(op.path("vertex").asText(),
            hops = op.path("hops").asInt(),
            direction = direction(op.path("direction").asText("any")),
            edgeRelations = rels)
          val r = c.path("result")
          val expDist = r.path("distances").properties().asScala
            .map(e => e.getKey -> e.getValue.asInt()).toMap
          assert(nb.distances == expDist)
          assert(nb.edges.map(eid(schema, _)) ==
            r.path("edges").elements().asScala.toSeq.map(jsonEid))
          assert(nb.vertexTypes == jsonSeq(r.path("vertex_types")))

        case "paths" =>
          val paths = graph.relationsBetween(op.path("a").asText(),
            op.path("b").asText(), maxLen = op.path("max_len").asInt(3),
            maxPaths = if (op.has("max_paths")) op.path("max_paths").asInt() else 20,
            direction = direction(op.path("direction").asText("any")))
          val exp = c.path("result").path("paths").elements().asScala.toSeq.map { p =>
            (jsonSeq(p.path("vertices")),
              p.path("edges").elements().asScala.toSeq.map(jsonEid))
          }
          assert(paths.map(p => (p.vertices, p.edges.map(eid(schema, _)))) == exp)

        case "rank" =>
          val w = if (op.has("weights")) {
            val wn = op.path("weights")
            RankingWeights(
              hopDecay = if (wn.has("hop_decay")) wn.path("hop_decay").asDouble() else 0.55,
              degree = if (wn.has("degree")) wn.path("degree").asDouble() else 0.20,
              identity = if (wn.has("identity")) wn.path("identity").asDouble() else 0.15,
              properties = if (wn.has("properties")) wn.path("properties").asDouble() else 0.10,
              indexed = if (wn.has("indexed")) wn.path("indexed").asDouble() else 0.10)
          } else RankingWeights()
          val got = scoreVertices(graph,
            op.path("seeds").elements().asScala.toSeq.map(_.asText()),
            weights = w, maxHops = op.path("max_hops").asInt(3))
            .map(signalDict)
          val exp = c.path("result").path("signals").elements().asScala.toSeq
            .map(fixtureSignal)
          assert(got == exp)

        case "subschema" =>
          val (sliced, report) = subschema(schema,
            op.path("seeds").elements().asScala.toSeq.map(_.asText()),
            budget = budgetOf(op.path("budget")),
            maxHops = op.path("max_hops").asInt(3),
            metadata = metadata)
          val r = c.path("result")
          // the single load-bearing assert: byte-identical slice payload
          assert(serializeCompact(schemaDict(sliced, metadata,
            report.elidedProperties.map { case (k, v) => k -> v.toSet })) ==
            r.path("payload").asText(), s"$name payload")
          assert(report.budget.elementsUsed ==
            r.path("budget").path("elements_used").asInt())
          assert(report.budget.estimatedTokens ==
            r.path("budget").path("estimated_tokens").asInt())
          assert(report.budget.serializedChars ==
            r.path("budget").path("serialized_chars").asInt())
          assert(report.budget.exhaustedBy ==
            r.path("budget").path("exhausted_by").asText())
          assert(report.truncated == r.path("truncated").asBoolean())
          val expV = r.path("elided_vertices").elements().asScala.toSeq.map { e =>
            (e.path("name").asText(), e.path("reason").asText(),
              e.path("degree").asInt(),
              if (e.path("hop_distance").isNull) -1 else e.path("hop_distance").asInt(),
              e.path("drill_in").asText())
          }
          assert(report.elidedVertices.map(e =>
            (e.name, e.reason, e.degree, e.hopDistance.getOrElse(-1), e.drillIn)) == expV)
          val expE = r.path("elided_edges").elements().asScala.toSeq.map(e =>
            (jsonEid(e.path("edge_id")), e.path("reason").asText()))
          assert(report.elidedEdges.map(e =>
            (eid(schema, e.edgeId), e.reason)) == expE)
          val expProps = r.path("elided_properties").properties().asScala
            .map(e => e.getKey -> jsonSeq(e.getValue)).toMap
          assert(report.elidedProperties == expProps)

        case "card" =>
          val md = fixture.path("schemas").path(c.path("schema").asText())
            .path("metadata")
          val card = buildCard(schema,
            topN = if (op.has("top_n")) op.path("top_n").asInt() else 10,
            maxNames = if (op.has("max_names")) op.path("max_names").asInt() else 25,
            name = md.path("name").asText(),
            version = if (md.has("version")) Some(md.path("version").asText()) else None)
          assert(serializeCompact(card.dict) == c.path("result").path("payload").asText(),
            s"$name payload")
          assert(card.estimatedTokens == c.path("result").path("estimated_tokens").asInt())
      }

      if (c.path("kind").asText() == "semantics_invalid") run() // asserts inline
      else if (expectError) intercept[Exception](run())
      else run()
    }
  }
}
