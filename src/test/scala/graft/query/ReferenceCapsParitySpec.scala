package graft.query

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkSpec

/** Executed-parity of the query-caps lattice against the reference's
  * `QueryCaps.narrow` / `GraphQuery.finish_init` / `GraphQuery.narrowed`
  * (graflo/architecture/query/caps.py + models.py): the fixture
  * (`tools/gen_caps_fixture.py`) runs 29 cases through the reference's
  * own pydantic models and records narrowed values or the typed
  * CapExceededError. Pins the asymmetries a hand-port gets wrong:
  * finish_init raises even on DEFAULT over-cap values while narrowed
  * clamps them; narrowed raises only on EXPLICIT over-asks; the
  * projection allow-list raises (denied names, sorted) at validation but
  * always intersects (request order) at narrowing; the lattice meet can
  * only lower ceilings, and `narrowed` meets HARD_CAPS first so a widened
  * caps argument cannot raise a ceiling.
  *
  * In graft "explicit vs default" is `Some` vs `None` — the Option plays
  * the reference's `model_fields_set`.
  */
class ReferenceCapsParitySpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_caps_fixture.json"))

  import scala.jdk.CollectionConverters._

  private def capsOf(n: JsonNode): QueryCaps = {
    var c = QueryCaps()
    if (n.has("max_hops")) c = c.copy(maxHops = n.path("max_hops").asInt())
    if (n.has("max_rows")) c = c.copy(maxRows = n.path("max_rows").asInt())
    if (n.has("max_elements")) c = c.copy(maxElements = n.path("max_elements").asInt())
    if (n.has("max_edge_types")) c = c.copy(maxEdgeTypes = n.path("max_edge_types").asInt())
    if (n.has("max_seeds")) c = c.copy(maxSeeds = n.path("max_seeds").asInt())
    if (n.has("timeout_s")) c = c.copy(timeoutSeconds = n.path("timeout_s").asDouble().toInt)
    if (n.has("projection_allow_list") && !n.path("projection_allow_list").isNull)
      c = c.copy(projectionAllowList =
        Some(n.path("projection_allow_list").elements().asScala.toSeq.map(_.asText())))
    c
  }

  private def optInt(n: JsonNode, f: String): Option[Int] =
    if (n.has(f) && !n.path(f).isNull) Some(n.path(f).asInt()) else None
  private def optDouble(n: JsonNode, f: String): Option[Double] =
    if (n.has(f) && !n.path(f).isNull) Some(n.path(f).asDouble()) else None
  private def optSeq(n: JsonNode, f: String): Option[Seq[String]] =
    if (n.has(f) && !n.path(f).isNull)
      Some(n.path(f).elements().asScala.toSeq.map(_.asText())) else None

  /** Run one (surface, kind) through graft's caps faces in the reference's
    * own check order; return Left(capName) or Right(observed values).
    */
  private def run(surface: String, kind: String, fields: JsonNode,
      caps: QueryCaps): Either[Any, Map[String, Any]] =
    try {
      val validateFace = surface == "finish_init"
      // narrowed meets HARD_CAPS first (models.py:102); finish_init uses
      // the caps argument as-is (models.py:63)
      val eff = if (validateFace) caps else QueryCaps.Hard.narrow(caps)
      val limit =
        if (validateFace) eff.validateLimit(optInt(fields, "limit"))
        else eff.narrowLimit(optInt(fields, "limit"))
      val timeout =
        if (validateFace) eff.validateTimeout(optDouble(fields, "timeout_s"))
        else eff.narrowTimeout(optDouble(fields, "timeout_s"))
      val projection = optSeq(fields, "projection") match {
        case Some(p) if validateFace => eff.validateProjection(p); Some(p)
        case Some(p)                 => Some(eff.narrowProjection(p))
        case None                    => None
      }
      var out = Map[String, Any]("limit" -> limit, "timeout_s" -> timeout,
        "projection" -> projection)
      kind match {
        case "neighbor" =>
          val hops = optInt(fields, "hops")
          val h =
            if (validateFace) {
              val v = hops.getOrElse(1)
              if (v > eff.maxHops) throw new CapExceededException("max_hops", v, eff.maxHops)
              v
            } else hops match {
              case Some(v) => eff.narrowHops(v) // explicit: raise on over-ask
              case None    => math.min(1, eff.maxHops) // default: clamp
            }
          out += "hops" -> h
          optSeq(fields, "edge_relations").foreach(r => eff.validateEdgeTypes(r.size))
        case "traverse" =>
          val hops = optInt(fields, "max_hops")
          val h =
            if (validateFace) {
              val v = hops.getOrElse(2)
              if (v > eff.maxHops) throw new CapExceededException("max_hops", v, eff.maxHops)
              v
            } else hops match {
              case Some(v) if v > eff.maxHops =>
                throw new CapExceededException("max_hops", v, eff.maxHops)
              case other => math.min(other.getOrElse(2), eff.maxHops)
            }
          out += "max_hops" -> h
          eff.validateSeeds(fields.path("seeds").size())
          optSeq(fields, "edge_relations").foreach(r => eff.validateEdgeTypes(r.size))
        case "aggregate" =>
          // shape rules live on GraphReader.aggregate; drive it for real
          import org.apache.spark.sql.functions._
          val df = spark.range(1).select(lit("x").as("g"), lit(1L).as("f"))
          val schema = graft.model.GraphSchema(
            Seq(graft.model.VertexDef("v", Nil,
              graft.model.Identity.Natural(Seq("g")))), Nil)
          val reader = new GraphReader(schema, _ => df, _ => None, eff)
          reader.aggregate(AggregateQuery("v",
            if (fields.has("function")) fields.path("function").asText() else "COUNT",
            aggregatedField =
              if (fields.has("aggregated_field")) Some(fields.path("aggregated_field").asText()) else None,
            discriminant =
              if (fields.has("group_by")) Some(fields.path("group_by").asText()) else None
          )).collect(): Unit
        case _ => ()
      }
      Right(out)
    } catch {
      case e: CapExceededException => Left(e)
      case e: IllegalArgumentException => Left(e)
    }

  fixture.path("cases").elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    test(s"reference caps parity: $name") {
      val surface = c.path("surface").asText()
      if (surface == "narrow") {
        val got = capsOf(c.path("caps")).narrow(capsOf(c.path("caps_b")))
        val r = c.path("result")
        assert(got.maxHops == r.path("max_hops").asInt())
        assert(got.maxRows == r.path("max_rows").asInt())
        assert(got.maxElements == r.path("max_elements").asInt())
        assert(got.maxEdgeTypes == r.path("max_edge_types").asInt())
        assert(got.maxSeeds == r.path("max_seeds").asInt())
        assert(got.timeoutSeconds.toDouble == r.path("timeout_s").asDouble())
        val expAllow =
          if (r.path("projection_allow_list").isNull) None
          else Some(r.path("projection_allow_list").elements().asScala.toSeq.map(_.asText()))
        assert(got.projectionAllowList == expAllow)
      } else if (name == "fi_seed_missing_key") {
        // structurally impossible in graft: seeds are typed (vertexType,
        // anchor) pairs, a seed cannot lack its key — assert the reference
        // did error and there is nothing to mirror
        assert(c.path("error").path("type").asText() == "ValueError")
      } else {
        val kind = c.path("kind").asText()
        val outcome = run(surface, kind, c.path("fields"), capsOf(c.path("caps")))
        if (!c.path("error").isNull) {
          val err = c.path("error")
          outcome match {
            case Left(e: CapExceededException) =>
              assert(err.path("type").asText() == "CapExceededError", name)
              assert(e.cap == err.path("cap").asText(), name)
              assert(e.allowed.toString == err.path("allowed").asDouble().toString
                || e.allowed.toString == err.path("allowed").asLong().toString
                || err.path("allowed").isArray, name)
            case Left(e: IllegalArgumentException) =>
              // plain shape rules carry the reference's message verbatim
              assert(err.path("type").asText() == "ValueError", name)
              assert(e.getMessage == err.path("message").asText(), name)
            case Right(v) => fail(s"$name: expected ${err.path("cap").asText()} error, got $v")
          }
        } else {
          val r = c.path("result")
          outcome match {
            case Left(e) => fail(s"$name: unexpected ${e}")
            case Right(v) =>
              if (kind != "aggregate") {
                assert(v("limit") == r.path("limit").asInt(), s"$name limit")
                assert(v("timeout_s") == r.path("timeout_s").asDouble(), s"$name timeout")
                val expProj =
                  if (!r.has("projection") || r.path("projection").isNull) None
                  else Some(r.path("projection").elements().asScala.toSeq.map(_.asText()))
                assert(v("projection") == expProj, s"$name projection")
                if (r.has("hops")) assert(v("hops") == r.path("hops").asInt(), s"$name hops")
                if (r.has("max_hops"))
                  assert(v("max_hops") == r.path("max_hops").asInt(), s"$name max_hops")
              }
          }
        }
      }
    }
  }
}
