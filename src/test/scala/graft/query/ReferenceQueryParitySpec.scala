package graft.query

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.FilterExpr
import graft.model._

/** Executed-parity of the READ-QUERY plane against the reference's own
  * `bfs_neighbors` / `Connection.traverse` / file-backend fetch surface:
  * the fixture (`tools/gen_query_fixture.py`) runs 50 corner cases through
  * the reference's code and records the containers; this spec replays each
  * against [[GraphReader]] over the same stores.
  *
  * What this pins that the DuckDB battery can't: the reference's direction
  * dialect (`_anchor_side`, db/traversal.py:246-265 — OUT anchored at a
  * cross-type edge's TARGET is served inbound; IN never follows a directed
  * cross-type edge), anchor exclusion, dangling endpoints (edge row kept,
  * vertex absent, never expanded), the global per-walk edge budget, and
  * multi-seed traverse as merged independent walks.
  */
class ReferenceQueryParitySpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_query_fixture.json"))

  import scala.jdk.CollectionConverters._

  // ------------------------------------------------------------- helpers

  private def jsonToScala(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isArray) n.elements().asScala.toSeq.map(jsonToScala)
    else if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> jsonToScala(e.getValue)).toMap
    else if (n.isTextual) n.asText()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else n.asDouble()

  /** Canonical "k=v" row rendering shared by both sides: integral-valued
    * doubles collapse (the fixture JSON holds ints; frames hold longs).
    */
  private def canonValue(v: Any): String = v match {
    case null                       => "∅"
    case d: Double if d.isWhole     => d.toLong.toString
    case d: java.lang.Double if d.doubleValue().isWhole => d.longValue().toString
    case other                      => other.toString
  }

  private def canonMap(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${canonValue(v)}" }.mkString("|")

  private def rowToMap(r: Row): Map[String, Any] =
    r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap

  // ------------------------------------------------ store → graft frames

  private def storeSchema(s: JsonNode): GraphSchema = GraphSchema(
    vertices = s.path("schema").path("vertices").elements().asScala.toSeq.map { v =>
      VertexDef(v.path("name").asText(),
        v.path("properties").elements().asScala.toSeq.map(p => FieldDef(p.asText())),
        Identity.Natural(v.path("identity").elements().asScala.toSeq.map(_.asText())))
    },
    edges = s.path("schema").path("edges").elements().asScala.toSeq.map { e =>
      EdgeDef(e.path("source").asText(), e.path("target").asText(),
        e.path("relation").asText(),
        directed = !e.has("directed") || e.path("directed").asBoolean(true))
    })

  private def jsonFrame(objs: Seq[JsonNode]): DataFrame = {
    import spark.implicits._
    spark.read.json(objs.map(_.toString).toDS())
  }

  private case class Built(schema: GraphSchema,
      vertices: Map[String, DataFrame], edges: Map[EdgeKey, DataFrame])

  private lazy val stores: Map[String, Built] =
    fixture.path("stores").properties().asScala.map { e =>
      val s = e.getValue
      val sch = storeSchema(s)
      val vs = s.path("vertices").properties().asScala.map { v =>
        v.getKey -> jsonFrame(v.getValue.elements().asScala.toSeq)
      }.toMap
      val es = s.path("edges").elements().asScala.toSeq.map { ed =>
        val src = ed.path("source").asText(); val tgt = ed.path("target").asText()
        val key = EdgeKey(src, tgt, ed.path("relation").asText())
        val sId = sch.vertex(src).idColumns.head
        val tId = sch.vertex(tgt).idColumns.head
        val rows = ed.path("rows").elements().asScala.toSeq.map { r =>
          val parts = r.elements().asScala.toSeq
          val props = parts(2).properties().asScala
            .map(p => "\"" + p.getKey + "\":" + p.getValue.toString).mkString(",")
          s"""{"src_$sId":${parts(0).path(sId)},"dst_$tId":${parts(1).path(tId)}""" +
            (if (props.nonEmpty) s",$props}" else "}")
        }
        key -> { import spark.implicits._; spark.read.json(rows.toDS()) }
      }.toMap
      e.getKey -> Built(sch, vs, es)
    }.toMap

  private def reader(st: Built, caps: QueryCaps = QueryCaps.Hard): GraphReader =
    new GraphReader(st.schema,
      t => st.vertices.getOrElse(t,
        throw new NoSuchElementException(s"no vertex collection: $t")),
      k => st.edges.get(k),
      caps.copy(timeoutSeconds = 600, maxHops = 10))

  // ------------------------------------------------------ op execution

  private def direction(s: String): Direction = s match {
    case "out" => Direction.Out
    case "in"  => Direction.In
    case _     => Direction.Any
  }

  private def anchorOf(st: Built, vertex: String, key: JsonNode)
      : (Option[String], FilterExpr) =
    if (key.isTextual) (Some(key.asText()), null)
    else (None, FilterExpr.And(key.properties().asScala.toSeq.map(e =>
      FilterExpr.eq(e.getKey, jsonToScala(e.getValue)))))

  private def runContainerOp(st: Built, op: JsonNode): graft.graph.GraphOutput = {
    val rels = if (op.has("edge_types") && !op.path("edge_types").isNull)
      op.path("edge_types").elements().asScala.toSeq.map(_.asText())
    else if (op.has("edge_relations") && !op.path("edge_relations").isNull)
      op.path("edge_relations").elements().asScala.toSeq.map(_.asText())
    else Nil
    val filter = if (op.has("filter") && !op.path("filter").isNull)
      Some(FilterExpr.parse(jsonToScala(op.path("filter")))) else None
    val limit = if (op.has("limit") && !op.path("limit").isNull)
      Some(op.path("limit").asInt()) else None
    op.path("kind").asText() match {
      case "neighbors" =>
        val (rawId, f) = anchorOf(st, op.path("vertex").asText(), op.path("key"))
        reader(st).neighbors(NeighborQuery(op.path("vertex").asText(),
          f, hops = op.path("hops").asInt(1),
          direction = direction(op.path("direction").asText("out")),
          relations = rels, filters = filter, edgeLimit = limit,
          anchorId = rawId))
      case "traverse" =>
        val seeds = op.path("seeds").elements().asScala.toSeq.map { s =>
          (s.path("vertex_type").asText(), s.path("key"))
        }
        val (idSeeds, filterSeeds) = seeds.partition(_._2.isTextual)
        reader(st).traverseQuery(TraverseQuery(
          seeds = filterSeeds.map { case (t, k) =>
            t -> anchorOf(st, t, k)._2 },
          hops = op.path("max_hops").asInt(1),
          direction = direction(op.path("direction").asText("any")),
          relations = rels,
          seedIds = idSeeds.map { case (t, k) => t -> k.asText() },
          edgeLimit = limit, edgeFilter = filter))
    }
  }

  /** Graft container → the fixture's comparison plane. */
  private def containerCanon(st: Built, out: graft.graph.GraphOutput)
      : (Map[String, Set[String]], Map[String, Set[String]]) = {
    val vs = out.vertices.map { case (t, df) =>
      t -> df.collect().map(r => canonMap(rowToMap(r))).toSet
    }.filter(_._2.nonEmpty)
    val es = out.edges.map { case (k, df) =>
      val sId = s"src_${st.schema.vertex(k.source).idColumns.head}"
      val tId = s"dst_${st.schema.vertex(k.target).idColumns.head}"
      val rows = df.collect().map { r =>
        val m = rowToMap(r)
        canonMap(m - sId - tId +
          ("source" -> m(sId)) + ("target" -> m(tId)))
      }.toSet
      s"${k.source}|${k.target}|${k.relation}" -> rows
    }.filter(_._2.nonEmpty)
    (vs, es)
  }

  /** Fixture container result → the same plane. */
  private def fixtureCanon(r: JsonNode)
      : (Map[String, Set[String]], Map[String, Set[String]]) = {
    def side(n: JsonNode): Map[String, Set[String]] =
      n.properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(d =>
          canonMap(jsonToScala(d).asInstanceOf[Map[String, Any]])).toSet
      }.toMap
    (side(r.path("vertices")), side(r.path("edges")))
  }

  // ------------------------------------------------------------- cases

  fixture.path("cases").elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    val st = stores(c.path("store").asText())
    val op = c.path("op")
    val kind = op.path("kind").asText()

    test(s"reference query parity: $name") {
      if (c.path("graft_expectation").asText() == "fail") {
        assert(!c.path("error").isNull, s"$name: reference did not error")
        intercept[Exception](runContainerOp(st, op).sizes())
      } else kind match {
        case "neighbors" | "traverse" =>
          val out = runContainerOp(st, op)
          if (c.path("compare").asText() == "counts") {
            val r = c.path("result")
            val expectedV = r.path("vertex_counts").properties().asScala
              .map(e => e.getKey -> e.getValue.asLong()).toMap
            val gotV = out.vertices.map { case (t, df) => t -> df.count() }
              .filter(_._2 > 0)
            assert(gotV == expectedV)
            val gotE = out.edges.values.map(_.count()).sum
            assert(gotE == r.path("edge_count").asLong())
          } else {
            val (gotV, gotE) = containerCanon(st, out)
            val (expV, expE) = fixtureCanon(c.path("result"))
            assert(gotV == expV, s"$name vertices")
            assert(gotE == expE, s"$name edges")
          }

        case "fetch_docs" =>
          // the file backend evaluates fetch_docs filters in the strict
          // PYTHON flavor (connection.py:194-201) — compilePython is
          // graft's face for exactly that dialect
          val df0 = st.vertices(op.path("class").asText())
          var df = if (op.has("filter") && !op.path("filter").isNull)
            df0.where(FilterExpr.compilePython(
              FilterExpr.parse(jsonToScala(op.path("filter"))), df0.schema))
          else df0
          if (op.has("return_keys") && !op.path("return_keys").isNull) {
            val keys = op.path("return_keys").elements().asScala.toSeq.map(_.asText())
            df = df.select(keys.map(f =>
              if (df.columns.contains(f)) col(f) else lit(null).as(f)): _*)
          }
          if (op.has("unset_keys") && !op.path("unset_keys").isNull)
            df = df.drop(op.path("unset_keys").elements().asScala.toSeq
              .map(_.asText()): _*)
          if (op.has("limit") && !op.path("limit").isNull) {
            val idc = st.schema.vertex(op.path("class").asText()).idColumns
              .filter(df.columns.contains)
            df = (if (idc.nonEmpty) df.orderBy(idc.map(col): _*) else df)
              .limit(op.path("limit").asInt())
          }
          val got = df.collect().map(r => canonMap(rowToMap(r))).toSeq.sorted
          val expected = c.path("result").path("docs").elements().asScala.toSeq
            .map(d => canonMap(jsonToScala(d).asInstanceOf[Map[String, Any]]))
            .sorted
          assert(got == expected)

        case "fetch_present" | "keep_absent" =>
          val stored = st.vertices(op.path("class").asText())
          val matchKeys = op.path("match_keys").elements().asScala.toSeq.map(_.asText())
          val batchDocs = op.path("batch").elements().asScala.toSeq
          val batch = jsonFrame(batchDocs.zipWithIndex.map { case (d, i) =>
            mapper.readTree(d.toString.dropRight(1) + s""","_idx":$i}""")
          })
          if (kind == "keep_absent") {
            // existence anti-join (connection.py keep_absent_documents):
            // no match keys -> the whole batch is absent
            val absent = if (matchKeys.isEmpty) batch
              else batch.join(stored, matchKeys, "left_anti")
            val got = absent.drop("_idx").collect()
              .map(r => canonMap(rowToMap(r))).toSeq.sorted
            val expected = c.path("result").path("absent").elements().asScala
              .toSeq.map(d => canonMap(jsonToScala(d).asInstanceOf[Map[String, Any]]))
              .sorted
            assert(got == expected)
          } else if (op.path("flatten").asBoolean()) {
            val present = if (matchKeys.isEmpty) stored.limit(0)
              else stored.join(batch.select(matchKeys.map(col): _*).distinct(),
                matchKeys, "left_semi")
            val got = present.collect().map(r => canonMap(rowToMap(r))).toSeq.sorted
            val expected = c.path("result").path("present_flat").elements().asScala
              .toSeq.map(d => canonMap(jsonToScala(d).asInstanceOf[Map[String, Any]]))
              .sorted
            assert(got == expected)
          } else {
            // grouped form keys matches by batch index
            val joined = batch.join(stored, matchKeys, "inner")
            val storedCols = stored.columns
            val got = joined.collect().map { r =>
              val m = rowToMap(r)
              m("_idx").toString -> canonMap(
                storedCols.map(f => f -> m(f)).toMap)
            }.groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2).toSet }
            val expected = c.path("result").path("present_grouped").properties()
              .asScala.map { e =>
                e.getKey -> e.getValue.elements().asScala.map(d =>
                  canonMap(jsonToScala(d).asInstanceOf[Map[String, Any]])).toSet
              }.toMap
            assert(got == expected)
          }
      }
    }
  }
}
