package graft.store

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{EdgeKey, GraphSchema, Identity}
import graft.pipeline.PipelineCompiler

/** Executed-parity against the reference's WRITER plane: for each
  * (manifest, batches) corner case `tools/gen_writer_fixture.py` runs the
  * reference's own `DBWriter.write` (graflo/hq/db_writer.py) against the
  * reference's file backend and records the resulting LOGICAL store state
  * (keyed-merge vertex rows; edge endpoint-identity pairs + props as a
  * set), the drop-unkeyed stats, and the exact warning payloads. This spec
  * replays the same manifests/batches through [[PipelineCompiler]] +
  * [[GraphStore.writeReport]] and compares.
  *
  * Covered axes (writer plane, beyond the assemble-plane actor fixture):
  * blank-edge resolution — batch-FLAT positional zip (not per-document),
  * zip truncation on unequal lists, blank-as-target, cross-batch zip
  * scoping, the key-JOIN path when endpoint identity field NAMES intersect
  * (fan-out, mint-never-matches incl. the two-blank-endpoints truth,
  * explicit-null keys, batch-level cross-document joins); drop-unkeyed
  * stats and warning payloads on direct containers (all/mixed/two-field/
  * explicit-null dropped, empty-string KEPT at this plane, per-collection
  * warnings, edges surviving a dropped vertex); cross-batch keyed upsert
  * (field-wise last-wins, in-batch doc order, compound identities, edge
  * re-insert); endpoint resolution in the writer (cross-batch secondary →
  * primary against the stored collections, missing-match drop, ambiguity
  * policies all/first/skip fan-out and the error policy failing the write
  * on BOTH engines); extra_weights resource entries (invalid vertex and absent
  * vertex are skipped without failing the write; an ACTIVE vertex_weights
  * entry CRASHES the reference — db_writer.py:378 reads
  * `weight.properties`, the model declares `fields` — recorded as
  * `error` in the fixture; graft implements the documented intent
  * instead, see DIVERGENCES.md).
  *
  * Minted identities (blank uuid4 / assigned uuid4 vs graft's
  * deterministic digests) are normalized on BOTH sides to a content label
  * (the row minus its minted id field); the generator pre-normalizes the
  * committed fixture, this spec normalizes the graft store the same way.
  */
class ReferenceWriterParitySpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val fixture = mapper.readTree(new java.io.File(
    "/root/repo/src/test/resources/reference_writer_fixture.json"))

  import scala.jdk.CollectionConverters._

  /** fixture generator's canon_value: bools lowercase, integral floats
    * collapse, everything else str()
    */
  private def canon(v: Any): String = v match {
    case null => ""
    case b: Boolean => if (b) "true" else "false"
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case f: Float => canon(f.toDouble)
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case other => other.toString
  }

  private def canonNode(n: JsonNode): String =
    if (n.isBoolean) (if (n.asBoolean()) "true" else "false")
    else if (n.isNumber) {
      val d = n.decimalValue()
      if (d.scale() <= 0 || d.stripTrailingZeros.scale() <= 0)
        d.toBigInteger.toString
      else d.toPlainString
    } else n.asText()

  /** python json.dumps(..., sort_keys=True) of a flat str->str dict */
  private def pyJson(entries: Seq[(String, String)]): String =
    entries.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\": \"" + v + "\"" }
      .mkString("{", ", ", "}")

  private def rowEntries(df: DataFrame, r: org.apache.spark.sql.Row,
      drop: Set[String]): Seq[(String, String)] =
    df.columns.toSeq.filterNot(drop).flatMap { c =>
      Option(r.getAs[Any](c)).map(v => c -> canon(v))
    }

  private def docsToDf(docs: JsonNode): DataFrame = {
    import spark.implicits._
    val lines = docs.elements().asScala.map(_.toString).toSeq
    spark.read.json(lines.toDS())
  }

  /** graft's minted id column for a fixture `minted` vertex: blank/digest
    * vertices mint into the synthetic `_id`; assigned mints live in the
    * declared field itself.
    */
  private def graftMintCol(schema: GraphSchema, vname: String): String =
    schema.vertex(vname).identity match {
      case Identity.Assigned(f) => f
      case _                    => GraphSchema.SyntheticId
    }

  fixture.elements().asScala.toSeq.foreach { c =>
    val name = c.path("name").asText()
    test(s"reference writer parity: $name") {
      val tmp = java.io.File.createTempFile(s"writer_parity_$name", ".yaml")
      tmp.deleteOnExit()
      java.nio.file.Files.writeString(tmp.toPath, c.path("manifest").asText())
      val m = graft.manifest.ManifestLoader.load(tmp.getAbsolutePath)
      val root = java.nio.file.Files
        .createTempDirectory(s"writer_parity_store_$name").toString
      val store = new GraphStore(root, m.schema, spark)

      val refError = !c.path("error").isNull

      // the reference keys a relationless edge (s, t, None); graft's
      // schema synthesizes the default relation "related" — map container/
      // fixture keys onto the schema edge's key like the reference's
      // `_schema_edge_for` relation=None fallback (db_writer.py:416-424)
      def storeKey(src: String, tgt: String, rel: String): EdgeKey =
        m.schema.edges.find(e => e.source == src && e.target == tgt &&
            Option(rel).forall(_ == e.relation))
          .map(_.key).getOrElse(EdgeKey(src, tgt, rel))

      var reports = Seq.empty[UpsertReport]
      def recordWrite(g: graft.graph.GraphOutput): Unit = {
        val rep = store.writeReport(g)
        reports = reports ++ rep.upserts
      }

      val ran = scala.util.Try {
        if (c.path("batches").isArray) {
          // per-batch idSalt = the compile contract for multi-batch ingest
          // (the reference mints uuid4 per doc; graft's deterministic mint
          // discriminates batches via the salt, Compiler.scala idSalt doc).
          // A batch entry is either a bare doc list (the case's default
          // resource) or {resource, docs} for multi-resource sequences.
          c.path("batches").elements().asScala.zipWithIndex.foreach {
            case (batch, i) =>
              val (rname, docs) =
                if (batch.isObject)
                  (batch.path("resource").asText(), batch.path("docs"))
                else (c.path("resource").asText(), batch)
              val df = docsToDf(docs)
              recordWrite(PipelineCompiler.compile(m.schema,
                m.resource(rname), df, idSalt = s"b$i"))
          }
        } else {
          c.path("direct").elements().asScala.foreach { gcSpec =>
            val vertices = gcSpec.path("vertices").properties().asScala.map { e =>
              e.getKey -> docsToDf(e.getValue)
            }.toMap
            val edges = gcSpec.path("edges").elements().asScala.map { e =>
              val src = e.path("source").asText(); val tgt = e.path("target").asText()
              val rel = if (e.path("relation").isNull) null
                else e.path("relation").asText()
              val k = storeKey(src, tgt, rel)
              val sIds = m.schema.vertex(src).idColumns
              val tIds = m.schema.vertex(tgt).idColumns
              val rows = e.path("rows").elements().asScala.toSeq.map { r =>
                val s = r.get(0); val t = r.get(1)
                val p = if (r.size() > 2) r.get(2) else mapper.createObjectNode()
                val o = mapper.createObjectNode()
                sIds.foreach(f => o.set[JsonNode](s"src_$f", s.path(f)): Unit)
                tIds.foreach(f => o.set[JsonNode](s"dst_$f", t.path(f)): Unit)
                p.properties().asScala.foreach(en =>
                  o.set[JsonNode](en.getKey, en.getValue): Unit)
                o.toString
              }
              k -> docsToDf(mapper.readTree(rows.mkString("[", ",", "]")))
            }.toMap
            recordWrite(graft.graph.GraphOutput(vertices, edges))
          }
        }
      }

      if (refError) {
        // the reference raised on this case (executed truth recorded in
        // the fixture). graft_expectation says which kind: "fail" =
        // semantic error both engines owe (e.g. endpoints_on_ambiguous:
        // error); "succeed" = a reference-side crash graft implements the
        // documented intent for (DIVERGENCES.md). Content comparison is
        // meaningless either way.
        if (c.path("graft_expectation").asText("succeed") == "fail")
          assert(ran.isFailure,
            s"[$name] reference raised (${c.path("error").asText()}) but " +
              "graft completed a write the policy forbids")
        else
          assert(ran.isSuccess,
            s"[$name] reference crashed (${c.path("error").asText()}) and " +
              s"graft also failed: ${ran.failed.toOption}")
      } else {
      assert(ran.isSuccess, s"[$name] graft write failed: ${ran.failed.toOption}")

      val minted = c.path("minted").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap

      // ---- vertices: logical store rows match the reference's keyed-merge
      // read plane; minted ids are dropped (graft) / pre-dropped (fixture)
      // and label maps rebuilt for edge endpoint normalization
      val labelMaps = scala.collection.mutable.Map.empty[String, Map[String, String]]
      c.path("store").path("vertices").properties().asScala.foreach { e =>
        val vname = e.getKey
        val exp = e.getValue.elements().asScala.toSeq.map { d =>
          pyJson(d.properties().asScala.toSeq
            .filterNot(_.getValue.isNull)
            .map(en => en.getKey -> canonNode(en.getValue)))
        }.sorted
        val dfOpt = store.readVertices(vname)
        val mintCol = if (minted.contains(vname))
          Some(graftMintCol(m.schema, vname)) else None
        val act: Seq[String] = dfOpt match {
          case None => Nil
          case Some(df0) =>
            val df = df0
            val rows = df.collect().toSeq
            mintCol.foreach { mc =>
              labelMaps(vname) = rows.flatMap { r =>
                Option(r.getAs[Any](mc)).map(v =>
                  canon(v) -> pyJson(rowEntries(df, r, Set(mc, "id"))))
              }.toMap
            }
            rows.map { r =>
              val drop: Set[String] = mintCol match {
                case Some(mc) if mc == GraphSchema.SyntheticId => Set(mc)
                case Some(mc) =>
                  // assigned: drop only minted (uuid-shaped) values, like
                  // the fixture side
                  val v = Option(r.getAs[Any](mc)).map(_.toString).getOrElse("")
                  if (v.matches("[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"))
                    Set(mc)
                  else Set.empty[String]
                case None => Set.empty[String]
              }
              pyJson(rowEntries(df, r, drop))
            }.sorted
        }
        assert(act == exp,
          s"[$name] vertex $vname:\n  spark=$act\n  ref  =$exp")
      }

      // ---- edges: endpoint-identity pairs + props as a SET, minted
      // endpoints label-normalized on both sides
      def edgeLine(src: Seq[(String, String)], dst: Seq[(String, String)],
          props: Seq[(String, String)]): String =
        "src{" + pyJson(src) + "} dst{" + pyJson(dst) + "} props{" + pyJson(props) + "}"

      c.path("store").path("edges").elements().asScala.foreach { grp =>
        val src = grp.path("source").asText(); val tgt = grp.path("target").asText()
        val rel = if (grp.path("relation").isNull) null else grp.path("relation").asText()
        val exp = grp.path("rows").elements().asScala.toSeq.map { rs =>
          val r = mapper.readTree(rs.asText())
          def side(n: JsonNode): Seq[(String, String)] =
            n.properties().asScala.toSeq.map(e => e.getKey -> canonNode(e.getValue))
          edgeLine(side(r.path("src")), side(r.path("dst")),
            r.path("props").properties().asScala.toSeq
              .map(e => e.getKey -> canonNode(e.getValue)))
        }.toSet

        val k = storeKey(src, tgt, rel)
        val act: Set[String] = store.readEdges(k) match {
          case None => Set.empty
          case Some(df) =>
            val sIds = m.schema.vertex(src).idColumns
            val tIds = m.schema.vertex(tgt).idColumns
            df.collect().toSeq.map { r =>
              def side(vname: String, ids: Seq[String], pfx: String)
                  : Seq[(String, String)] =
                if (minted.contains(vname)) {
                  val mc = pfx + graftMintCol(m.schema, vname)
                  val v = Option(r.getAs[Any](mc)).map(canon).getOrElse("")
                  Seq("@label" -> labelMaps.getOrElse(vname, Map.empty)
                    .getOrElse(v, v))
                } else ids.flatMap { f =>
                  Option(r.getAs[Any](pfx + f)).map(v => f -> canon(v))
                }
              // `relation` is part of the edge key on the reference side
              // (concrete storage name), a column on graft's — never props
              val propCols = df.columns.toSeq.filterNot(c0 =>
                c0.startsWith("src_") || c0.startsWith("dst_") ||
                  c0 == "relation")
              edgeLine(side(src, sIds, "src_"), side(tgt, tIds, "dst_"),
                propCols.flatMap(c0 =>
                  Option(r.getAs[Any](c0)).map(v => c0 -> canon(v))))
            }.toSet
        }
        assert(act == exp,
          s"[$name] edges $src->$tgt($rel):\n  spark=${act.toSeq.sorted}\n  ref  =${exp.toSeq.sorted}")
      }
      // edge keys the reference did NOT store must be empty here too
      val expectedKeys = c.path("store").path("edges").elements().asScala
        .map(g => (g.path("source").asText(), g.path("target").asText()))
        .toSet
      m.schema.edges.filterNot(e => expectedKeys((e.source, e.target)))
        .foreach { e =>
          store.readEdges(e.key).foreach { df =>
            assert(df.count() == 0L,
              s"[$name] extra edge rows for ${e.key}")
          }
        }

      // ---- drop stats + warning payloads
      val expDrops = c.path("drops").elements().asScala.toSeq.map { d =>
        (d.path("vertex").asText(), d.path("dropped").asLong(),
          d.path("fields").elements().asScala.map(_.asText()).mkString(","))
      }.sortBy(t => (t._1, t._2))
      val actDrops = reports.filter(_.droppedUnkeyed > 0)
        .groupBy(_.vertex).map { case (v, rs) =>
          (v, rs.map(_.droppedUnkeyed).sum,
            rs.head.identityFields.mkString(","))
        }.toSeq.sortBy(t => (t._1, t._2))
      assert(actDrops == expDrops,
        s"[$name] drops:\n  spark=$actDrops\n  ref  =$expDrops")

      val expWarns = c.path("warnings").elements().asScala.map(_.asText()).toSeq.sorted
      val actWarns = reports.flatMap(_.warning).sorted
      assert(actWarns == expWarns,
        s"[$name] warnings:\n  spark=$actWarns\n  ref  =$expWarns")
      }
    }
  }
}
