package graft.evolve

import scala.collection.immutable.VectorMap

/** Document-plane pipeline rewrites for the evolution ingestion-model
  * cascade — the reference's `graflo/architecture/evolution/rewrite.py`
  * (1-1157) re-expressed over ordered Scala maps.
  *
  * The manifest's ingestion block is a DOCUMENT (the reference keeps
  * `Resource.pipeline` as `list[dict]` and rewrites the dicts; resource.py
  * declares `pipeline: list[dict[str, Any]]`), so the cascade operates on
  * a document value model: `VectorMap[String, Any]` for objects (insertion
  * -ordered, like Python dicts — collision semantics match: first insertion
  * fixes position, later assignment overwrites the value), `Vector[Any]`
  * for arrays, `String`/`Long`/`Double`/`Boolean`/`null` for scalars.
  * Executed parity is pinned by `ReferenceRewriteParitySpec` over
  * `tools/gen_rewrite_fixture.py` fixtures (the reference's own
  * `apply_evolution` run on each case).
  */
object Rewrite {

  type Obj = VectorMap[String, Any]
  val EmptyObj: Obj = VectorMap.empty[String, Any]

  def asObj(x: Any): Option[Obj] = x match {
    case m: VectorMap[_, _] => Some(m.asInstanceOf[Obj])
    case m: collection.Map[_, _] =>
      Some(VectorMap.from(m.asInstanceOf[collection.Map[String, Any]]))
    case _ => None
  }
  def asArr(x: Any): Option[Vector[Any]] = x match {
    case v: Vector[_] => Some(v.asInstanceOf[Vector[Any]])
    case s: Seq[_]    => Some(s.asInstanceOf[Seq[Any]].toVector)
    case _            => None
  }
  def asStr(x: Any): Option[String] = x match {
    case s: String => Some(s); case _ => None
  }
  private def get(m: Obj, k: String): Any = m.getOrElse(k, null)
  private def objAt(m: Obj, k: String): Option[Obj] = asObj(get(m, k))
  private def arrAt(m: Obj, k: String): Option[Vector[Any]] = asArr(get(m, k))
  private def strAt(m: Obj, k: String): Option[String] = asStr(get(m, k))

  /** Python `data.update(inner)`: existing keys overwrite in place, new
    * keys append in `inner` order.
    */
  private def update(base: Obj, inner: Obj): Obj =
    inner.foldLeft(base)((d, kv) => d.updated(kv._1, kv._2))

  // --------------------------------------------------------- normalization

  /** steps/normalize.py `_steps_list`: a single dict becomes `[dict]`. */
  private def stepsList(v: Any): Vector[Any] = v match {
    case xs: Seq[_] => xs.asInstanceOf[Seq[Any]].toVector
    case other      => Vector(other)
  }

  /** steps/normalize.py `normalize_actor_step`: give a raw step dict a
    * `type` and flat structure. Non-dicts pass through.
    */
  def normalizeActorStep(data0: Any): Any = asObj(data0) match {
    case None => data0
    case Some(d0) =>
      var d = d0
      if (d.contains("type")) return d
      if (d.contains("vertex")) return d.updated("type", "vertex")
      if (d.contains("edge")) {
        val inner = get(d, "edge"); d = d.removed("edge")
        asObj(inner).foreach(i => d = update(d, i))
        return d.updated("type", "edge")
      }
      if ((d.contains("source") || d.contains("from")) &&
          (d.contains("target") || d.contains("to")))
        return d.updated("type", "edge")
      if (d.contains("create_edge")) {
        val inner = get(d, "create_edge"); d = d.removed("create_edge")
        asObj(inner).foreach(i => d = update(d, i))
        return d.updated("type", "edge")
      }
      if (d.contains("descend")) {
        val inner0 = get(d, "descend"); d = d.removed("descend")
        asObj(inner0).foreach { i0 =>
          var i = i0
          if (i.contains("pipeline"))
            i = i.updated("pipeline", stepsList(get(i, "pipeline")).map(normalizeActorStep))
          else if (i.contains("apply")) {
            i = i.updated("pipeline", stepsList(get(i, "apply")).map(normalizeActorStep))
              .removed("apply")
          }
          d = update(d, i)
        }
        d = d.updated("type", "descend")
        if (!d.contains("pipeline") && d.contains("apply"))
          d = d.updated("pipeline", stepsList(get(d, "apply")).map(normalizeActorStep))
            .removed("apply")
        return d
      }
      if (d.contains("vertex_router")) {
        val inner = get(d, "vertex_router"); d = d.removed("vertex_router")
        asObj(inner).foreach(i => d = update(d, i))
        return d.updated("type", "vertex_router")
      }
      if (d.contains("transform")) {
        val inner = get(d, "transform")
        asObj(inner) match {
          case None => throw new IllegalArgumentException(
            "transform step must be an object with rename or call.")
          case Some(i) =>
            d = update(d.removed("transform"), i)
            return d.updated("type", "transform")
        }
      }
      if (d.contains("apply"))
        return d.updated("type", "descend")
          .updated("pipeline", stepsList(get(d, "apply")).map(normalizeActorStep))
          .removed("apply")
      if (d.contains("pipeline"))
        return d.updated("type", "descend")
          .updated("pipeline", stepsList(get(d, "pipeline")).map(normalizeActorStep))
      if (d.contains("rename") || d.contains("call"))
        return d.updated("type", "transform")
      d
  }

  // --------------------------------------------------- Weight model plane

  /** `Weight.model_validate(raw).to_dict(skip_defaults=False)` — the
    * reference's Weight (graph_types/index_config.py:45, extending
    * ABCFields) has exactly name / fields / keep_vertex_name / map /
    * filter; extra keys are forbidden, `name=None` is dropped by
    * exclude_none, defaults materialize.
    */
  def weightToDict(raw: Any): Obj = asObj(raw) match {
    case None => throw new IllegalArgumentException(s"Weight payload must be a mapping, got $raw")
    case Some(m) =>
      val known = Set("name", "fields", "keep_vertex_name", "map", "filter")
      val extra = m.keys.filterNot(known).toSeq.sorted
      if (extra.nonEmpty) throw new IllegalArgumentException(
        s"Weight: extra fields not permitted: ${extra.mkString(", ")}")
      var out = EmptyObj
      strAt(m, "name").foreach(n => out = out.updated("name", n))
      out = out.updated("fields", arrAt(m, "fields").getOrElse(Vector()))
      out = out.updated("keep_vertex_name",
        m.get("keep_vertex_name") match { case Some(b: Boolean) => b; case _ => true })
      out = out.updated("map", objAt(m, "map").getOrElse(EmptyObj))
      out.updated("filter", objAt(m, "filter").getOrElse(EmptyObj))
  }

  /** rewrite.py:14-51 `rewrite_vertex_weights_vertex_field_names`: rewrite
    * Weight field/map/filter keys; `weight.name` selects which vertex's
    * rename map applies. Every weight normalizes through the model either
    * way (the reference round-trips Weight.model_validate → to_dict).
    */
  def rewriteVertexWeightsVertexFieldNames(
      weights: Vector[Any],
      renamesByVertex: Map[String, Seq[(String, String)]]): Vector[Any] = {
    if (weights.isEmpty) return Vector()
    weights.map { raw =>
      var w = weightToDict(raw)
      val per: Map[String, String] = strAt(w, "name")
        .flatMap(renamesByVertex.get).map(_.toMap).getOrElse(Map.empty)
      if (per.nonEmpty) {
        def remap(k: Any): Any = k match {
          case s: String => per.getOrElse(s, s); case other => other
        }
        w = w.updated("fields", arrAt(w, "fields").getOrElse(Vector()).map(remap))
        w = w.updated("map", VectorMap.from(objAt(w, "map").getOrElse(EmptyObj)
          .map { case (k, v) => (remap(k).toString, v) }))
        w = w.updated("filter", VectorMap.from(objAt(w, "filter").getOrElse(EmptyObj)
          .map { case (k, v) => (remap(k).toString, v) }))
      }
      w
    }
  }

  /** rewrite.py:54-74 `rewrite_extra_weights_vertex_field_names`. */
  def rewriteExtraWeightsVertexFieldNames(
      entries: Vector[Any],
      renamesByVertex: Map[String, Seq[(String, String)]]): Vector[Any] = {
    if (entries.isEmpty) return Vector()
    entries.map { entry =>
      asObj(entry) match {
        case Some(d) =>
          (arrAt(d, "vertex_weights"), renamesByVertex.nonEmpty) match {
            case (Some(vw), true) =>
              d.updated("vertex_weights",
                rewriteVertexWeightsVertexFieldNames(vw, renamesByVertex))
            case _ => d
          }
        case None => entry
      }
    }
  }

  // ------------------------------------------------- entity-name rewrites

  /** rewrite.py:85-100 `rewrite_vertex_weight_names`: `vertex_weights[].name`
    * is a VERTEX name (it selects whose observation columns the weight
    * reads); missing it leaves a pipeline pointing at a type the schema no
    * longer has.
    */
  def rewriteVertexWeightNames(payload: Obj, vertexName: String => String): Obj =
    arrAt(payload, "vertex_weights") match {
      case None => payload
      case Some(ws) => payload.updated("vertex_weights", ws.map { w =>
        asObj(w) match {
          case Some(wd) if strAt(wd, "name").isDefined =>
            wd.updated("name", vertexName(strAt(wd, "name").get))
          case _ => w
        }
      })
    }

  /** rewrite.py:103-135 `_rewrite_entity_names_in_edge_step`. */
  private def rewriteEntityNamesInEdgeStep(
      payload0: Obj, vertexName: String => String, edgeName: String => String): Obj = {
    var p = payload0
    Seq("from", "to", "source", "target").foreach { k =>
      strAt(p, k).foreach(v => p = p.updated(k, vertexName(v)))
    }
    p = rewriteVertexWeightNames(p, vertexName)
    strAt(p, "relation").foreach(r => p = p.updated("relation", edgeName(r)))
    objAt(p, "relation_map").foreach { rm =>
      p = p.updated("relation_map", VectorMap.from(rm.map {
        case (raw, mapped: String) => (raw, edgeName(mapped))
        case other => other
      }))
    }
    arrAt(p, "links").foreach { links =>
      p = p.updated("links", links.map {
        case l if asObj(l).isDefined =>
          rewriteEntityNamesInEdgeStep(asObj(l).get, vertexName, edgeName)
        case l => l
      })
    }
    p
  }

  /** rewrite.py:138-225 `rewrite_entity_names_in_pipeline`: rename
    * vertices/relations in a pipeline payload (the rename-entities cascade
    * of rename_vertices / rename_relations / merge_edges).
    */
  def rewriteEntityNamesInPipeline(
      step: Any,
      vertices: Map[String, String] = Map.empty,
      edges: Map[String, String] = Map.empty): Any = {
    def vn(s: String) = vertices.getOrElse(s, s)
    def en(s: String) = edges.getOrElse(s, s)
    step match {
      case xs: Seq[_] =>
        xs.asInstanceOf[Seq[Any]].toVector
          .map(rewriteEntityNamesInPipeline(_, vertices, edges))
      case _ => asObj(step) match {
        case None => step
        case Some(s0) =>
          var s = s0
          strAt(s, "vertex").foreach(v => s = s.updated("vertex", vn(v)))
          objAt(s, "type_map").foreach { tm =>
            s = s.updated("type_map", VectorMap.from(tm.map {
              case (raw, mapped: String) => (raw, vn(mapped))
              case other => other
            }))
          }
          objAt(s, "vertex_from_map").foreach { vfm =>
            s = s.updated("vertex_from_map",
              VectorMap.from(vfm.map { case (k, v) => (vn(k), v) }))
          }
          objAt(s, "edge") match {
            case Some(e) =>
              s = s.updated("edge", rewriteEntityNamesInEdgeStep(e, vn, en))
            case None if strAt(s, "type").contains("edge") =>
              // flat form: the edge payload IS the step (only string-valued
              // endpoint keys are touched, so a vertex step's dict-valued
              // `from` column map is unaffected)
              s = rewriteEntityNamesInEdgeStep(s, vn, en)
            case None =>
          }
          objAt(s, "create_edge").foreach(ce =>
            s = s.updated("create_edge", rewriteEntityNamesInEdgeStep(ce, vn, en)))
          objAt(s, "descend").foreach { d0 =>
            var d = d0
            if (d.contains("apply"))
              d = d.updated("apply",
                rewriteEntityNamesInPipeline(get(d, "apply"), vertices, edges))
            if (d.contains("pipeline"))
              d = d.updated("pipeline",
                rewriteEntityNamesInPipeline(get(d, "pipeline"), vertices, edges))
            s = s.updated("descend", d)
          }
          arrAt(s, "apply").foreach(a =>
            s = s.updated("apply", rewriteEntityNamesInPipeline(a, vertices, edges)))
          arrAt(s, "pipeline").foreach(p =>
            s = s.updated("pipeline", rewriteEntityNamesInPipeline(p, vertices, edges)))
          s
      }
    }
  }

  // ------------------------------------------- endpoint-selector rewrites

  /** rewrite.py:228 `_PRIMARY_SELECTORS = (None, "identity")`. */
  private def isPrimarySelector(v: Any): Boolean = v == null || v == "identity"

  /** rewrite.py:231-237 `_endpoint_vertex`. */
  private def endpointVertex(payload: Obj, keys: String*): Option[String] =
    keys.iterator.flatMap(k => strAt(payload, k)).nextOption()

  /** rewrite.py:240-266 `_pin_endpoint_selectors_in_edge_payload`: only
    * endpoints currently resolving via the PRIMARY identity are touched —
    * a step already naming a secondary identity expresses explicit intent.
    */
  private def pinSelectorsInEdgePayload(payload0: Obj, selectors: Map[String, String]): Obj = {
    var p = payload0
    Seq((Seq("source", "from"), "source_match"), (Seq("target", "to"), "target_match"))
      .foreach { case (endpointKeys, matchKey) =>
        endpointVertex(p, endpointKeys: _*).flatMap(selectors.get).foreach { sel =>
          if (isPrimarySelector(get(p, matchKey)))
            p = p.updated(matchKey, sel)
        }
      }
    arrAt(p, "links").foreach { links =>
      p = p.updated("links", links.map {
        case l if asObj(l).isDefined => pinSelectorsInEdgePayload(asObj(l).get, selectors)
        case l => l
      })
    }
    p
  }

  /** rewrite.py:269-292 `_pin_endpoint_selectors_in_step`. */
  private def pinSelectorsInStep(step: Any, selectors: Map[String, String]): Any =
    step match {
      case xs: Seq[_] =>
        xs.asInstanceOf[Seq[Any]].toVector.map(pinSelectorsInStep(_, selectors))
      case _ => asObj(step) match {
        case None => step
        case Some(s0) =>
          var s = s0
          Seq("edge", "create_edge").foreach { k =>
            objAt(s, k).foreach(p => s = s.updated(k, pinSelectorsInEdgePayload(p, selectors)))
          }
          objAt(s, "descend").foreach { d0 =>
            var d = d0
            Seq("apply", "pipeline").foreach { k =>
              if (d.contains(k) && get(d, k) != null)
                d = d.updated(k, pinSelectorsInStep(get(d, k), selectors))
            }
            s = s.updated("descend", d)
          }
          Seq("apply", "pipeline").foreach { k =>
            arrAt(s, k).foreach(n => s = s.updated(k, pinSelectorsInStep(n, selectors)))
          }
          s
      }
    }

  /** rewrite.py:295-308 `rewrite_endpoint_selectors_in_pipeline`: used by
    * ReplaceIdentityOp `endpoints: pin_to_retired` so edge steps keep
    * matching on the identity that was just retired.
    */
  def rewriteEndpointSelectorsInPipeline(
      pipeline: Vector[Any], selectors: Map[String, String]): Vector[Any] =
    if (selectors.isEmpty) pipeline
    else pinSelectorsInStep(pipeline, selectors).asInstanceOf[Vector[Any]]

  /** rewrite.py:311-372 `collect_endpoint_selectors`: every (vertex,
    * selector) an edge step depends on — primary-identity endpoints are
    * omitted (they carry no dependency on a named secondary identity).
    */
  def collectEndpointSelectors(pipeline: Vector[Any]): Vector[(String, Any)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Any)]
    def inEdge(payload: Obj): Unit = {
      Seq((Seq("source", "from"), "source_match"), (Seq("target", "to"), "target_match"))
        .foreach { case (endpointKeys, matchKey) =>
          endpointVertex(payload, endpointKeys: _*).foreach { vtx =>
            val sel = get(payload, matchKey)
            if (!isPrimarySelector(sel)) sel match {
              case s: String => out += ((vtx, s))
              case xs: Seq[_] => out += ((vtx, xs))
              case _ =>
            }
          }
        }
      arrAt(payload, "links").foreach(_.foreach(l => asObj(l).foreach(inEdge)))
    }
    def inStep(step: Any): Unit = step match {
      case xs: Seq[_] => xs.foreach(inStep)
      case _ => asObj(step).foreach { s =>
        Seq("edge", "create_edge").foreach(k => objAt(s, k).foreach(inEdge))
        objAt(s, "descend").foreach { d =>
          Seq("apply", "pipeline").foreach(k =>
            if (d.contains(k) && get(d, k) != null) inStep(get(d, k)))
        }
        Seq("apply", "pipeline").foreach(k => arrAt(s, k).foreach(inStep))
      }
    }
    inStep(pipeline)
    out.toVector
  }

  // ------------------------------------------------------ edge retargets

  type EdgeIdKey = (String, String, Option[String])

  /** rewrite.py:375-396 `_retarget_edge_payload`. */
  private def retargetEdgePayload(payload0: Obj,
      mapping: Map[EdgeIdKey, (String, String)]): Obj = {
    var p = payload0
    val source = endpointVertex(p, "source", "from")
    val target = endpointVertex(p, "target", "to")
    if (source.isDefined && target.isDefined) {
      val rel = strAt(p, "relation")
      mapping.get((source.get, target.get, rel)).foreach { case (ns, nt) =>
        p = p.updated(if (p.contains("source")) "source" else "from", ns)
        p = p.updated(if (p.contains("target")) "target" else "to", nt)
      }
    }
    arrAt(p, "links").foreach { links =>
      p = p.updated("links", links.map {
        case l if asObj(l).isDefined => retargetEdgePayload(asObj(l).get, mapping)
        case l => l
      })
    }
    p
  }

  /** rewrite.py:399-441 `rewrite_edge_endpoints_in_pipeline`: keyed on the
    * full (source, target, relation) triple, so an edge step between the
    * same pair of types under a different relation is left alone.
    */
  def rewriteEdgeEndpointsInPipeline(pipeline: Vector[Any],
      mapping: Map[EdgeIdKey, (String, String)]): Vector[Any] = {
    if (mapping.isEmpty) return pipeline
    def inStep(step: Any): Any = step match {
      case xs: Seq[_] => xs.asInstanceOf[Seq[Any]].toVector.map(inStep)
      case _ => asObj(step) match {
        case None => step
        case Some(s0) =>
          var s = s0
          Seq("edge", "create_edge").foreach(k =>
            objAt(s, k).foreach(p => s = s.updated(k, retargetEdgePayload(p, mapping))))
          objAt(s, "descend").foreach { d0 =>
            var d = d0
            Seq("apply", "pipeline").foreach(k =>
              if (d.contains(k) && get(d, k) != null) d = d.updated(k, inStep(get(d, k))))
            s = s.updated("descend", d)
          }
          Seq("apply", "pipeline").foreach(k =>
            arrAt(s, k).foreach(n => s = s.updated(k, inStep(n))))
          s
      }
    }
    pipeline.map(inStep)
  }

  // ----------------------------------------------- vertex-name rewrites

  /** rewrite.py:444-478 `_merge_vertex_from_map`: remap vertex_from_map
    * keys, UNIONING column maps that collide (a merge points several names
    * at one; keeping the last silently drops the other sources' mappings).
    * Fields present in both must agree.
    */
  def mergeVertexFromMap(vfm: Obj, mapping: Map[String, String]): Obj = {
    var out = EmptyObj
    var origin = Map.empty[String, Map[String, String]]
    vfm.foreach { case (name, columns) =>
      val newName = mapping.getOrElse(name, name)
      if (!out.contains(newName)) {
        out = out.updated(newName, columns)
        origin += newName -> asObj(columns).getOrElse(EmptyObj)
          .keys.map(f => f -> name).toMap
      } else {
        val existing = get(out, newName)
        (asObj(existing), asObj(columns)) match {
          case (Some(ex), Some(cols)) =>
            var merged = ex
            var org = origin(newName)
            cols.foreach { case (field, column) =>
              if (merged.contains(field) && get(merged, field) != column)
                throw new IllegalArgumentException(
                  s"cannot merge vertex_from_map for '$newName': field '$field' " +
                    s"reads '${get(merged, field)}' for '${org(field)}' but " +
                    s"'$column' for '$name'")
              merged = merged.updated(field, column)
              org += field -> name
            }
            out = out.updated(newName, merged)
            origin += newName -> org
          case _ => throw new IllegalArgumentException(
            s"cannot merge vertex_from_map entries for '$newName': " +
              "expected per-vertex field maps")
        }
      }
    }
    out
  }

  /** rewrite.py:487-534 `rewrite_vertex_names_in_step` (normalizes the
    * step first, like the reference).
    */
  def rewriteVertexNamesInStep(step: Obj, mapping: Map[String, String]): Obj = {
    if (mapping.isEmpty) return step
    var out = asObj(normalizeActorStep(step)).get
    strAt(out, "type").getOrElse("") match {
      case "vertex" =>
        strAt(out, "vertex").foreach(v =>
          if (mapping.contains(v)) out = out.updated("vertex", mapping(v)))
      case "vertex_router" =>
        objAt(out, "type_map").foreach { tm =>
          out = out.updated("type_map", VectorMap.from(tm.map {
            // the reference maps str(v) — non-strings coerce through toString
            case (k, v) => (k, mapping.getOrElse(String.valueOf(v), String.valueOf(v)))
          }))
        }
        objAt(out, "vertex_from_map").foreach(vfm =>
          out = out.updated("vertex_from_map", mergeVertexFromMap(vfm, mapping)))
      case "edge" =>
        Seq("source", "from", "target", "to").foreach { k =>
          strAt(out, k).foreach(v =>
            if (mapping.contains(v)) out = out.updated(k, mapping(v)))
        }
        out = rewriteVertexWeightNames(out, n => mapping.getOrElse(n, n))
      case "descend" =>
        arrAt(out, "pipeline").foreach { pl =>
          out = out.updated("pipeline", pl.collect {
            case x if asObj(x).isDefined => rewriteVertexNamesInStep(asObj(x).get, mapping)
          })
        }
      case _ =>
    }
    out
  }

  /** rewrite.py:543-549 `rewrite_vertex_names_in_pipeline`. */
  def rewriteVertexNamesInPipeline(pipeline: Vector[Any], mapping: Map[String, String]): Vector[Any] =
    if (mapping.isEmpty) pipeline
    else pipeline.map {
      case s if asObj(s).isDefined => rewriteVertexNamesInStep(asObj(s).get, mapping)
      case s => throw new IllegalArgumentException(s"expected dict step, got $s")
    }

  /** rewrite.py:552-586 `rewrite_vertex_names_in_value`: deep-rewrite
    * pipelines, infer specs, extra_weights, nested dicts.
    */
  def rewriteVertexNamesInValue(obj: Any, mapping: Map[String, String]): Any = {
    if (mapping.isEmpty) return obj
    obj match {
      case xs: Seq[_] =>
        xs.asInstanceOf[Seq[Any]].toVector.map(rewriteVertexNamesInValue(_, mapping))
      case _ => asObj(obj) match {
        case None => obj
        case Some(d) =>
          if (objAt(d, "edge").isDefined) {
            var inner = d.updated("edge", rewriteVertexNamesInValue(get(d, "edge"), mapping))
            // an extra_weights entry carries vertex_weights alongside its edge
            inner = rewriteVertexWeightNames(inner, n => mapping.getOrElse(n, n))
            return inner
          }
          val t = strAt(d, "type")
          if (t.exists(Set("vertex", "edge", "descend", "vertex_router")))
            return rewriteVertexNamesInStep(d, mapping)
          if (t.contains("transform")) return d
          if (d.contains("source") && d.contains("target")) {
            var out = d
            strAt(out, "source").foreach(s =>
              if (mapping.contains(s)) out = out.updated("source", mapping(s)))
            strAt(out, "target").foreach(s =>
              if (mapping.contains(s)) out = out.updated("target", mapping(s)))
            return rewriteVertexWeightNames(out, n => mapping.getOrElse(n, n))
          }
          if (strAt(d, "vertex").isDefined && t.isEmpty) {
            val v = strAt(d, "vertex").get
            return if (mapping.contains(v)) d.updated("vertex", mapping(v)) else d
          }
          VectorMap.from(d.map { case (k, v) => (k, rewriteVertexNamesInValue(v, mapping)) })
      }
    }
  }

  // ------------------------------------------- vertex-field-name rewrites

  /** rewrite.py:589-614 `_apply_vertex_field_rename_to_from_doc`: rename
    * keys of the `{vertex_field: doc_field}` map; inject
    * `{new_field: old_field}` for renames not yet covered so the doc keeps
    * addressing the attribute via its original name.
    */
  def applyVertexFieldRenameToFromDoc(
      fromDoc: Option[Obj], renames: Seq[(String, String)]): Obj = {
    var out = EmptyObj
    fromDoc.foreach(_.foreach { case (vF, dF) =>
      val mapped = renames.toMap.getOrElse(vF, vF)
      out = out.updated(mapped, dF match { case s: String => s; case _ => vF })
    })
    renames.foreach { case (oldField, newField) =>
      if (!out.contains(newField)) out = out.updated(newField, oldField)
    }
    out
  }

  /** rewrite.py:617-637 `_apply_vertex_field_rename_to_transform_rename`:
    * rewrite rename-map VALUES that match old vertex field names in scope.
    */
  def applyVertexFieldRenameToTransformRename(
      renameMap: Option[Obj], inScope: Map[String, String]): Obj = {
    var out = EmptyObj
    renameMap.foreach(_.foreach { case (k, v) =>
      val mapped = v match { case s: String => inScope.getOrElse(s, s); case other => String.valueOf(other) }
      out = out.updated(k, mapped)
    })
    out
  }

  /** rewrite.py:640-659 `_step_vertices`: names introduced by one step. */
  private def stepVertices(step: Obj): Set[String] = {
    val s = asObj(normalizeActorStep(step)).get
    strAt(s, "type").getOrElse("") match {
      case "vertex" => strAt(s, "vertex").toSet
      case "vertex_router" =>
        val fromTm = objAt(s, "type_map").map(_.values.collect { case v: String => v }.toSet)
          .getOrElse(Set.empty[String])
        val fromVfm = objAt(s, "vertex_from_map").map(_.keys.toSet).getOrElse(Set.empty[String])
        fromTm ++ fromVfm
      case _ => Set.empty
    }
  }

  /** rewrite.py:662-668 `_collect_level_vertices`. */
  private def collectLevelVertices(steps: Vector[Any]): Set[String] =
    steps.flatMap(s => asObj(s).map(stepVertices).getOrElse(Set.empty)).toSet

  /** rewrite.py:671-735 `_rewrite_vertex_field_step`. */
  private def rewriteVertexFieldStep(step: Obj,
      renames: Map[String, Seq[(String, String)]],
      availableVertices: Set[String]): Obj = {
    var out = asObj(normalizeActorStep(step)).get
    strAt(out, "type").getOrElse("") match {
      case "vertex" =>
        strAt(out, "vertex").foreach { vName =>
          val perVertex = renames.getOrElse(vName, Nil)
          if (perVertex.nonEmpty) {
            val newFrom = applyVertexFieldRenameToFromDoc(objAt(out, "from"), perVertex)
            if (newFrom.nonEmpty) out = out.updated("from", newFrom)
            arrAt(out, "keep_fields").foreach { kf =>
              val perMap = perVertex.toMap
              out = out.updated("keep_fields", kf.map {
                case s: String => perMap.getOrElse(s, s); case other => other
              })
            }
          }
        }
      case "transform" =>
        // in-scope renames union over available vertices; iteration is
        // sorted for determinism (the reference iterates a Python set)
        var inScope = Map.empty[String, String]
        availableVertices.toSeq.sorted.foreach(v =>
          renames.getOrElse(v, Nil).foreach(kv => inScope += kv))
        if (inScope.nonEmpty) {
          objAt(out, "rename").foreach { current =>
            // call-mode transforms omit `rename` — never synthesize it
            val newRename = applyVertexFieldRenameToTransformRename(Some(current), inScope)
            if (newRename.nonEmpty) out = out.updated("rename", newRename)
          }
        }
      case "edge" =>
        arrAt(out, "vertex_weights").foreach(vw =>
          out = out.updated("vertex_weights",
            rewriteVertexWeightsVertexFieldNames(vw, renames)))
      case "descend" =>
        arrAt(out, "pipeline").foreach { pl =>
          val nestedAvailable = availableVertices ++ collectLevelVertices(pl)
          out = out.updated("pipeline", pl.collect {
            case x if asObj(x).isDefined =>
              rewriteVertexFieldStep(asObj(x).get, renames, nestedAvailable)
          })
        }
      case _ =>
    }
    out
  }

  /** rewrite.py:738-770 `rewrite_vertex_field_names_in_pipeline`: the
    * property-rename cascade — `vertex` from-maps cover the rename,
    * `transform.rename` values follow, edge `vertex_weights` follow,
    * descend recurses with an extended scope.
    */
  def rewriteVertexFieldNamesInPipeline(pipeline: Vector[Any],
      renames: Map[String, Seq[(String, String)]],
      availableVertices: Set[String] = Set.empty): Vector[Any] = {
    if (renames.isEmpty) return pipeline
    val scope = availableVertices ++ collectLevelVertices(pipeline)
    pipeline.collect {
      case s if asObj(s).isDefined => rewriteVertexFieldStep(asObj(s).get, renames, scope)
    }
  }

  /** rewrite.py:773-864 `rewrite_remove_vertex_properties_in_pipeline`. */
  def rewriteRemoveVertexPropertiesInPipeline(pipeline: Vector[Any],
      removals: Map[String, Set[String]]): Vector[Any] = {
    if (removals.isEmpty) return pipeline
    def rewriteStep(step: Obj): Obj = {
      var out = asObj(normalizeActorStep(step)).get
      strAt(out, "type").getOrElse("") match {
        case "vertex" =>
          strAt(out, "vertex").foreach { vName =>
            val removed = removals.getOrElse(vName, Set.empty)
            if (removed.nonEmpty) {
              objAt(out, "from").foreach { fm =>
                out = out.updated("from", fm.filter { case (k, _) => !removed(k) })
              }
              arrAt(out, "keep_fields").foreach { kf =>
                out = out.updated("keep_fields", kf.filterNot {
                  case s: String => removed(s); case _ => false
                })
              }
            }
          }
        case "transform" =>
          objAt(out, "rename").foreach { rm =>
            val blocked = removals.values.foldLeft(Set.empty[String])(_ ++ _)
            out = out.updated("rename", rm.filter {
              case (_, v: String) => !blocked(v); case _ => true
            })
          }
        case "edge" =>
          arrAt(out, "vertex_weights").foreach { ws =>
            out = out.updated("vertex_weights", ws.flatMap { entry =>
              asObj(entry) match {
                case None => None // non-dict weights are dropped (executed truth)
                case Some(e) =>
                  strAt(e, "name") match {
                    case None => Some(e)
                    case Some(name) =>
                      val removed = removals.getOrElse(name, Set.empty)
                      if (removed.isEmpty) Some(e)
                      else {
                        var rw = e
                        arrAt(rw, "fields").foreach(fs => rw = rw.updated("fields",
                          fs.filterNot { case s: String => removed(s); case _ => false }))
                        objAt(rw, "map").foreach(m => rw = rw.updated("map",
                          m.filter { case (k, _) => !removed(k) }))
                        objAt(rw, "filter").foreach(f => rw = rw.updated("filter",
                          f.filter { case (k, _) => !removed(k) }))
                        Some(rw)
                      }
                  }
              }
            })
          }
        case "descend" =>
          arrAt(out, "pipeline").foreach(pl => out = out.updated("pipeline",
            pl.collect { case x if asObj(x).isDefined => rewriteStep(asObj(x).get) }))
        case _ =>
      }
      out
    }
    pipeline.collect { case s if asObj(s).isDefined => rewriteStep(asObj(s).get) }
  }

  /** rewrite.py:867-931 `rewrite_remove_relations_in_pipeline`: drop
    * edge/create_edge steps (and links) targeting removed relations.
    * Executed-truth corner: a NORMALIZED flat edge step (`type: edge`, no
    * nested `edge:` payload) is dropped regardless of its relation — the
    * final "nothing left" check only sees the nested forms.
    */
  def rewriteRemoveRelationsInPipeline(pipeline: Vector[Any],
      removedRelations: Set[String]): Vector[Any] = {
    if (removedRelations.isEmpty) return pipeline
    def rewriteStep(step: Obj): Option[Obj] = {
      var out = step
      objAt(out, "edge").foreach { ep0 =>
        var ep = ep0
        if (removedRelations.contains(strAt(ep, "relation").orNull))
          out = out.removed("edge")
        else {
          objAt(ep, "relation_map").foreach { rm =>
            ep = ep.updated("relation_map", rm.filter {
              case (_, v: String) => !removedRelations(v); case _ => true
            })
          }
          arrAt(ep, "links").foreach { links =>
            ep = ep.updated("links", links.filterNot(l => asObj(l).exists(ld =>
              removedRelations.contains(strAt(ld, "relation").orNull))))
          }
          out = out.updated("edge", ep)
        }
      }
      objAt(out, "create_edge").foreach { ep0 =>
        var ep = ep0
        if (removedRelations.contains(strAt(ep, "relation").orNull))
          out = out.removed("create_edge")
        else {
          objAt(ep, "relation_map").foreach { rm =>
            ep = ep.updated("relation_map", rm.filter {
              case (_, v: String) => !removedRelations(v); case _ => true
            })
          }
          if (out.contains("create_edge")) out = out.updated("create_edge", ep)
        }
      }
      objAt(out, "descend").foreach { d0 =>
        arrAt(d0, "pipeline").foreach { pl =>
          out = out.updated("descend", d0.updated("pipeline",
            pl.flatMap(x => asObj(x).flatMap(rewriteStep))))
        }
      }
      if (!out.contains("edge") && !out.contains("create_edge") &&
          strAt(out, "type").contains("edge")) None
      else Some(out)
    }
    pipeline.flatMap(s => asObj(s).flatMap(rewriteStep))
  }

  /** rewrite.py:934-946 `_payload_edge_id`: logical edge id from static
    * `from`/`to` (or `source`/`target`) fields.
    */
  def payloadEdgeId(payload: Obj): Option[EdgeIdKey] = {
    val source = strAt(payload, "from").orElse(strAt(payload, "source"))
    val target = strAt(payload, "to").orElse(strAt(payload, "target"))
    (source, target) match {
      case (Some(s), Some(t)) => Some((s, t, strAt(payload, "relation")))
      case _ => None
    }
  }

  /** rewrite.py:974-1033 `rewrite_remove_edge_ids_in_pipeline`. */
  def rewriteRemoveEdgeIdsInPipeline(pipeline: Vector[Any],
      removedEdgeIds: Set[EdgeIdKey]): Vector[Any] = {
    if (removedEdgeIds.isEmpty) return pipeline
    def targets(payload: Obj): Boolean =
      payloadEdgeId(payload).exists(removedEdgeIds.contains)
    def pruneRelationMap(payload: Obj): Obj =
      (objAt(payload, "relation_map"), payloadEdgeId(payload)) match {
        case (Some(rm), Some((s, t, _))) =>
          payload.updated("relation_map", rm.filter {
            case (_, v: String) => !removedEdgeIds.contains((s, t, Some(v)))
            case _ => true
          })
        case _ => payload
      }
    def rewriteStep(step: Obj): Option[Obj] = {
      var out = step
      objAt(out, "edge").foreach { ep0 =>
        if (targets(ep0)) out = out.removed("edge")
        else {
          var ep = pruneRelationMap(ep0)
          arrAt(ep, "links").foreach { links =>
            ep = ep.updated("links",
              links.filterNot(l => asObj(l).exists(targets)))
          }
          out = out.updated("edge", ep)
        }
      }
      objAt(out, "create_edge").foreach { ep0 =>
        if (targets(ep0)) out = out.removed("create_edge")
        else out = out.updated("create_edge", pruneRelationMap(ep0))
      }
      objAt(out, "descend").foreach { d0 =>
        arrAt(d0, "pipeline").foreach { pl =>
          out = out.updated("descend", d0.updated("pipeline",
            pl.flatMap(x => asObj(x).flatMap(rewriteStep))))
        }
      }
      if (!out.contains("edge") && !out.contains("create_edge") &&
          strAt(out, "type").contains("edge")) None
      else if (out.isEmpty) None
      else Some(out)
    }
    pipeline.flatMap(s => asObj(s).flatMap(rewriteStep))
  }

  // ------------------------------------------------ edge-property plane

  /** rewrite.py:1036-1067 `_rewrite_edge_properties_payload`. */
  private def rewriteEdgePropertiesPayload(payload: Obj,
      renames: Map[String, String], removals: Set[String]): Obj =
    arrAt(payload, "properties") match {
      case None => payload
      case Some(props) =>
        var seen = Set.empty[String]
        val rewritten = props.flatMap {
          case p: String =>
            val newName = renames.getOrElse(p, p)
            if (removals(newName) || seen(newName)) None
            else { seen += newName; Some(newName) }
          case p if asObj(p).exists(pd => strAt(pd, "name").isDefined) =>
            val pd = asObj(p).get
            val newName = renames.getOrElse(strAt(pd, "name").get, strAt(pd, "name").get)
            if (removals(newName) || seen(newName)) None
            else { seen += newName; Some(pd.updated("name", newName)) }
          case p => Some(p)
        }
        payload.updated("properties", rewritten)
    }

  /** rewrite.py:1070-1124 `rewrite_edge_properties_in_pipeline`. */
  def rewriteEdgePropertiesInPipeline(pipeline: Vector[Any],
      renamesByRelation: Map[String, Map[String, String]] = Map.empty,
      removalsByRelation: Map[String, Set[String]] = Map.empty): Vector[Any] = {
    if (renamesByRelation.isEmpty && removalsByRelation.isEmpty) return pipeline
    def perRelation(rel: Option[String]): (Map[String, String], Set[String]) = rel match {
      case Some(r) => (renamesByRelation.getOrElse(r, Map.empty),
        removalsByRelation.getOrElse(r, Set.empty))
      case None => (Map.empty, Set.empty)
    }
    def rewriteEdgePayload(payload0: Obj): Obj = {
      var p = payload0
      val (renames, removals) = perRelation(strAt(p, "relation"))
      p = rewriteEdgePropertiesPayload(p, renames, removals)
      arrAt(p, "links").foreach { links =>
        p = p.updated("links", links.map {
          case l if asObj(l).isDefined =>
            val ld = asObj(l).get
            val (lr, lv) = perRelation(strAt(ld, "relation"))
            rewriteEdgePropertiesPayload(ld, lr, lv)
          case l => l
        })
      }
      p
    }
    def rewriteStep(step: Obj): Obj = {
      var out = step
      Seq("edge", "create_edge").foreach(k =>
        objAt(out, k).foreach(p => out = out.updated(k, rewriteEdgePayload(p))))
      objAt(out, "descend").foreach { d0 =>
        arrAt(d0, "pipeline").foreach { pl =>
          out = out.updated("descend", d0.updated("pipeline",
            pl.collect { case x if asObj(x).isDefined => rewriteStep(asObj(x).get) }))
        }
      }
      out
    }
    pipeline.collect { case s if asObj(s).isDefined => rewriteStep(asObj(s).get) }
  }

  // --------------------------------------------------------- predicates

  /** rewrite.py:1127-1157 `pipeline_mentions_any_vertex`. */
  def pipelineMentionsAnyVertex(steps: Vector[Any], names: Set[String]): Boolean = {
    if (names.isEmpty) return false
    steps.exists { step =>
      asObj(step).exists { sd =>
        val s = asObj(normalizeActorStep(sd)).get
        strAt(s, "type").getOrElse("") match {
          case "vertex" => strAt(s, "vertex").exists(names)
          case "vertex_router" =>
            objAt(s, "type_map").exists(_.values.exists {
              case v: String => names(v); case _ => false
            }) ||
            objAt(s, "vertex_from_map").exists(_.keys.exists(names))
          case "edge" =>
            Seq("source", "from", "target", "to").exists(k => strAt(s, k).exists(names))
          case "descend" =>
            arrAt(s, "pipeline").exists(pl =>
              pipelineMentionsAnyVertex(pl.filter(asObj(_).isDefined), names))
          case _ => false
        }
      }
    }
  }

  /** resource.py:23-60 `collect_vertex_names_from_pipeline` — the wider
    * mention check `_prune_ingestion_for_removed_vertices` reaches through
    * `ActorWrapper.references_vertices`: unlike
    * [[pipelineMentionsAnyVertex]] it also counts edge `vertex_weights`
    * names.
    */
  def collectVertexNamesFromPipeline(steps: Vector[Any]): Set[String] = {
    var names = Set.empty[String]
    steps.foreach { step =>
      asObj(step).foreach { sd =>
        val s = asObj(normalizeActorStep(sd)).get
        strAt(s, "type").getOrElse("") match {
          case "vertex" => strAt(s, "vertex").foreach(names += _)
          case "vertex_router" =>
            objAt(s, "type_map").foreach(_.values.foreach {
              case v: String => names += v; case _ =>
            })
            objAt(s, "vertex_from_map").foreach(_.keys.foreach(names += _))
          case "edge" =>
            strAt(s, "source").orElse(strAt(s, "from")).foreach(names += _)
            strAt(s, "target").orElse(strAt(s, "to")).foreach(names += _)
            arrAt(s, "vertex_weights").foreach(_.foreach(w =>
              asObj(w).flatMap(strAt(_, "name")).foreach(names += _)))
          case "descend" =>
            arrAt(s, "pipeline").foreach(pl =>
              names ++= collectVertexNamesFromPipeline(pl))
          case _ =>
        }
      }
    }
    names
  }
}
