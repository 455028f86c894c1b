package graft.evolve

import scala.collection.immutable.VectorMap

import graft.model._
import Rewrite._

/** EdgeActor-aware inverse-edge appends for the evolution cascade — the
  * reference's `graflo/architecture/evolution/inverse_edges.py` over the
  * document plane. Both payload paths are dict-pure: the flat path swaps
  * the normalized step dict directly, and the links path's
  * `EdgeLinkConfig.model_dump(by_alias, exclude_none)` is MINIMAL (every
  * default is None — probed), so the raw link dicts are the dump.
  */
object InverseEdges {

  private def strAt(m: Obj, k: String): Option[String] = asStr(m.getOrElse(k, null))

  /** inverse_edges.py:27-41 `_edge_triple_from_payload`. */
  def edgeTripleFromPayload(payload: Obj): Option[(String, String, String)] = {
    val (s0, t0) = (strAt(payload, "from"), strAt(payload, "to"))
    val (s, t) = if (s0.isDefined && t0.isDefined) (s0, t0)
      else (strAt(payload, "source"), strAt(payload, "target"))
    (s, t, strAt(payload, "relation")) match {
      case (Some(a), Some(b), Some(r)) => Some((a, b, r))
      case _ => None
    }
  }

  /** inverse_edges.py:108-113 `_swap_match_fields`. */
  private def swapMatchFields(p: Obj): Obj = {
    val ms = p.getOrElse("match_source", null)
    val mt = p.getOrElse("match_target", null)
    if (ms != null || mt != null)
      p.updated("match_source", mt).updated("match_target", ms)
    else p
  }

  /** inverse_edges.py:116-149 `_swap_edge_endpoints`. */
  def swapEdgeEndpoints(payload: Obj): Obj = {
    val source = strAt(payload, "from").orElse(strAt(payload, "source"))
    val target = strAt(payload, "to").orElse(strAt(payload, "target"))
    val sourceRole = strAt(payload, "source_role").orElse(strAt(payload, "source_type_field"))
    val targetRole = strAt(payload, "target_role").orElse(strAt(payload, "target_type_field"))
    var out = Seq("from", "to", "source", "target", "source_role", "target_role",
      "source_type_field", "target_type_field").foldLeft(payload)(_.removed(_))
    (source, target, sourceRole, targetRole) match {
      case (Some(s), Some(t), _, _) =>
        out = out.updated("from", t).updated("to", s)
      case (None, _, Some(sr), Some(tr)) =>
        out = out.updated("source_role", tr).updated("target_role", sr)
      case (Some(s), None, _, Some(tr)) =>
        out = out.updated("to", s).updated("source_role", tr)
      case (None, Some(t), Some(sr), None) =>
        out = out.updated("from", t).updated("target_role", sr)
      case _ =>
    }
    swapMatchFields(out)
  }

  /** inverse_edges.py:166-177 `_has_swappable_endpoints`. */
  private def hasSwappableEndpoints(p: Obj): Boolean = {
    val source = strAt(p, "from").orElse(strAt(p, "source"))
    val target = strAt(p, "to").orElse(strAt(p, "target"))
    val sourceRole = strAt(p, "source_role").orElse(strAt(p, "source_type_field"))
    val targetRole = strAt(p, "target_role").orElse(strAt(p, "target_type_field"))
    (source.isDefined && target.isDefined) ||
      (sourceRole.isDefined && targetRole.isDefined) ||
      (source.isDefined && targetRole.isDefined) ||
      (sourceRole.isDefined && target.isDefined)
  }

  private def hasForwardRelation(edges: Seq[EdgeDef], source: String, target: String,
      opRelations: Map[String, String]): Boolean =
    edges.exists(e => e.source == source && e.target == target &&
      opRelations.contains(e.relation) && e.directed)

  private def hasDirectedForward(edges: Seq[EdgeDef], relations: Set[String]): Boolean =
    edges.exists(e => relations(e.relation) && e.directed)

  /** inverse_edges.py:245-262 `_ensure_edge_step_dict`. */
  private def ensureEdgeStepDict(payload: Obj): Obj = {
    if (strAt(payload, "type").contains("edge")) return payload
    def truthy(k: String) = payload.get(k).exists {
      case null => false; case b: Boolean => b; case s: String => s.nonEmpty
      case xs: Seq[_] => xs.nonEmpty; case m: collection.Map[_, _] => m.nonEmpty
      case _ => true
    }
    if (truthy("links") || truthy("relation_field") || truthy("relation_from_key"))
      payload.updated("type", "edge")
    else if (truthy("source_role") || truthy("target_role") ||
        truthy("source_type_field") || truthy("target_type_field"))
      payload.updated("type", "edge")
    else if ((payload.contains("from") || payload.contains("source")) &&
        (payload.contains("to") || payload.contains("target")))
      payload.updated("type", "edge")
    else payload
  }

  /** inverse_edges.py:180-199 `_is_invertible_link`: swappable endpoints
    * AND (a mapped relation, or ANY relation_field — the reference's
    * relation_field branch returns True unconditionally).
    */
  private def isInvertibleLink(link: Obj, opRelations: Map[String, String]): Boolean =
    hasSwappableEndpoints(link) &&
      (strAt(link, "relation").exists(opRelations.contains) ||
        strAt(link, "relation_field").isDefined)

  /** inverse_edges.py:152-163 `_invert_link_payload`. */
  private def invertLinkPayload(link: Obj, opRelations: Map[String, String]): Option[Obj] = {
    val swapped = swapEdgeEndpoints(link)
    strAt(swapped, "relation").filter(opRelations.contains) match {
      case Some(r) => Some(swapped.updated("relation", opRelations(r)))
      case None =>
        if (strAt(swapped, "relation_field").isDefined) Some(swapped) else None
    }
  }

  /** inverse_edges.py:202-242 `_is_invertible_edge_config`. */
  private def isInvertible(p: Obj, opRelations: Map[String, String],
      schemaEdges: Seq[EdgeDef]): Boolean = {
    asArr(p.getOrElse("links", null)).filter(_.nonEmpty).foreach { links =>
      return links.exists(l => asObj(l).exists(isInvertibleLink(_, opRelations)))
    }
    if (!hasSwappableEndpoints(p)) return false
    if (strAt(p, "relation").exists(opRelations.contains)) return true
    val hasRelField = strAt(p, "relation_field").isDefined
    val hasRelFromKey = p.get("relation_from_key").exists {
      case b: Boolean => b; case _ => false
    }
    if (hasRelField || hasRelFromKey) {
      val source = strAt(p, "source").orElse(strAt(p, "from"))
      val target = strAt(p, "target").orElse(strAt(p, "to"))
      (source, target) match {
        case (Some(s), Some(t)) if hasForwardRelation(schemaEdges, s, t, opRelations) =>
          return true
        case _ =>
      }
      asObj(p.getOrElse("relation_map", null)) match {
        case Some(rm) =>
          val forward = rm.values.collect {
            case c: String if opRelations.contains(c) => c
          }.toSet
          return hasDirectedForward(schemaEdges, forward)
        case None =>
          return hasDirectedForward(schemaEdges, opRelations.keySet)
      }
    }
    false
  }

  /** inverse_edges.py:98-105 `_invert_relation_map`. */
  private def invertRelationMap(forward: Obj, opRelations: Map[String, String]): Obj =
    VectorMap.from(forward.collect {
      case (raw, canonical: String) if opRelations.contains(canonical) =>
        raw -> (opRelations(canonical): Any)
    })

  /** inverse_edges.py:265-303 `_invert_edge_actor_payload`. */
  def invertEdgeActorPayload(payload: Obj, opRelations: Map[String, String],
      schemaEdges: Seq[EdgeDef]): Option[Obj] = {
    val normalized = asObj(normalizeActorStep(ensureEdgeStepDict(payload))).get
    if (!strAt(normalized, "type").contains("edge")) return None
    if (!isInvertible(normalized, opRelations, schemaEdges)) return None
    // links path (inverse_edges.py:282-292): invert each invertible link;
    // the output step is exactly {type: edge, links: [...]}
    asArr(normalized.getOrElse("links", null)).filter(_.nonEmpty).foreach { links =>
      val inverted = links.flatMap(l => asObj(l).flatMap(invertLinkPayload(_, opRelations)))
      return if (inverted.isEmpty) None
      else Some(scala.collection.immutable.VectorMap[String, Any](
        "type" -> "edge", "links" -> inverted.asInstanceOf[Vector[Any]]))
    }
    var out = swapEdgeEndpoints(normalized)
    strAt(normalized, "relation").filter(opRelations.contains).foreach(r =>
      out = out.updated("relation", opRelations(r)))
    asObj(normalized.getOrElse("relation_map", null)).filter(_.nonEmpty).foreach { rm =>
      val inverted = invertRelationMap(rm, opRelations)
      if (inverted.nonEmpty) out = out.updated("relation_map", inverted)
      else if (strAt(normalized, "relation").isEmpty) out = out.removed("relation_map")
    }
    Some(out)
  }

  /** inverse_edges.py:306-326 `_edge_actor_fingerprint`. */
  def fingerprint(payload: Obj): String = {
    val normalized = asObj(normalizeActorStep(ensureEdgeStepDict(payload))).get
    if (!strAt(normalized, "type").contains("edge")) return "not_edge"
    asArr(normalized.getOrElse("links", null)).filter(_.nonEmpty) match {
      case Some(links) => "links|" + links.map(String.valueOf).sorted.mkString(";")
      case None =>
        val rm = asObj(normalized.getOrElse("relation_map", null)).getOrElse(EmptyObj)
        Seq("from", "to", "source", "target", "source_role", "target_role",
          "relation", "relation_field", "relation_from_key")
          .map(k => String.valueOf(normalized.getOrElse(k, null)))
          .mkString("edge|", "|", "|" + rm.toSeq.sortBy(_._1).mkString(","))
    }
  }

  private def unwrapEdgeStep(step: Obj): Option[Obj] =
    asObj(step.getOrElse("edge", null)).orElse {
      val normalized = asObj(normalizeActorStep(step)).get
      if (strAt(normalized, "type").contains("edge")) Some(normalized) else None
    }

  /** inverse_edges.py:338-354 `_collect_pipeline_fingerprints`. */
  private def collectFingerprints(steps: Vector[Any]): Set[String] = {
    var fps = Set.empty[String]
    steps.foreach { s =>
      asObj(s).foreach { sd =>
        if (strAt(asObj(normalizeActorStep(sd)).get, "type").contains("descend")) {
          asArr(sd.getOrElse("pipeline", sd.getOrElse("apply", null))).foreach(pl =>
            fps ++= collectFingerprints(pl))
        } else unwrapEdgeStep(sd).foreach { ep =>
          val wrapped =
            if (asObj(sd.getOrElse("edge", null)).isDefined) VectorMap("edge" -> (ep: Any))
            else ep
          fps += fingerprint(wrapped)
        }
      }
    }
    fps
  }

  /** inverse_edges.py:357-399 + 500-506 `append_inverses_to_pipeline`. */
  def appendInversesToPipeline(pipeline: Vector[Any], opRelations: Map[String, String],
      schemaEdges: Seq[EdgeDef]): Vector[Any] = {
    val existing = scala.collection.mutable.Set.empty[String]
    existing ++= collectFingerprints(pipeline)
    def appendIn(steps: Vector[Any]): Vector[Any] = {
      var out = steps
      steps.zipWithIndex.foreach { case (step, idx) =>
        asObj(step).foreach { sd =>
          val normalized = asObj(normalizeActorStep(sd)).get
          if (strAt(normalized, "type").contains("descend")) {
            // the reference always writes back under "pipeline" (and keeps
            // a pre-existing "apply" key untouched) — inverse_edges.py:373-376
            asArr(sd.getOrElse("pipeline", sd.getOrElse("apply", null))).foreach { nested =>
              val updated = appendIn(nested)
              if (updated != nested)
                out = out.updated(idx, sd.updated("pipeline", updated))
            }
          } else unwrapEdgeStep(sd).foreach { ep =>
            invertEdgeActorPayload(ep, opRelations, schemaEdges).foreach { inv =>
              val inverseStep: Obj =
                if (asObj(sd.getOrElse("edge", null)).isDefined)
                  VectorMap("edge" -> (inv: Any))
                else inv
              val fp = fingerprint(inverseStep)
              if (!existing(fp)) { out = out :+ inverseStep; existing += fp }
            }
          }
        }
      }
      out
    }
    appendIn(pipeline)
  }

  /** inverse_edges.py:422-444 `_append_inverse_flat_specs`. */
  def appendInverseFlatSpecs(specs: Vector[Obj], relationMap: Map[String, String]): Vector[Obj] = {
    val existing = scala.collection.mutable.Set.empty[(String, String, String)]
    existing ++= specs.flatMap(edgeTripleFromPayload)
    var out = specs
    specs.foreach { spec =>
      edgeTripleFromPayload(spec).foreach { case (s, t, r) =>
        relationMap.get(r).foreach { inv =>
          val invTriple = (t, s, inv)
          if (!existing(invTriple)) {
            out = out :+ spec.updated("source", t).updated("target", s)
              .updated("relation", inv)
            existing += invTriple
          }
        }
      }
    }
    out
  }

  /** inverse_edges.py:402-419 `_swapped_edge_payload`. */
  private def swappedEdgePayload(edge: Obj, inverseRelation: String): Obj = {
    val (s, t, _) = edgeTripleFromPayload(edge).getOrElse(
      throw new IllegalArgumentException("edge payload must define source, target, and relation"))
    var out = edge
    if (strAt(out, "from").isDefined) out = out.updated("from", t)
    if (strAt(out, "to").isDefined) out = out.updated("to", s)
    if (strAt(out, "source").isDefined) out = out.updated("source", t)
    if (strAt(out, "target").isDefined) out = out.updated("target", s)
    out.updated("relation", inverseRelation)
  }

  /** inverse_edges.py:447-497 `_append_inverses_for_nested_edges`. */
  def appendInversesForNestedEdges(entries: Vector[Obj], relationMap: Map[String, String],
      schemaEdges: Seq[EdgeDef]): Vector[Obj] = {
    val edgePayloads = entries.flatMap(e => asObj(e.getOrElse("edge", null)))
    val existingTriples = scala.collection.mutable.Set.empty[(String, String, String)]
    existingTriples ++= edgePayloads.flatMap(edgeTripleFromPayload)
    val existingFps = scala.collection.mutable.Set.empty[String]
    existingFps ++= edgePayloads.map(p => fingerprint(VectorMap("edge" -> (p: Any))))
    var out = entries
    entries.foreach { entry =>
      asObj(entry.getOrElse("edge", null)).foreach { ep =>
        edgeTripleFromPayload(ep) match {
          case Some((s, t, r)) =>
            relationMap.get(r).foreach { inv =>
              val invTriple = (t, s, inv)
              if (!existingTriples(invTriple)) {
                out = out :+ entry.updated("edge", swappedEdgePayload(ep, inv))
                existingTriples += invTriple
              }
            }
          case None =>
            invertEdgeActorPayload(ep, relationMap, schemaEdges).foreach { inv =>
              val fp = fingerprint(VectorMap("edge" -> (inv: Any)))
              if (!existingFps(fp)) {
                out = out :+ entry.updated("edge", inv)
                existingFps += fp
              }
            }
        }
      }
    }
    out
  }

  // ------------------------------------------------ payload validation
  //
  // The reference's apply_add_inverse_edges ends with
  // `Resource.model_validate(payload)` (apply.py:1360), which re-runs the
  // pydantic step adapter over every pipeline step — so an EdgeActorConfig-
  // INVALID payload (extra key, wrong field type, bad literal; pydantic
  // extra=forbid) fails the WHOLE op with "Invalid actor step
  // configuration", it is never silently skipped. Executed-parity pinned
  // by the `inv_invalid_*` fixture cases. This is the structural mirror
  // of EdgeActorConfig/EdgeLinkConfig (steps/models.py field surface).

  private val LinkKeys: Set[String] = Set(
    "source_match", "target_match", "on_ambiguous", "from", "source", "to",
    "target", "source_type_field", "target_type_field", "source_role",
    "target_role", "relation", "relation_field", "match_source", "match_target")

  private val ConfigKeys: Set[String] = LinkKeys ++ Set(
    "type", "links", "relation_map", "strict_edge_types", "relation_from_key",
    "description", "exclude_source", "exclude_target", "match", "properties",
    "vertex_weights",
    // graft's loader accepts these dialect extensions on edge steps
    // (ManifestLoader.parseEdgeStep: casting + the `weights` properties
    // alias); the end-of-op validation must not reject a manifest the
    // loader itself accepts
    "casting", "weights")

  private val StrKeys: Set[String] = Set(
    "from", "source", "to", "target", "source_type_field", "target_type_field",
    "source_role", "target_role", "relation", "relation_field", "description",
    "match_source", "match_target", "exclude_source", "exclude_target", "match",
    "casting")

  private val BoolKeys: Set[String] = Set("strict_edge_types", "relation_from_key")

  // pydantic v2 lax-mode bool coercions (str/int/float faces)
  private def laxBool(v: Any): Boolean = v match {
    case _: Boolean => true
    case i: Int     => i == 0 || i == 1
    case l: Long    => l == 0L || l == 1L
    case d: Double  => d == 0.0 || d == 1.0
    case f: Float   => f == 0.0f || f == 1.0f
    case s: String  => Set("true", "false", "t", "f", "yes", "no", "on",
      "off", "1", "0", "y", "n")(s.toLowerCase)
    case _ => false
  }

  private def fieldError(payload: Obj, allowed: Set[String]): Option[String] = {
    payload.keys.find(!allowed(_)).foreach(k =>
      return Some(s"unknown field '$k' (extra=forbid)"))
    payload.foreach { case (k, v) =>
      if (v != null) {
        if (StrKeys(k) && allowed(k) && !v.isInstanceOf[String])
          return Some(s"field '$k' must be a string")
        if (BoolKeys(k) && !laxBool(v))
          return Some(s"field '$k' must be a bool")
        k match {
          case "on_ambiguous" => v match {
            case s: String if Set("all", "first", "skip", "error")(s) => ()
            case _ => return Some("on_ambiguous must be all|first|skip|error")
          }
          case "source_match" | "target_match" => v match {
            case _: String => ()
            case xs: Seq[_] if xs.forall(_.isInstanceOf[String]) => ()
            case _ => return Some(s"field '$k' must be a string or string list")
          }
          case "type" => if (v != "edge") return Some("type must be 'edge'")
          case "relation_map" => asObj(v) match {
            case Some(rm) if rm.values.forall(_.isInstanceOf[String]) => ()
            case _ => return Some("relation_map must be a string map")
          }
          case "properties" | "vertex_weights" | "weights" =>
            if (!v.isInstanceOf[Seq[_]]) return Some(s"field '$k' must be a list")
          case "links" => v match {
            case xs: Seq[_] =>
              xs.foreach { l =>
                asObj(l) match {
                  case Some(lo) => fieldError(lo, LinkKeys).foreach(e =>
                    return Some(s"link: $e"))
                  case None => return Some("links entries must be objects")
                }
              }
            case _ => return Some("links must be a list")
          }
          case _ => ()
        }
      }
    }
    None
  }

  /** Walk a pipeline (recursing into descends) and throw on any edge
    * payload EdgeActorConfig would reject — the reference's end-of-op
    * Resource.model_validate face.
    */
  def requireValidEdgePayloads(steps: Vector[Any]): Unit = steps.foreach { s =>
    asObj(s).foreach { sd =>
      val normalized = asObj(normalizeActorStep(sd)).get
      if (strAt(normalized, "type").contains("descend")) {
        asArr(sd.getOrElse("pipeline", sd.getOrElse("apply", null)))
          .foreach(requireValidEdgePayloads)
      } else {
        val edgeish: Option[Obj] = asObj(sd.getOrElse("edge", null))
          .map(ep => asObj(normalizeActorStep(ensureEdgeStepDict(ep))).get)
          .orElse(if (strAt(normalized, "type").contains("edge")) Some(normalized) else None)
        edgeish.foreach { ep =>
          fieldError(ep, ConfigKeys).foreach(err => throw new IllegalArgumentException(
            "Invalid actor step configuration. Supported step forms include " +
              s"`vertex`, `transform`, `edge`, `descend`, and `vertex_router`. ($err)"))
        }
      }
    }
  }

  /** inverse_edges.py:509-557 `_schema_edges_with_inverses` on the typed
    * schema (graft relations are always named, so the relation-less
    * template loop has no counterpart).
    */
  def schemaEdgesWithInverses(schema: GraphSchema,
      relationMap: Map[String, String]): GraphSchema = {
    val existing = scala.collection.mutable.Set.empty[EdgeKey]
    existing ++= schema.edges.map(_.key)
    var out = schema.edges
    schema.edges.foreach { e =>
      if (e.directed) relationMap.get(e.relation).foreach { inv =>
        val invKey = EdgeKey(e.target, e.source, inv)
        if (!existing(invKey)) {
          out = out :+ e.copy(source = e.target, target = e.source,
            relation = inv, directed = true)
          existing += invKey
        }
      }
    }
    schema.copy(edges = out)
  }
}
