package graft.evolve

import graft.model._
import graft.pipeline._
import graft.manifest.{GraphManifest, ResourceBinding}

/** Manifest projection — the reference's `ProjectManifestOp` +
  * `select_induced` kernel (evolution/project.py, schema/projection.py:41-105,
  * apply.py:1131-1142): slice a manifest to a vertex/edge subgraph with a
  * consistent cascade. An edge survives only when BOTH endpoints survive
  * (endpoint-closed); under `induced_prune` (the projection default) a
  * requested vertex left with no surviving edge is dropped too — correct for
  * manifest projection, wrong for a seeded context query (that keeps its
  * seed; see [[SchemaContext.subschema]]). Ingestion resources are pruned of
  * steps referencing removed types, and a resource with no graph-producing
  * step left is dropped; leaving zero resources aborts (apply.py:208).
  */
object Project {

  final case class Selection(
      survivingVertices: Set[String],
      survivingEdges: Set[EdgeKey],
      removedVertices: Set[String],
      removedEdges: Set[EdgeKey])

  /** The pure slicing kernel (schema/projection.py `select_induced`). */
  def selectInduced(schema: GraphSchema, keepVertices: Option[Seq[String]],
      keepEdges: Option[Seq[EdgeKey]], prune: Boolean): Selection = {
    val allV = schema.vertices.map(_.name).toSet
    val allE = schema.edges.map(_.key).toSet
    var edges = keepEdges.map(_.toSet & allE).getOrElse(allE)
    val keepV = keepVertices.map(_.toSet)
    keepV.foreach { kv =>
      edges = edges.filter(e => kv(e.source) && kv(e.target))
    }
    val connected = edges.flatMap(e => Seq(e.source, e.target))
    val requested = keepV.map(_ & allV).getOrElse(allV)
    val vertices = if (prune) connected & requested else requested
    Selection(vertices, edges, allV -- vertices, allE -- edges)
  }

  /** Slice the logical schema to the survivors. */
  def projectSchema(schema: GraphSchema, sel: Selection): GraphSchema =
    GraphSchema(
      vertices = schema.vertices.filter(v => sel.survivingVertices(v.name)),
      edges = schema.edges.filter(e => sel.survivingEdges(e.key)))

  private def edgeStepSurvives(e: EdgeStep, sel: Selection): Boolean = {
    // dynamic edges (router roles / type fields) carry no static endpoint
    // types — they can only emit pairs among surviving types, so they stay
    if (e.source.isEmpty || e.target.isEmpty) true
    else if (!sel.survivingVertices(e.source) || !sel.survivingVertices(e.target)) false
    else sel.survivingEdges.exists(k =>
      k.source == e.source && k.target == e.target &&
        (e.relation.isEmpty || !e.relationMap.isEmpty || e.relationField.nonEmpty ||
          e.relationFromKey || k.relation == e.relation))
  }

  private def pruneSteps(steps: Seq[Step], sel: Selection): Seq[Step] =
    steps.flatMap {
      case v: VertexStep if !sel.survivingVertices(v.vertex) => None
      case r: VertexRouterStep if r.typeMap.nonEmpty =>
        val tm = r.typeMap.filter { case (_, t) => sel.survivingVertices(t) }
        if (tm.isEmpty) None
        else Some(r.copy(typeMap = tm,
          perTypeFrom = r.perTypeFrom.filter { case (t, _) =>
            sel.survivingVertices(t) || tm.contains(t) }))
      case e: EdgeStep if !edgeStepSurvives(e, sel) => None
      case m: MultiEdgeStep =>
        val ls = m.links.filter(edgeStepSurvives(_, sel))
        if (ls.isEmpty) None else Some(MultiEdgeStep(ls))
      case d: Descend =>
        val inner = pruneSteps(d.steps, sel)
        // a descend that existed to feed now-removed steps is dead weight
        if (d.steps.nonEmpty && inner.isEmpty) None else Some(d.copy(steps = inner))
      case s => Some(s)
    }

  private def producesGraph(steps: Seq[Step]): Boolean = steps.exists {
    case _: VertexStep | _: VertexRouterStep | _: EdgeStep | _: MultiEdgeStep => true
    case d: Descend => producesGraph(d.steps)
    case _ => false
  }

  /** Project a full manifest (the reference `ProjectManifestOp` cascade).
    *
    * @param strict unknown selector names raise (op default)
    */
  def projectManifest(m: GraphManifest,
      keepVertices: Option[Seq[String]] = None,
      keepEdges: Option[Seq[EdgeKey]] = None,
      keepResources: Option[Seq[String]] = None,
      strict: Boolean = true): GraphManifest = {
    require(keepVertices.nonEmpty || keepEdges.nonEmpty,
      "project_manifest requires at least one of keep_vertices or keep_edges")
    keepVertices.foreach { kv =>
      require(kv.distinct.size == kv.size, "keep_vertices entries must be unique")
      if (strict) {
        val unknown = kv.filterNot(m.schema.vertexByName.contains)
        require(unknown.isEmpty, s"Unknown vertices: ${unknown.mkString(", ")}")
      }
    }
    keepEdges.foreach { ke =>
      require(ke.distinct.size == ke.size,
        "keep_edges entries must be unique by (source, target, relation)")
      if (strict) {
        val unknown = ke.filterNot(m.schema.edgeByKey.contains)
        require(unknown.isEmpty, s"Unknown edges: ${unknown.mkString(", ")}")
      }
    }
    val sel = selectInduced(m.schema, keepVertices, keepEdges, prune = true)
    val schema2 = projectSchema(m.schema, sel)
    val pruned = m.resources
      .map { r =>
        r.copy(steps = pruneSteps(r.steps, sel),
          inferEdgeOnly = r.inferEdgeOnly.filter { case (s, t) =>
            sel.survivingVertices(s) && sel.survivingVertices(t) },
          inferEdgeExcept = r.inferEdgeExcept.filter { case (s, t) =>
            sel.survivingVertices(s) && sel.survivingVertices(t) })
      }
      .filter(r => producesGraph(r.steps))
    val kept = keepResources match {
      case Some(ks) => pruned.filter(r => ks.contains(r.name))
      case None     => pruned
    }
    require(kept.nonEmpty,
      "project_manifest would leave ingestion_model.resources empty; aborting.")
    val keptNames = kept.map(_.name).toSet
    m.copy(schema = schema2, resources = kept,
      bindings = m.bindings.filter((b: ResourceBinding) => keptNames(b.resource)))
  }

  /** Rename ingestion resources and their binding references (reference
    * RenameResourcesOp, ops.py:394-417) — injective map, unknown names
    * raise, and the result must not collide with surviving names.
    */
  def renameResources(m: GraphManifest,
      renames: Map[String, String]): GraphManifest = {
    require(renames.nonEmpty, "rename_resources requires a non-empty map")
    require(renames.values.toSeq.distinct.size == renames.size,
      "rename_resources map must be injective (compose with explicit renames to collapse)")
    val known = m.resources.map(_.name).toSet
    val unknown = renames.keys.filterNot(known)
    require(unknown.isEmpty, s"Unknown resources: ${unknown.mkString(", ")}")
    val out = m.copy(
      resources = m.resources.map(r =>
        renames.get(r.name).map(n => r.copy(name = n)).getOrElse(r)),
      bindings = m.bindings.map(b =>
        renames.get(b.resource).map(n => b.copy(resource = n)).getOrElse(b)))
    val names = out.resources.map(_.name)
    require(names.distinct.size == names.size,
      s"rename_resources would duplicate resource names: ${names.diff(names.distinct).mkString(", ")}")
    out
  }
}
