package graft.evolve

import graft.model._
import graft.manifest.GraphManifest
import graft.pipeline._

/** Deterministic manifest composition — the reference's
  * `compose_manifests` (graflo/architecture/evolution/compose.py:586-660,
  * ops.py:843-946): union two full manifests under EXPLICIT equivalence
  * maps (property alignment → boundary rename → union of schema /
  * resources → merge of equivalent types). No semantic matching is ever
  * inferred; empty equivalences give a disjoint union subject to the
  * collision policy.
  */
object Compose {

  /** Align a left and/or right property onto a canonical name
    * (ops.py:843-876). At least one side must be set; `identity = true`
    * appends `into` to the merged vertex's derived identity when no
    * explicit identity override is given.
    */
  final case class PropertyEquiv(
      left: Option[String],
      right: Option[String],
      into: String,
      identity: Boolean = false) {
    require(left.nonEmpty || right.nonEmpty,
      "PropertyEquiv requires at least one of left or right")
  }

  /** Collapse a left and a right vertex type into one (ops.py:879-908). */
  final case class VertexEquiv(
      left: String,
      right: String,
      into: String,
      properties: Seq[PropertyEquiv] = Nil,
      identity: Option[Seq[String]] = None)

  /** Collapse a left and a right relation name onto one (ops.py:910-915). */
  final case class RelationEquiv(left: String, right: String, into: String)

  /** The compose op (ops.py:918-946). `nameConflict` handles non-equivalent
    * right-side collisions: "error" (default) or "prefix_right" (r_ prefix).
    */
  final case class ComposeManifestsOp(
      vertices: Seq[VertexEquiv] = Nil,
      relations: Seq[RelationEquiv] = Nil,
      resourceRenames: Map[String, String] = Map.empty,
      nameConflict: String = "error")

  // ------------------------------------------------------------- renaming

  private def renameStepVertices(s: Step, vmap: Map[String, String],
      fmapByVertex: Map[String, Map[String, String]],
      rmap: Map[String, String]): Step = s match {
    case v: VertexStep =>
      val fm = fmapByVertex.getOrElse(v.vertex, Map.empty)
      v.copy(vertex = vmap.getOrElse(v.vertex, v.vertex),
        from = v.from.map { case (vf, sf) => fm.getOrElse(vf, vf) -> sf })
    case e: EdgeStep => e.copy(
      source = vmap.getOrElse(e.source, e.source),
      target = vmap.getOrElse(e.target, e.target),
      relation = rmap.getOrElse(e.relation, e.relation))
    case m: MultiEdgeStep => m.copy(links = m.links.map(l =>
      renameStepVertices(l, vmap, fmapByVertex, rmap).asInstanceOf[EdgeStep]))
    case d: Descend => d.copy(steps =
      d.steps.map(renameStepVertices(_, vmap, fmapByVertex, rmap)))
    case other => other
  }

  /** Vertex types a step extracts from / matches against at its own level
    * (Descend excluded — nested levels get their own injection).
    */
  private def stepVertexRefs(s: Step): Set[String] = s match {
    case v: VertexStep    => Set(v.vertex)
    case e: EdgeStep      => Set(e.source, e.target)
    case m: MultiEdgeStep => m.links.flatMap(l => Set(l.source, l.target)).toSet
    case _                => Set.empty
  }

  /** Boundary renames: a schema-property rename must also rename the DATA
    * column the resource produces under the old name — injected as a
    * RenameStep at the head of the resource and of every descend level.
    * The injected map is SCOPED to the vertices actually referenced at
    * that level (keyed by post-merge vertex name): a blanket map would
    * rename a same-named column out from under a non-equivalent vertex
    * extracted at the same level. Conflicting renames of one source field
    * by two vertices at the same level are ambiguous and rejected.
    */
  private def injectFieldRenames(steps: Seq[Step],
      renamesByVertex: Map[String, Map[String, String]]): Seq[Step] =
    if (renamesByVertex.isEmpty) steps
    else {
      val recursed = steps.map {
        case d: Descend => d.copy(steps = injectFieldRenames(d.steps, renamesByVertex))
        case other => other
      }
      val refs = steps.flatMap(stepVertexRefs).toSet
      val pairs = refs.toSeq.sorted
        .flatMap(v => renamesByVertex.getOrElse(v, Map.empty).toSeq)
      val conflicts = pairs.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
      if (conflicts.nonEmpty) throw new IllegalArgumentException(
        "compose: conflicting property renames at one pipeline level: " +
          conflicts.map { case (f, ts) =>
            s"$f -> {${ts.map(_._2).distinct.sorted.mkString(",")}}"
          }.mkString("; "))
      val renames = pairs.toMap.filter { case (a, b) => a != b }
      if (renames.isEmpty) recursed
      else {
        // the boundary rename slots in AFTER the level's leading transform
        // block (the resource's own renames/derivations produce the old
        // names) and before the first extraction step
        val at = recursed.indexWhere {
          case _: TransformStep | _: RenameStep | _: RenameKeysStep |
               _: CastStep => false
          case _ => true
        } match {
          case -1 => recursed.length
          case i  => i
        }
        (recursed.take(at) :+ RenameStep(renames)) ++ recursed.drop(at)
      }
    }

  private def alignSide(m: GraphManifest, pick: VertexEquiv => String,
      pickProp: PropertyEquiv => Option[String],
      op: ComposeManifestsOp): GraphManifest = {
    val vmap: Map[String, String] =
      op.vertices.map(v => pick(v) -> v.into).toMap
    val rmap: Map[String, String] =
      op.relations.map(r => pick(VertexEquiv(r.left, r.right, r.into)) -> r.into).toMap
    // per ORIGINAL vertex name: its property renames on this side
    val fmapByVertex: Map[String, Map[String, String]] = op.vertices.map { veq =>
      pick(veq) -> veq.properties.flatMap(pe =>
        pickProp(pe).map(_ -> pe.into)).toMap
    }.toMap
    // boundary-rename maps keyed by the POST-merge vertex name (the steps
    // carry `into` names once renameStepVertices has run); two equivs
    // targeting the same `into` must not rename one field two ways
    val renamesByVertex: Map[String, Map[String, String]] =
      op.vertices.groupBy(_.into).map { case (into, veqs) =>
        val pairs = veqs.flatMap(_.properties.flatMap(pe =>
          pickProp(pe).map(_ -> pe.into)))
        val conflicts = pairs.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
        if (conflicts.nonEmpty) throw new IllegalArgumentException(
          s"compose: conflicting property renames for vertex '$into': " +
            conflicts.keys.toSeq.sorted.mkString(","))
        into -> pairs.toMap.filter { case (a, b) => a != b }
      }.filter(_._2.nonEmpty)
    val vertices = m.schema.vertices.map { v =>
      val fm = fmapByVertex.getOrElse(v.name, Map.empty)
      def rf(n: String) = fm.getOrElse(n, n)
      v.copy(
        name = vmap.getOrElse(v.name, v.name),
        properties = v.properties.map(p => p.copy(name = rf(p.name))),
        identity = v.identity match {
          case Identity.Natural(fs) => Identity.Natural(fs.map(rf))
          case Identity.Hash(fs)    => Identity.Hash(fs.map(rf))
          case other                => other
        })
    }
    val edges = m.schema.edges.map(e => e.copy(
      source = vmap.getOrElse(e.source, e.source),
      target = vmap.getOrElse(e.target, e.target),
      relation = rmap.getOrElse(e.relation, e.relation)))
    val resources = m.resources.map { r =>
      r.copy(steps = injectFieldRenames(
        r.steps.map(renameStepVertices(_, vmap, fmapByVertex, rmap)),
        renamesByVertex))
    }
    m.copy(schema = GraphSchema(vertices, edges), resources = resources)
  }

  // --------------------------------------------------------------- compose

  /** Compose `left` and `right` (compose.py:586-660). Equivalent vertex
    * pairs merge: properties union by name, identity = explicit override,
    * else the union of both sides' identity fields plus identity-flagged
    * property intos.
    */
  def composeManifests(left: GraphManifest, right: GraphManifest,
      op: ComposeManifestsOp): GraphManifest = {
    op.vertices.foreach { veq =>
      require(left.schema.vertexByName.contains(veq.left),
        s"compose: left vertex '${veq.left}' not in left manifest")
      require(right.schema.vertexByName.contains(veq.right),
        s"compose: right vertex '${veq.right}' not in right manifest")
    }
    val l = alignSide(left, _.left, _.left, op)
    var r = alignSide(right, _.right, _.right, op)
    // right resource renames, then collision policy on remaining names
    r = r.copy(resources = r.resources.map(res =>
      res.copy(name = op.resourceRenames.getOrElse(res.name, res.name))))
    val mergedNames = op.vertices.map(_.into).toSet
    val leftV = l.schema.vertexByName.keySet
    val leftRel = l.schema.edges.map(_.relation).toSet
    val leftRes = l.resources.map(_.name).toSet
    def collide(kind: String, name: String): String =
      if (op.nameConflict == "prefix_right") s"r_$name"
      else throw new IllegalArgumentException(
        s"compose: right $kind '$name' collides with left (nameConflict=error)")
    val rvRenames = r.schema.vertices.map(_.name)
      .filter(n => leftV(n) && !mergedNames(n))
      .map(n => n -> collide("vertex", n)).toMap
    if (rvRenames.nonEmpty) {
      val vm = rvRenames
      r = r.copy(
        schema = GraphSchema(
          r.schema.vertices.map(v => v.copy(name = vm.getOrElse(v.name, v.name))),
          r.schema.edges.map(e => e.copy(
            source = vm.getOrElse(e.source, e.source),
            target = vm.getOrElse(e.target, e.target)))),
        resources = r.resources.map(res => res.copy(steps =
          res.steps.map(renameStepVertices(_, vm, Map.empty, Map.empty)))))
    }
    val resRenames = r.resources.map(_.name).filter(leftRes)
      .map(n => n -> collide("resource", n)).toMap
    r = r.copy(resources = r.resources.map(res =>
      res.copy(name = resRenames.getOrElse(res.name, res.name))))
    r.schema.edges.map(_.relation)
      .filter(rel => leftRel(rel) && !op.relations.exists(_.into == rel))
      .foreach(rel => if (op.nameConflict != "prefix_right")
        throw new IllegalArgumentException(
          s"compose: right relation '$rel' collides with left (nameConflict=error)"))

    // union schema with merge of equivalent vertex types
    val rByName = r.schema.vertexByName
    val mergedVertices = l.schema.vertices.map { lv =>
      if (!mergedNames(lv.name)) lv
      else rByName.get(lv.name) match {
        case None => lv
        case Some(rv) =>
          val veq = op.vertices.find(_.into == lv.name).get
          val props = (lv.properties ++ rv.properties)
            .groupBy(_.name).values.map(_.head).toSeq
            .sortBy(p => (lv.properties ++ rv.properties).indexWhere(_.name == p.name))
          val identity = veq.identity match {
            case Some(fs) => Identity.Natural(fs)
            case None =>
              val flagged = veq.properties.filter(_.identity).map(_.into)
              Identity.Natural(
                (lv.idColumns ++ rv.idColumns ++ flagged).distinct)
          }
          lv.copy(properties = props, identity = identity)
      }
    } ++ r.schema.vertices.filterNot(v =>
      mergedNames(v.name) || l.schema.vertexByName.contains(v.name))
    val mergedEdges = (l.schema.edges ++ r.schema.edges)
      .groupBy(e => (e.source, e.target, e.relation)).values.map(_.head).toSeq
    GraphManifest(
      name = left.name,
      schema = GraphSchema(mergedVertices, mergedEdges),
      resources = l.resources ++ r.resources,
      bindings = left.bindings ++ right.bindings)
  }
}
