package graft.evolve

import graft.model._
import graft.pipeline._

/** Ingestion-plane impact of a vertex merge (reference
  * graflo/architecture/evolution/apply.py:333-489): a schema diff cannot
  * show that after merging types one resource's document now fills the
  * SAME accumulator slot twice (row fusion — two real-world entities
  * become one node) or that a joining edge became a self-relation (both
  * endpoints share one slot, so assembly merges previously distinct
  * rows). The merge therefore reports these hazards up front and refuses
  * unless each is explicitly affirmed, instead of leaving them to be
  * discovered against a populated database.
  */
object MergeImpact {

  /** What the merge changes beneath the schema diff. `advisories` are
    * warnings, not gates (reference logs them): the union-identity note
    * and the inference-ambiguity note.
    */
  final case class Impact(
      selfRelations: Seq[String],
      fusedLevels: Seq[String],
      advisories: Seq[String])

  /** `_describe_merge_impact` (apply.py:372-428) over the pre-merge
    * schema edges and the POST-rewrite resources (vertex names already
    * mapped sources→into, as `apply_merge_vertices` rewrites the
    * ingestion model before describing impact).
    */
  def describe(beforeEdges: Seq[EdgeDef], schemaAfter: GraphSchema,
      resourcesAfter: Seq[ResourceDef], sources: Seq[String], into: String): Impact = {
    val gone = sources.toSet
    def ren(n: String) = if (gone(n)) into else n

    def relName(r: String) = if (r == null || r.isEmpty) "None" else r
    val selfRelations = beforeEdges
      .filter(e => e.source != e.target && ren(e.source) == ren(e.target))
      .map(e => s"(${e.source}, ${e.target}, ${relName(e.relation)}) -> " +
        s"(${ren(e.source)}, ${ren(e.target)}, ${relName(e.relation)})")
      .sorted

    // paths of pipeline levels where `into` is produced by MORE than one
    // step (apply.py:333-369 _merged_name_step_counts)
    def levelHits(steps: Seq[Step], path: String): Seq[String] = {
      var produced = 0
      val hits = scala.collection.mutable.ArrayBuffer.empty[String]
      steps.zipWithIndex.foreach {
        case (v: VertexStep, _) if v.vertex == into => produced += 1
        case (r: VertexRouterStep, _)
            if r.typeMap.values.exists(_ == into) => produced += 1
        case (d: Descend, i) =>
          hits ++= levelHits(d.steps, s"$path[$i].pipeline")
        case _ => ()
      }
      if (produced > 1) hits += s"$path ($produced steps produce '$into')"
      hits.toSeq
    }
    val fusedLevels = resourcesAfter.flatMap(r =>
      levelHits(r.steps, "pipeline").map(h => s"${r.name}: $h"))

    val advisories = scala.collection.mutable.ArrayBuffer.empty[String]
    schemaAfter.vertexByName.get(into).foreach { v =>
      val ids = v.idColumns
      if (ids.size > 1)
        advisories += s"merged identity for '$into' is the union $ids; if no " +
          "source row carries all of these, rows will not collide and the " +
          "types merge without the entities merging"
    }
    val ambiguous = schemaAfter.edges.groupBy(e => (e.source, e.target))
      .collect { case ((s, t), es) if es.size > 1 =>
        s"($s, $t): ${es.map(e => if (e.relation == null || e.relation.isEmpty) "None" else e.relation).sorted}" }
      .toSeq.sorted
    if (ambiguous.nonEmpty)
      advisories += "vertex pairs now carry more than one relation, which " +
        s"changes edge inference for resources using infer_edges: $ambiguous"
    Impact(selfRelations, fusedLevels, advisories.toSeq)
  }

  /** Rewrite a resource's steps for the merge: vertex steps, router
    * type_map targets and edge-step endpoints naming a source type now
    * name `into` (reference `_rewrite_ingestion_for_merge`).
    */
  def rewriteResource(r: ResourceDef, sources: Seq[String], into: String): ResourceDef = {
    val gone = sources.toSet
    def ren(n: String) = if (gone(n)) into else n
    def rw(steps: Seq[Step]): Seq[Step] = steps.map {
      case v: VertexStep       => v.copy(vertex = ren(v.vertex))
      case r0: VertexRouterStep =>
        r0.copy(typeMap = r0.typeMap.view.mapValues(ren).toMap,
          perTypeFrom = r0.perTypeFrom.map { case (k, m) => ren(k) -> m })
      case e: EdgeStep         => e.copy(source = ren(e.source), target = ren(e.target))
      case m: MultiEdgeStep    => MultiEdgeStep(m.links.map(l =>
        l.copy(source = ren(l.source), target = ren(l.target))))
      case d: Descend          => d.copy(steps = rw(d.steps))
      case other               => other
    }
    r.copy(steps = rw(r.steps),
      inferEdgeOnly = r.inferEdgeOnly.map { case (s, t) => (ren(s), ren(t)) }.distinct,
      inferEdgeExcept = r.inferEdgeExcept.map { case (s, t) => (ren(s), ren(t)) }.distinct)
  }

  /** Manifest-plane `apply_merge_vertices` (apply.py:431-489): rewrite the
    * resources, apply the schema op, then GATE on the described impact —
    * self-relations and row fusion each need their own affirmation flag.
    * Returns the merged schema, the rewritten resources and the impact
    * (advisories included for the caller to surface).
    */
  def applyMergeVertices(op: EvolutionOp.MergeVertices, schema: GraphSchema,
      resources: Seq[ResourceDef]): (GraphSchema, Seq[ResourceDef], Impact) = {
    val beforeEdges = schema.edges
    // the schema op itself refuses un-affirmed self-relations; run the
    // describe FIRST so the error carries the full hazard report
    val rewritten = resources.map(rewriteResource(_, op.sources, op.into))
    val schemaOpAffirmed = op.copy(allowSelfRelations = true)
    val after = schemaOpAffirmed(schema)
    val impact = describe(beforeEdges, after, rewritten, op.sources, op.into)
    if (impact.selfRelations.nonEmpty && !op.allowSelfRelations)
      throw new IllegalArgumentException(
        s"merge_vertices: merging ${op.sources.sorted} into '${op.into}' turns " +
          s"edges into self-relations: ${impact.selfRelations}. Both endpoints " +
          "then share one accumulator slot, so assembly merges rows that were " +
          "separate nodes. Remove or retarget those edges first, or set " +
          "allowSelfRelations=true to accept the self-relation.")
    if (impact.fusedLevels.nonEmpty && !op.allowRowFusion)
      throw new IllegalArgumentException(
        s"merge_vertices: merging ${op.sources.sorted} into '${op.into}' leaves " +
          s"pipeline levels producing '${op.into}' more than once: " +
          s"${impact.fusedLevels}. One source document yielded both types, so " +
          "the merged rows fuse into a single node. Split the resource, or set " +
          "allowRowFusion=true if fusing them is the intent.")
    (after, rewritten, impact)
  }
}
