package graft.evolve

import graft.model._

/** Migration planner — the reference's `MigrationPlanner`
  * (graflo/migrate/planner.py:13-65): order a diff's ops into a
  * deterministic structural-dependency sequence (adds before type
  * changes before removes before identity/rekey; within a rank,
  * alphabetical by target) and gate everything above LOW risk unless
  * the caller explicitly allows it — blocked ops are REPORTED, never
  * silently dropped.
  */
object Planner {
  import EvolutionOp._

  final case class Plan(
      operations: Seq[EvolutionOp],
      blocked: Seq[(EvolutionOp, Risk.Level)],
      warnings: Seq[String])

  /** planner.py OP_ORDER, mapped onto graft's op algebra */
  private def rank(op: EvolutionOp): Int = op match {
    case _: AddVertex                                    => 10
    case _: AddEdge | _: InverseEdge                     => 20
    case _: AddProperty                                  => 30
    case _: AddEdgeProperty                              => 40
    case _: SetFieldType | _: SetEdgeFieldType           => 70
    case _: AddSecondaryIdentity | _: RemoveSecondaryIdentity => 105
    case _: RemoveEdgeProperty | _: RenameEdgeProperty   => 110
    case _: RemoveProperty | _: RenameProperty           => 120
    case _: RemoveEdge | _: RenameRelation | _: RenameRelations
       | _: MergeEdges | _: RetargetEdge | _: SetEdgeDirected => 130
    case _: RemoveVertex | _: RenameVertex               => 140
    case _: ReplaceEdgeIdentities                        => 150
    case _: ReplaceIdentity                              => 160
    case _: MergeVertices                                => 170
    case _                                               => 9999
  }

  /** stable intra-rank key (planner.py sorts by `op.target`) */
  private def target(op: EvolutionOp): String = op match {
    case AddVertex(v)                  => s"vertex:${v.name}"
    case RemoveVertex(n)               => s"vertex:$n"
    case RenameVertex(a, _)            => s"vertex:$a"
    case RenameVertices(m)             => s"vertex:${m.keys.toSeq.sorted.mkString(",")}"
    case AddProperty(v, f)             => s"vertex:$v:$f"
    case RemoveProperty(v, f)          => s"vertex:$v:$f"
    case RenameProperty(v, a, _)       => s"vertex:$v:$a"
    case SetFieldType(v, f, _)         => s"vertex:$v:$f"
    case ReplaceIdentity(v, _, _, _)   => s"vertex:$v"
    case AddSecondaryIdentity(v, s)    => s"vertex:$v:${s.name}"
    case RemoveSecondaryIdentity(v, n) => s"vertex:$v:$n"
    case MergeVertices(srcs, into, _, _) => s"vertex:${srcs.mkString("+")}>$into"
    case AddEdge(e)                    => s"edge:${e.key.storeName}"
    case RemoveEdge(k)                 => s"edge:${k.storeName}"
    case RenameRelation(k, _)          => s"edge:${k.storeName}"
    case RenameRelations(m)            => s"edge:${m.keys.toSeq.sorted.mkString(",")}"
    case MergeEdges(srcs, into)        => s"edge:${srcs.mkString("+")}>$into"
    case RetargetEdge(k, _, _)         => s"edge:${k.storeName}"
    case InverseEdge(k, _)             => s"edge:${k.storeName}"
    case SetEdgeFieldType(rel, f, _)   => s"edge:$rel:$f"
    case AddVertexIndexes(v, _)        => s"vertex:$v:indexes"
    case RemoveVertexIndexes(v, _)     => s"vertex:$v:indexes"
    case AddEdgeIndexes(k, _)          => s"edge:${k.storeName}:indexes"
    case RemoveEdgeIndexes(k, _)       => s"edge:${k.storeName}:indexes"
    case AddEdgeProperty(k, f)         => s"edge:${k.storeName}:${f.name}"
    case RenameEdgeProperty(k, a, _)   => s"edge:${k.storeName}:$a"
    case RemoveEdgeProperty(k, f)      => s"edge:${k.storeName}:$f"
    case SetEdgeDirected(k, _)         => s"edge:${k.storeName}"
    case ReplaceEdgeIdentities(k, _)   => s"edge:${k.storeName}"
  }

  def build(ops: Seq[EvolutionOp], allowHighRisk: Boolean = false): Plan = {
    val ordered = ops.sortBy(op => (rank(op), target(op)))
    val (runnable, blocked) = ordered.partition(op =>
      allowHighRisk || Risk.classify(op) == Risk.Low)
    val gateWarnings =
      if (blocked.nonEmpty && !allowHighRisk)
        Seq("High-risk operations are blocked by default. " +
          "Re-run with allowHighRisk = true to include them.")
      else Nil
    // 1.10.5 ingestion-reach surface (ops.py INGESTION_REWRITING_OPS):
    // applying these to a schema stored apart from its resources silently
    // drops half the work — say so up front, in the reference's tokens
    val reach = Risk.opsReachingIngestion(ordered).distinct
    val reachWarnings =
      if (reach.nonEmpty)
        Seq("Ops reaching the ingestion model (apply to the FULL manifest, " +
          s"not a bare schema): ${reach.mkString(", ")}")
      else Nil
    Plan(runnable, blocked.map(op => op -> Risk.classify(op)),
      gateWarnings ++ reachWarnings)
  }
}
