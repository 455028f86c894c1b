package graft.evolve

import graft.model._
import graft.store.GraphStore
import org.apache.spark.sql.functions._

/** Schema evolution — the reference's declarative manifest-DDL ops
  * (graflo/architecture/evolution/ops.py:50-620, apply.py, rewrite.py,
  * autogenerate.py): pure schema→schema transformations, plus the data
  * rewrite jobs they imply on a live store.
  */
sealed trait EvolutionOp { def apply(s: GraphSchema): GraphSchema }

object EvolutionOp {
  private def mapVertex(s: GraphSchema, name: String)(f: VertexDef => VertexDef) =
    s.copy(vertices = s.vertices.map(v => if (v.name == name) f(v) else v))

  final case class AddVertex(v: VertexDef) extends EvolutionOp {
    def apply(s: GraphSchema) = s.copy(vertices = s.vertices :+ v)
  }
  /** remove + cascade delete of incident edges (ops.py remove_vertex) */
  final case class RemoveVertex(name: String) extends EvolutionOp {
    def apply(s: GraphSchema) = s.copy(
      vertices = s.vertices.filterNot(_.name == name),
      edges = s.edges.filterNot(e => e.source == name || e.target == name))
  }
  /** rename + rewrite of all edge references */
  final case class RenameVertex(from: String, to: String) extends EvolutionOp {
    def apply(s: GraphSchema) = s.copy(
      vertices = s.vertices.map(v => if (v.name == from) v.copy(name = to) else v),
      edges = s.edges.map(e => e.copy(
        source = if (e.source == from) to else e.source,
        target = if (e.target == from) to else e.target)))
  }
  final case class AddProperty(vertex: String, field: FieldDef) extends EvolutionOp {
    def apply(s: GraphSchema) = mapVertex(s, vertex)(v =>
      v.copy(properties = v.properties :+ field))
  }
  final case class RemoveProperty(vertex: String, field: String) extends EvolutionOp {
    def apply(s: GraphSchema) = mapVertex(s, vertex)(v =>
      v.copy(properties = v.properties.filterNot(_.name == field)))
  }
  final case class RenameProperty(vertex: String, from: String, to: String) extends EvolutionOp {
    private def ren(f: String) = if (f == from) to else f
    def apply(s: GraphSchema) = mapVertex(s, vertex)(v => v.copy(
      properties = v.properties.map(p => if (p.name == from) p.copy(name = to) else p),
      identity = v.identity match {
        case Identity.Natural(fs) => Identity.Natural(fs.map(ren))
        case Identity.Hash(fs)    => Identity.Hash(fs.map(ren))
        case Identity.Funnel(bs, mk) => Identity.Funnel(bs.map(b =>
          b.copy(whenAllPresent = b.whenAllPresent.map(ren),
            digestFields = b.digestFields.map(ren))), mk)
        case other                => other
      },
      secondary = v.secondary.map(sec => sec.copy(fields = sec.fields.map(ren)))))
  }
  final case class SetFieldType(vertex: String, field: String, ftype: FieldType) extends EvolutionOp {
    def apply(s: GraphSchema) = mapVertex(s, vertex)(v => v.copy(
      properties = v.properties.map(p =>
        if (p.name == field) p.copy(ftype = Some(ftype)) else p)))
  }
  /** identity replacement natural↔hash↔funnel↔assigned↔blank (ops.py) */
  final case class ReplaceIdentity(vertex: String, identity: Identity) extends EvolutionOp {
    def apply(s: GraphSchema) = mapVertex(s, vertex)(_.copy(identity = identity))
  }
  final case class AddSecondaryIdentity(vertex: String, sec: SecondaryIdentity) extends EvolutionOp {
    def apply(s: GraphSchema) = mapVertex(s, vertex)(v => v.copy(secondary = v.secondary :+ sec))
  }
  final case class RemoveSecondaryIdentity(vertex: String, name: String) extends EvolutionOp {
    def apply(s: GraphSchema) = mapVertex(s, vertex)(v =>
      v.copy(secondary = v.secondary.filterNot(_.name == name)))
  }
  final case class AddEdge(e: EdgeDef) extends EvolutionOp {
    def apply(s: GraphSchema) = s.copy(edges = s.edges :+ e)
  }
  final case class RemoveEdge(key: EdgeKey) extends EvolutionOp {
    def apply(s: GraphSchema) = s.copy(edges = s.edges.filterNot(_.key == key))
  }
  final case class RenameRelation(key: EdgeKey, to: String) extends EvolutionOp {
    def apply(s: GraphSchema) = s.copy(edges = s.edges.map(e =>
      if (e.key == key) e.copy(relation = to) else e))
  }
  /** retarget an edge to different endpoint types (ops.py retarget) */
  final case class RetargetEdge(key: EdgeKey, newSource: String, newTarget: String) extends EvolutionOp {
    def apply(s: GraphSchema) = s.copy(edges = s.edges.map(e =>
      if (e.key == key) e.copy(source = newSource, target = newTarget) else e))
  }
  /** add the inverse edge (ops.py inverse_edge) */
  final case class InverseEdge(key: EdgeKey, relation: String) extends EvolutionOp {
    def apply(s: GraphSchema) = s.edgeByKey.get(key) match {
      case Some(e) => s.copy(edges = s.edges :+
        e.copy(source = e.target, target = e.source, relation = relation))
      case None => s
    }
  }
}

object Evolution {

  def apply(s: GraphSchema, ops: Seq[EvolutionOp]): GraphSchema =
    ops.foldLeft(s)((acc, op) => op(acc))

  /** Autogenerate the op chain turning `from` into `to` (the reference's
    * autogenerate.py diff): additive/destructive vertex, property, and edge
    * differences. Renames are not guessed (same as a conservative diff).
    */
  def diff(from: GraphSchema, to: GraphSchema): Seq[EvolutionOp] = {
    import EvolutionOp._
    val ops = scala.collection.mutable.ArrayBuffer.empty[EvolutionOp]
    val fromV = from.vertexByName; val toV = to.vertexByName
    (toV.keySet -- fromV.keySet).toSeq.sorted.foreach(n => ops += AddVertex(toV(n)))
    (fromV.keySet -- toV.keySet).toSeq.sorted.foreach(n => ops += RemoveVertex(n))
    (fromV.keySet & toV.keySet).toSeq.sorted.foreach { n =>
      val a = fromV(n); val b = toV(n)
      val ap = a.properties.map(_.name).toSet; val bp = b.properties.map(_.name).toSet
      (bp -- ap).toSeq.sorted.foreach(p =>
        ops += AddProperty(n, b.properties.find(_.name == p).get))
      (ap -- bp).toSeq.sorted.foreach(p => ops += RemoveProperty(n, p))
      if (a.identity != b.identity) ops += ReplaceIdentity(n, b.identity)
    }
    val fromE = from.edgeByKey.keySet; val toE = to.edgeByKey.keySet
    (toE -- fromE).toSeq.sortBy(_.storeName).foreach(k => ops += AddEdge(to.edgeByKey(k)))
    (fromE -- toE).toSeq.sortBy(_.storeName).foreach(k => ops += RemoveEdge(k))
    ops.toSeq
  }

  /** Apply the data rewrites an op chain implies on a live store (the
    * reference's migrate/ emitters + rewrite.py, as DataFrame jobs): rename
    * property → column rename rewrite; replace identity → re-key (re-mint
    * synthetic ids); remove property → column drop. Schema-only ops touch no
    * data.
    */
  def migrateStore(store: GraphStore, ops: Seq[EvolutionOp]): GraphSchema = {
    import EvolutionOp._
    import org.apache.spark.sql.functions.col
    var schema = store.schema

    /** rewrite the src_/dst_ endpoint columns of every stored edge incident
      * to `vx` — edges are keyed on the vertex identity, so identity-affecting
      * vertex rewrites must cascade or every traversal/dedup breaks.
      */
    def rewriteIncidentEdges(vx: String)(rewrite: (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame): Unit =
      schema.edges.filter(e => e.source == vx || e.target == vx).foreach { e =>
        store.readEdges(e.key).foreach { df =>
          var out = df
          if (e.source == vx) out = rewrite(out, "src_")
          if (e.target == vx) out = rewrite(out, "dst_")
          store.overwriteEdges(e.key, out)
        }
      }

    ops.foreach { op =>
      op match {
        case RenameProperty(vx, from, to) =>
          store.readVertices(vx).foreach { df =>
            store.overwriteVertices(vx, df.withColumnRenamed(from, to))
          }
          val wasIdField = schema.vertex(vx).idColumns.contains(from)
          if (wasIdField) rewriteIncidentEdges(vx) { (df, pfx) =>
            df.withColumnRenamed(s"$pfx$from", s"$pfx$to")
          }
        case RemoveProperty(vx, f) =>
          store.readVertices(vx).foreach(df => store.overwriteVertices(vx, df.drop(f)))
        case ReplaceIdentity(vx, _) =>
          val oldIdCols = schema.vertex(vx).idColumns
          store.readVertices(vx).foreach { df =>
            val vdefNew = op(schema).vertex(vx)
            val newIdCols = vdefNew.idColumns
            // id columns present in BOTH identities are value-stable: never
            // rename them (renaming would strip the new identity's own
            // column). Only old-ONLY id columns move aside while the new
            // identity is minted.
            val shared  = oldIdCols.filter(newIdCols.contains)
            // Old id columns that the NEW identity digests from (e.g.
            // Natural(["name"]) → Hash(["name"])) must stay in place while
            // the new identity is minted — renaming them first would make
            // IdentityDigest.withIdentity reference a missing column. They
            // keep their original name (they remain plain data fields), and
            // act like `shared` for the old→new edge-rekey mapping.
            val digestSrc: Set[String] = vdefNew.identity match {
              case Identity.Hash(fs)        => fs.toSet
              case Identity.Funnel(bs, _)   =>
                bs.flatMap(b => b.whenAllPresent ++ b.digestFields).toSet
              case _                        => Set.empty
            }
            val keptOld = oldIdCols.filterNot(newIdCols.contains)
              .filter(digestSrc.contains)
            val oldOnly = oldIdCols.filterNot(newIdCols.contains)
              .filterNot(digestSrc.contains)
            val newOnly = newIdCols.filterNot(shared.contains)
            val withOld = oldOnly.foldLeft(df)((d, c) =>
              d.withColumnRenamed(c, s"__old_$c"))
            val reKeyedBoth = graft.expr.IdentityDigest.withIdentity(vdefNew)(withOld)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            reKeyedBoth.count(): Unit // freeze row-ordinal-derived ids
            // vertices: restore non-synthetic old-only columns as plain
            // properties; a replaced synthetic _id is dropped
            val vertexOut = oldOnly.foldLeft(reKeyedBoth) { (d, c) =>
              if (c == GraphSchema.SyntheticId) d.drop(s"__old_$c")
              else d.withColumnRenamed(s"__old_$c", c)
            }
            store.overwriteVertices(vx, vertexOut)
            // re-key stored edges via the (old → new) mapping
            val mapping = reKeyedBoth.select(
              (oldOnly.map(c => s"__old_$c") ++ keptOld ++ shared ++ newOnly).map(col): _*)
            rewriteIncidentEdges(vx) { (edf, pfx) =>
              var m = mapping
              oldOnly.foreach(c => m = m.withColumnRenamed(s"__old_$c", s"$pfx$c"))
              (keptOld ++ shared).foreach(c => m = m.withColumnRenamed(c, s"$pfx$c"))
              newOnly.foreach(c => m = m.withColumnRenamed(c, s"__new_$pfx$c"))
              val joinKeys = oldIdCols.map(pfx + _)
              // shared keys stay (they are part of the new identity too);
              // old-only and kept-old keys are replaced by the mapped
              // new-only columns (they are no longer identity columns)
              val keep = edf.columns.filterNot((oldOnly ++ keptOld).map(pfx + _).contains)
              edf.join(m, joinKeys, "left")
                .select((keep.map(col) ++ newOnly.map(c =>
                  col(s"__new_$pfx$c").as(s"$pfx$c"))): _*)
            }
          }
        case _ => // schema-only
      }
      schema = op(schema)
    }
    schema
  }
}
