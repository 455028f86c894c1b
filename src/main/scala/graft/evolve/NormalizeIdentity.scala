package graft.evolve

import scala.collection.mutable

import graft.model._

/** TigerGraph "consistent identity per relation" normalization — the
  * reference's `normalize_relation_identity` + `_normalize_role_indexes`
  * (graflo/architecture/evolution/sanitize.py:98-257, applied from
  * apply.py:1409-1419): edges sharing a PHYSICAL relation name must agree
  * on the source-role and target-role identity tuples, so the most
  * popular tuple per role wins and every dissenting vertex is rewritten
  * onto it (field renames where the tuples zip, untyped field additions
  * where the canonical tuple is longer).
  *
  * Executed parity: `nri_*` cases in ReferenceSanitizeParitySpec
  * (tools/gen_sanitize_fixture.py runs the reference's own
  * apply_evolution over the same manifests).
  */
object NormalizeIdentity {

  type PerVertex = mutable.LinkedHashMap[String, String]

  /** Normalize identity tuples across relation-sharing edges. Returns the
    * rewritten schema plus the accumulated per-vertex `{old -> new}` field
    * map in reference insertion order (the caller owes the db-profile
    * index rewrite and the ingestion pipeline rewrite, apply.py:1410-1419).
    */
  def apply(schema: GraphSchema): (GraphSchema, Seq[(String, Seq[(String, String)])]) = {
    var s = schema
    val renames = mutable.LinkedHashMap.empty[String, PerVertex]

    // group by PHYSICAL relation name (sanitize.py:281-290:
    // `edge_relation_name(edge_id, default_relation=edge.relation) or
    // edge.relation`); dict insertion order = edge declaration order
    val groups = mutable.LinkedHashMap.empty[String, Vector[EdgeDef]]
    s.edges.foreach { e =>
      val key = e.effectiveRelationName
      groups(key) = groups.getOrElse(key, Vector.empty) :+ e
    }

    groups.values.filter(_.size > 1).foreach { relationEdges =>
      // BOTH role lists are collected BEFORE either role normalizes
      // (sanitize.py:292-313): the target tuples may be stale w.r.t. the
      // source-role mutation within the same relation — executed truth,
      // mirrored deliberately (nri_stale_target pins it)
      val sourceIdx = relationEdges.map(e => e.source -> s.vertex(e.source).identityList)
      val targetIdx = relationEdges.map(e => e.target -> s.vertex(e.target).identityList)
      s = normalizeRole(sourceIdx, s, renames)
      s = normalizeRole(targetIdx, s, renames)
    }
    (s, renames.toSeq.map { case (v, m) => v -> m.toSeq })
  }

  /** sanitize.py:98-185 `_normalize_role_indexes`. */
  private def normalizeRole(
      vertexIndexes: Seq[(String, Seq[String])],
      schema: GraphSchema,
      renames: mutable.LinkedHashMap[String, PerVertex]): GraphSchema = {
    if (vertexIndexes.isEmpty) return schema
    // first occurrence per vertex name (sanitize.py:120-123)
    val dict = mutable.LinkedHashMap.empty[String, Seq[String]]
    vertexIndexes.foreach { case (v, fs) => if (!dict.contains(v)) dict(v) = fs }
    val tuples = dict.values.toVector
    if (tuples.distinct.size == 1) return schema

    // Counter(indexes_list).most_common(1): max count, ties break on the
    // FIRST tuple inserted (Python dict/Counter insertion order; Scala
    // maxBy keeps the first maximal element the same way)
    val counts = tuples.groupBy(identity).view.mapValues(_.size).toMap
    val mostPopular = tuples.distinct.maxBy(counts)

    var s = schema
    dict.foreach { case (vertexName, indexFields) =>
      if (indexFields != mostPopular) {
        val oldFields = indexFields
        val newFields = mostPopular
        // per-vertex maps ACCUMULATE across roles and relations; a
        // re-assigned old key keeps its original insertion position
        // (Python dict update semantics = LinkedHashMap update)
        val perVertex = renames.getOrElseUpdate(vertexName, mutable.LinkedHashMap.empty)
        if (oldFields.length == newFields.length) {
          oldFields.zip(newFields).foreach { case (o, n) => if (o != n) perVertex(o) = n }
        } else if (oldFields.nonEmpty && newFields.nonEmpty && oldFields.head != newFields.head) {
          perVertex(oldFields.head) = newFields.head
        }

        val vertex = s.vertex(vertexName)
        // walk the reference's MATERIALIZED property list applying the
        // WHOLE accumulated per-vertex map, dedup on the new name keeping
        // the first occurrence (sanitize.py:155-166)
        val seen = mutable.LinkedHashSet.empty[String]
        val newProps = Vector.newBuilder[FieldDef]
        vertex.referenceProperties.foreach { f =>
          val nn = perVertex.getOrElse(f.name, f.name)
          if (!seen.contains(nn)) {
            seen += nn
            newProps += (if (nn == f.name) f else f.copy(name = nn))
          }
        }
        // canonical identity fields with no source in the current
        // properties are genuinely new — appended untyped (sanitize.py:168-172)
        mostPopular.foreach { nf =>
          if (!seen.contains(nf)) { newProps += FieldDef(nf); seen += nf }
        }
        val props = newProps.result()
        s = s.copy(vertices = s.vertices.map(v =>
          if (v.name == vertexName)
            v.copy(identity = Identity.Natural(mostPopular), properties = props)
          else v))
      }
    }
    s
  }
}
