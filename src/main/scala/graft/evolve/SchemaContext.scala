package graft.evolve

import graft.model._

/** Bounded seeded schema slicing — the reference's schema-context surface
  * (graflo/architecture/schema/context/subschema.py:67-180): cut a large
  * schema down to the budgeted neighbourhood around seed vertex types, for
  * UIs and LLM prompting. Seeds are ALWAYS admitted (a slice that omits
  * what the caller asked about answers a different question); remaining
  * candidates admit hop-by-hop, nearest first, names ascending within a
  * hop, until the element budget is spent. Induced edges survive when both
  * endpoints do. Pure metadata — no Spark jobs.
  */
object SchemaContext {

  final case class ElisionReport(
      keptVertices: Seq[String],
      elidedVertices: Seq[String],
      elidedEdges: Seq[EdgeKey])

  def subschema(
      schema: GraphSchema,
      seeds: Seq[String],
      maxHops: Int = 3,
      maxVertices: Option[Int] = None
  ): (GraphSchema, ElisionReport) = {
    require(seeds.nonEmpty, "subschema requires at least one seed vertex type")
    val seedList = seeds.distinct
    seedList.foreach(s => require(schema.vertexByName.contains(s),
      s"subschema: seed '$s' is not a declared vertex type"))
    // undirected adjacency over the schema graph
    val adj: Map[String, Seq[String]] = (schema.edges.map(e => e.source -> e.target) ++
      schema.edges.map(e => e.target -> e.source))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    // BFS hop distance from the seed set
    var dist = seedList.map(_ -> 0).toMap
    var frontier = seedList
    var h = 0
    while (h < maxHops && frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains).sorted
      next.foreach(n => dist += n -> (h + 1))
      frontier = next
      h += 1
    }
    // admit nearest-first, names ascending within a hop, seeds always
    val ordered = dist.toSeq.sortBy { case (n, d) => (d, n) }.map(_._1)
    val cap = maxVertices.map(math.max(_, seedList.size))
    val kept = cap match {
      case Some(k) =>
        val nonSeed = ordered.filterNot(seedList.contains)
        (seedList ++ nonSeed.take(k - seedList.size)).distinct
      case None => ordered
    }
    val keptSet = kept.toSet
    val vertices = schema.vertices.filter(v => keptSet(v.name))
    val edges = schema.edges.filter(e => keptSet(e.source) && keptSet(e.target))
    val elidedV = schema.vertices.map(_.name).filterNot(keptSet)
    val elidedE = schema.edges.filterNot(e => keptSet(e.source) && keptSet(e.target))
      .map(_.key)
    (GraphSchema(vertices, edges), ElisionReport(kept, elidedV, elidedE))
  }

  /** Compact one-line-per-type schema summary (the reference's schema-card
    * rendering for prompts/UIs).
    */
  def schemaCard(schema: GraphSchema): String = {
    val vs = schema.vertices.map { v =>
      val props = v.properties.map(_.name).mkString(", ")
      val ids = v.idColumns.mkString(", ")
      s"vertex ${v.name}(id: [$ids]" +
        (if (props.nonEmpty) s"; props: [$props]" else "") + ")"
    }
    val es = schema.edges.map(e =>
      s"edge (${e.source})-[${e.relation}]->(${e.target})")
    (vs ++ es).mkString("\n")
  }
}
