package graft.evolve

import graft.model._

/** Bounded schema context — the reference's agent-facing scoped-schema
  * surface (graflo/architecture/schema/context/: graph.py, rank.py,
  * budget.py, subschema.py, elision.py, card.py), executed-parity pinned
  * by `ReferenceSchemaContextParitySpec` / `tools/gen_schema_context_fixture.py`.
  *
  * Four deliverables, all pure metadata (no Spark jobs):
  *   - [[SchemaGraph]]: an adjacency index over the schema's vertex TYPES
  *     (never data-plane instances — the instance counterpart is
  *     `GraphReader.neighbors`, and the two deliberately do not share a
  *     name): out/in edges, degree, `schemaNeighbors` hop-bounded BFS,
  *     `relationsBetween` bounded simple-path enumeration.
  *   - [[SchemaContext.scoreVertices]]: local-signal ranking (hop decay,
  *     degree, identity-mode strength, log-scaled property count, index
  *     presence) with deterministic name tie-breaks; blank vertices rank
  *     last because they carry no natural key to filter on.
  *   - [[SchemaContext.subschema]]: a budgeted slice around seed types — a
  *     valid standalone schema plus an [[ElisionReport]] of everything left
  *     out; seeds are always admitted, budgets are MEASURED over the same
  *     compact serialization the transport would send, and a final
  *     measure-and-trim loop guarantees the assembled payload actually
  *     fits the token ceiling.
  *   - [[SchemaContext.buildCard]]: a bounded orientation card (counts,
  *     hub types, entry points, identity-mode histogram, vocabularies)
  *     whose size does not grow with the schema.
  *
  * Token budgeting follows budget.py exactly: compact JSON
  * (`json.dumps(separators=(",",":"), sort_keys=True, default=str)`) over
  * the reference's minimal-canonical dict form, CHARS_PER_TOKEN = 4, and
  * the exact `serializedChars` reported alongside so a caller holding a
  * real tokenizer can re-estimate. [[SchemaContext.serializeCompact]]
  * reproduces that serialization byte-for-byte (float repr via
  * [[graft.expr.PyJsonCanon.pyFloatRepr]]), and the `*Dict` builders
  * reproduce the reference models' `to_minimal_canonical_dict` (pydantic
  * `model_dump(exclude_defaults, exclude_none, by_alias)`) for the schema
  * plane, so budgets and `serializedChars` are key-comparable across
  * engines.
  */
object SchemaContext {

  type EdgeId = EdgeKey

  // ------------------------------------------------------------ serializer

  /** Compact, stable serialization (reference budget.py serialize_compact:
    * `json.dumps(payload, separators=(",",":"), sort_keys=True, default=str)`).
    */
  def serializeCompact(v: Any): String = {
    val sb = new java.lang.StringBuilder
    def render(x: Any): Unit = x match {
      case null             => sb.append("null")
      case b: Boolean       => sb.append(if (b) "true" else "false")
      case i: Int           => sb.append(i)
      case l: Long          => sb.append(l)
      case d: Double        => sb.append(graft.expr.PyJsonCanon.pyFloatRepr(d))
      case s: String        => str(s)
      case opt: Option[_]   => render(opt.orNull)
      case m: Map[_, _] =>
        sb.append('{')
        val entries = m.asInstanceOf[Map[String, Any]].toSeq
          .sortWith((a, b) => codePointLt(a._1, b._1))
        var first = true
        entries.foreach { case (k, value) =>
          if (!first) sb.append(','); first = false
          str(k); sb.append(':'); render(value)
        }
        sb.append('}')
      case xs: Seq[_] =>
        sb.append('[')
        var first = true
        xs.foreach { e => if (!first) sb.append(','); first = false; render(e) }
        sb.append(']')
      case other => str(other.toString) // default=str
    }
    def str(s: String): Unit = {
      // ensure_ascii escaping, same rules PyJsonCanon implements
      sb.append('"')
      s.foreach {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case c if c >= 0x20 && c <= 0x7e => sb.append(c)
        case c => sb.append(f"\\u${c.toInt}%04x")
      }
      sb.append('"')
    }
    render(v)
    sb.toString
  }

  private def codePointLt(a: String, b: String): Boolean = {
    val ai = a.codePoints().toArray; val bi = b.codePoints().toArray
    val n = math.min(ai.length, bi.length)
    var i = 0
    while (i < n) { if (ai(i) != bi(i)) return ai(i) < bi(i); i += 1 }
    ai.length < bi.length
  }

  /** CHARS_PER_TOKEN = 4 (budget.py:22): a documented estimate, not a
    * tokenizer — the exact char count rides alongside every estimate.
    */
  val CharsPerToken = 4.0

  def estimateTokens(payload: Any): Int =
    math.ceil(serializeCompact(payload).length / CharsPerToken).toInt

  // ------------------------------------- minimal canonical dicts (parity)

  /** Vertex identity mode token (reference vertex.py:777-790 — a funnel
    * resolves to "hash": both derive a synthetic key).
    */
  def identityMode(v: VertexDef): String = v.identity match {
    case Identity.Blank       => "blank"
    case _: Identity.Assigned => "assigned"
    case _: Identity.Hash     => "hash"
    case _: Identity.Funnel   => "hash"
    case _: Identity.Natural  => "natural"
  }

  /** Property names in the reference's runtime order: declared properties,
    * then identity fields not already declared (the reference appends
    * primary-identity fields, and hash/funnel/blank mint `id`).
    */
  def propertyNames(v: VertexDef): Seq[String] = {
    val declared = v.properties.map(_.name)
    val idFields = v.identity match {
      case Identity.Natural(fs)  => fs
      case Identity.Assigned(f)  => Seq(f)
      case _                     => Seq("id") // minted synthetic key
    }
    declared ++ idFields.filterNot(declared.contains)
  }

  /** Identity-bearing fields that must never be elided (subschema.py
    * protected_property_names): primary identity, secondary-identity
    * fields, digest source fields.
    */
  def protectedPropertyNames(v: VertexDef): Set[String] = {
    val digest = v.identity match {
      case Identity.Hash(fs)        => fs.toSet
      case Identity.Funnel(bs, _)   => bs.flatMap(_.digestFields).toSet
      case _                        => Set.empty[String]
    }
    idColumnsOf(v).toSet ++ v.secondary.flatMap(_.fields) ++ digest
  }

  private def idColumnsOf(v: VertexDef): Seq[String] = v.identity match {
    case Identity.Natural(fs) => fs
    case Identity.Assigned(f) => Seq(f)
    case _                    => Seq("id")
  }

  private def fieldTypeToken(t: FieldType): String = t match {
    case FieldType.IntT       => "INT"
    case FieldType.UIntT      => "UINT"
    case FieldType.FloatT     => "FLOAT"
    case FieldType.DoubleT    => "DOUBLE"
    case FieldType.BoolT      => "BOOL"
    case FieldType.StringT    => "STR"
    case FieldType.DatetimeT  => "DATETIME"
    case FieldType.UuidT      => "UUID"
    case FieldType.ListT(i)   => s"LIST[${fieldTypeToken(i)}]"
  }

  def semanticsDict(s: Semantics): Map[String, Any] = {
    var m = Map.empty[String, Any]
    s.iri.foreach(i => m += "iri" -> i)
    if (s.exactMatch.nonEmpty) m += "exact_match" -> s.exactMatch
    if (s.synonyms.nonEmpty) m += "synonyms" -> s.synonyms
    s.unit.foreach(u => m += "unit" -> u)
    m
  }

  /** Vertex → reference `to_minimal_canonical_dict` shape (probed against
    * the reference's pydantic dump for every identity mode).
    * `dropProperties` supports the subschema property cap.
    */
  def vertexDict(v: VertexDef, dropProperties: Set[String] = Set.empty,
      description: Option[String] = None): Map[String, Any] = {
    val props: Seq[Any] = propertyNames(v).filterNot(dropProperties)
      .map { n =>
        val fd = v.properties.find(_.name == n)
        var p: Map[String, Any] = Map("name" -> n)
        fd.flatMap(_.ftype).foreach(t => p += "type" -> fieldTypeToken(t))
        fd.flatMap(_.semantics).foreach(s => p += "semantics" -> semanticsDict(s))
        p
      }
    var m: Map[String, Any] = Map(
      "name" -> v.name,
      "identity" -> idColumnsOf(v),
      "properties" -> props)
    v.identity match {
      case Identity.Blank       => m += "blank" -> true
      case _: Identity.Assigned => m += "assigned" -> true
      case Identity.Hash(fs)    => m += "hash_identity_properties" -> fs
      case Identity.Funnel(bs, _) =>
        m += "identity_funnel" -> Map("branches" -> bs.map(b => Map(
          "id" -> b.name, "when_all_present" -> b.whenAllPresent,
          "fields" -> b.digestFields)))
      case _ => ()
    }
    if (v.secondary.nonEmpty)
      m += "secondary_identities" -> v.secondary.map(s =>
        Map("name" -> s.name, "fields" -> s.fields))
    v.semantics.foreach(s => m += "semantics" -> semanticsDict(s))
    description.foreach(d => m += "description" -> d)
    m
  }

  def edgeDict(e: EdgeDef): Map[String, Any] = {
    var m: Map[String, Any] = Map("source" -> e.source, "target" -> e.target)
    if (e.relationDeclared) m += "relation" -> e.relation
    if (!e.directed) m += "directed" -> false
    e.semantics.foreach(s => m += "semantics" -> semanticsDict(s))
    m
  }

  /** Metadata + db-profile envelope dicts. graft's GraphSchema has no
    * metadata block; the caller passes name/version so fixture parity can
    * carry the reference's. The db profile derives `vertex_indexes` from
    * secondary identities exactly like the reference's default profile.
    */
  def metadataDict(name: String, version: Option[String] = None,
      description: Option[String] = None): Map[String, Any] = {
    var m: Map[String, Any] = Map("name" -> name)
    version.foreach(v => m += "version" -> v)
    description.foreach(d => m += "description" -> d)
    m
  }

  def dbProfileDict(schema: GraphSchema, keep: Set[String] = null): Map[String, Any] = {
    val kept = Option(keep).getOrElse(schema.vertices.map(_.name).toSet)
    val idx = schema.vertices.filter(v => kept(v.name) && v.secondary.nonEmpty)
      .map(v => v.name -> v.secondary.map(s =>
        Map("fields" -> s.fields, "unique" -> false)))
    if (idx.isEmpty) Map.empty else Map("vertex_indexes" -> idx.toMap)
  }

  /** Whole-schema dict in the reference's slice-payload shape. */
  def schemaDict(schema: GraphSchema, metadata: Map[String, Any],
      dropProperties: Map[String, Set[String]] = Map.empty): Map[String, Any] = {
    // empty element lists are pydantic defaults and excluded from the dump
    // (an empty edge plane renders as "edge_config":{})
    def nonEmptyList(key: String, xs: Seq[Any]): Map[String, Any] =
      if (xs.isEmpty) Map.empty else Map(key -> xs)
    var m: Map[String, Any] = Map(
      "core_schema" -> Map(
        "vertex_config" -> nonEmptyList("vertices", schema.vertices.map(v =>
          vertexDict(v, dropProperties.getOrElse(v.name, Set.empty)))),
        "edge_config" -> nonEmptyList("edges", schema.edges.map(edgeDict))))
    if (metadata.nonEmpty) m += "metadata" -> metadata
    val dbp = dbProfileDict(schema)
    if (dbp.nonEmpty) m += "db_profile" -> dbp
    m
  }

  // ----------------------------------------------------------- SchemaGraph

  def edgeSortKey(k: EdgeId, relationDeclared: Boolean = true): (String, String, String) =
    (k.source, k.target, if (relationDeclared) k.relation else "")

  final case class SchemaPath(vertices: Seq[String], edges: Seq[EdgeId]) {
    def length: Int = edges.size
  }

  final case class SchemaNeighborhood(
      origin: String, hops: Int, direction: graft.query.Direction,
      distances: Map[String, Int], edges: Seq[EdgeId]) {
    /** Reachable types, nearest first then alphabetical. */
    def vertexTypes: Seq[String] =
      distances.keys.toSeq.sortBy(n => (distances(n), n))
  }

  /** Read-only adjacency index over a schema's vertex types
    * (reference graph.py SchemaGraph). Plain maps — no heavyweight deps.
    */
  final class SchemaGraph(val schema: GraphSchema) {
    import graft.query.Direction

    private val byKey: Map[EdgeId, EdgeDef] = schema.edgeByKey
    private def sortKey(k: EdgeId) = edgeSortKey(k, byKey(k).relationDeclared)

    val vertexTypes: Set[String] = schema.vertices.map(_.name).toSet
    val edgeIds: Seq[EdgeId] = schema.edges.map(_.key).sortBy(sortKey)

    private val out: Map[String, Seq[EdgeId]] =
      schema.edges.groupBy(_.source).map { case (s, es) =>
        s -> es.map(_.key).sortBy(sortKey) }
    private val in: Map[String, Seq[EdgeId]] =
      schema.edges.groupBy(_.target).map { case (t, es) =>
        t -> es.map(_.key).sortBy(sortKey) }

    def edge(k: EdgeId): EdgeDef = byKey(k)
    def outEdges(t: String): Seq[EdgeId] = out.getOrElse(t, Nil)
    def inEdges(t: String): Seq[EdgeId] = in.getOrElse(t, Nil)
    /** Incident count, self-loops counted twice (graph.py degree). */
    def degree(t: String): Int = outEdges(t).size + inEdges(t).size
    def isolatedTypes: Seq[String] =
      vertexTypes.toSeq.filter(degree(_) == 0).sorted
    def relationVocabulary: Seq[String] =
      schema.edges.filter(_.relationDeclared).map(_.relation).distinct.sorted

    /** Far endpoint when `k` may be followed from `anchor` (graph.py
      * _traversable) — note these are the NORMAL schema-plane direction
      * semantics, not the instance plane's `_anchor_side` dialect.
      */
    private def traversable(k: EdgeId, anchor: String, dir: Direction): Option[String] = {
      val undirected = !byKey(k).directed
      val eff = if (undirected) Direction.Any else dir
      if (k.source == anchor && (eff == Direction.Out || eff == Direction.Any))
        Some(k.target)
      else if (k.target == anchor && (eff == Direction.In || eff == Direction.Any))
        Some(k.source)
      else None
    }

    private def incident(t: String): Seq[EdgeId] =
      (outEdges(t) ++ inEdges(t)).distinct.sortBy(sortKey)

    /** Hop-bounded BFS over the schema graph (graph.py schema_neighbors).
      * Defaults to ANY — "what is adjacent to person in the schema" almost
      * never means "only where person is the source".
      */
    def schemaNeighbors(vertexType: String, hops: Int = 1,
        direction: Direction = Direction.Any,
        edgeRelations: Option[Set[Option[String]]] = None): SchemaNeighborhood = {
      if (!vertexTypes(vertexType))
        throw new NoSuchElementException(
          s"Unknown vertex type '$vertexType'; declared: ${vertexTypes.toSeq.sorted}")
      require(hops >= 0, s"hops must be >= 0, got $hops")
      var distances = Map(vertexType -> 0)
      var used = Set.empty[EdgeId]
      val frontier = scala.collection.mutable.Queue((vertexType, 0))
      while (frontier.nonEmpty) {
        val (current, depth) = frontier.dequeue()
        if (depth < hops) incident(current).foreach { k =>
          val rel: Option[String] =
            if (byKey(k).relationDeclared) Some(k.relation) else None
          if (edgeRelations.forall(_.contains(rel)))
            traversable(k, current, direction).foreach { far =>
              used += k
              if (!distances.contains(far)) {
                distances += far -> (depth + 1)
                frontier.enqueue((far, depth + 1))
              }
            }
        }
      }
      SchemaNeighborhood(vertexType, hops, direction, distances,
        used.toSeq.sortBy(sortKey))
    }

    /** Simple paths a→b, shortest first (graph.py relations_between):
      * bounded BFS enumeration, no vertex repeats within a path except
      * closing at the target — which is what makes relationsBetween(a, a)
      * return self-loops and cycles rather than nothing.
      */
    def relationsBetween(a: String, b: String, maxLen: Int = 3,
        maxPaths: Int = 20,
        direction: Direction = Direction.Any): Seq[SchemaPath] = {
      Seq(a, b).foreach(n => if (!vertexTypes(n))
        throw new NoSuchElementException(
          s"Unknown vertex type '$n'; declared: ${vertexTypes.toSeq.sorted}"))
      if (maxLen < 1 || maxPaths < 1) return Nil
      val found = scala.collection.mutable.ArrayBuffer.empty[SchemaPath]
      val queue = scala.collection.mutable.Queue((a, Seq(a), Seq.empty[EdgeId]))
      while (queue.nonEmpty && found.size < maxPaths) {
        val (current, vs, es) = queue.dequeue()
        if (es.size < maxLen) {
          val it = incident(current).iterator
          while (it.hasNext && found.size < maxPaths) {
            val k = it.next()
            traversable(k, current, direction).foreach { far =>
              if (!vs.contains(far) || far == b) {
                if (far == b) found += SchemaPath(vs :+ far, es :+ k)
                else queue.enqueue((far, vs :+ far, es :+ k))
              }
            }
          }
        }
      }
      // (length, edge-key sequence) lexicographic — rendered to a single
      // sortable string with sub-printable separators
      found.toSeq.sortBy { p =>
        (p.length, p.edges.map { k =>
          val t = sortKey(k); s"${t._1} ${t._2} ${t._3}"
        }.mkString(""))
      }.take(maxPaths)
    }
  }

  // -------------------------------------------------------------- ranking

  /** Relative usefulness per identity mode (rank.py:22-28): a blank vertex
    * has no natural key to filter on, so it ranks last by design.
    */
  val IdentityModeStrength: Map[String, Double] =
    Map("natural" -> 1.0, "hash" -> 0.75, "assigned" -> 0.5, "blank" -> 0.1)

  final case class RankingWeights(
      hopDecay: Double = 0.55,
      degree: Double = 0.20,
      identity: Double = 0.15,
      properties: Double = 0.10,
      indexed: Double = 0.10)

  final case class VertexSignals(
      name: String, hopDistance: Option[Int], degree: Int,
      identityMode: String, propertyCount: Int,
      hasSecondaryIndex: Boolean, score: Double) {
    def dict: Map[String, Any] = {
      var m: Map[String, Any] = Map("name" -> name, "degree" -> degree,
        "identity_mode" -> identityMode, "property_count" -> propertyCount,
        "has_secondary_index" -> hasSecondaryIndex, "score" -> score)
      hopDistance.foreach(h => m += "hop_distance" -> h)
      m
    }
  }

  /** Rank every vertex type, highest score first, ties by name ascending
    * (rank.py score_vertices — the float arithmetic replays the reference
    * operation-for-operation so scores compare bit-exactly).
    */
  def scoreVertices(graph: SchemaGraph, seeds: Seq[String] = Nil,
      weights: RankingWeights = RankingWeights(), maxHops: Int = 3,
      direction: graft.query.Direction = graft.query.Direction.Any): Seq[VertexSignals] = {
    var distances = Map.empty[String, Int]
    seeds.foreach { seed =>
      graph.schemaNeighbors(seed, hops = maxHops, direction = direction)
        .distances.foreach { case (n, d) =>
          if (!distances.get(n).exists(_ <= d)) distances += n -> d
        }
    }
    val degrees = graph.vertexTypes.map(n => n -> graph.degree(n)).toMap
    val maxDegree = if (degrees.isEmpty) 0 else degrees.values.max
    val propCounts = graph.vertexTypes
      .map(n => n -> propertyNames(graph.schema.vertex(n)).size).toMap
    val maxProps = if (propCounts.isEmpty) 0 else propCounts.values.max

    graph.vertexTypes.toSeq.sorted.map { name =>
      val v = graph.schema.vertex(name)
      val hop = if (seeds.nonEmpty) distances.get(name) else None
      val deg = degrees(name)
      val props = propCounts(name)
      val hasIndex = v.secondary.nonEmpty
      val mode = identityMode(v)
      val structural =
        weights.degree * (if (maxDegree != 0) deg.toDouble / maxDegree else 0.0) +
        weights.identity * IdentityModeStrength.getOrElse(mode, 0.5) +
        weights.properties * (if (maxProps != 0)
          math.log1p(props.toDouble) / math.log1p(maxProps.toDouble) else 0.0) +
        weights.indexed * (if (hasIndex) 1.0 else 0.0)
      val score =
        if (seeds.isEmpty) structural
        else hop match {
          case None    => 0.0
          case Some(h) => math.pow(weights.hopDecay, h.toDouble) + structural
        }
      VertexSignals(name, hop, deg, mode, props, hasIndex, score)
    }.sortBy(s => (-s.score, s.name))
  }

  // --------------------------------------------------------------- budget

  /** Caller-requested ceilings (budget.py Budget). */
  final case class Budget(
      maxElements: Option[Int] = Some(60),
      maxTokens: Option[Int] = Some(4000),
      maxPropertiesPerVertex: Option[Int] = None)

  final case class BudgetAccounting(
      requested: Budget, elementsUsed: Int, estimatedTokens: Int,
      serializedChars: Int, exhaustedBy: String)

  // ------------------------------------------------------------ subschema

  final case class ElidedVertex(name: String, reason: String, degree: Int,
      hopDistance: Option[Int], drillIn: String)
  final case class ElidedEdge(edgeId: EdgeId, reason: String)

  final case class ElisionReport(
      elidedVertices: Seq[ElidedVertex],
      elidedEdges: Seq[ElidedEdge],
      elidedProperties: Map[String, Seq[String]],
      budget: BudgetAccounting) {
    def truncated: Boolean =
      elidedVertices.nonEmpty || elidedEdges.nonEmpty || elidedProperties.nonEmpty
  }

  private def dropPropertiesFor(v: VertexDef, maxProps: Option[Int]): Seq[String] =
    maxProps match {
      case None => Nil
      case Some(cap) =>
        val protectedNames = protectedPropertyNames(v)
        var kept = propertyNames(v).count(protectedNames)
        val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
        propertyNames(v).filterNot(protectedNames).foreach { n =>
          if (kept < cap) kept += 1 else dropped += n
        }
        dropped.toSeq
    }

  /** Slice `schema` down to a budgeted neighbourhood around `seeds`
    * (subschema.py): ranked admission with measured per-element token
    * costs + the metadata/db-profile envelope, induced edges ordered by
    * (min endpoint rank, edge key), per-vertex property caps that never
    * touch identity-bearing fields, then a final measure-and-trim loop —
    * a budget that is exceeded by the payload it produced is not a budget.
    * Seeds are NEVER trimmed; if they alone blow the budget, the overrun
    * is reported rather than hidden.
    */
  def subschema(
      schema: GraphSchema,
      seeds: Seq[String],
      budget: Budget = Budget(),
      maxHops: Int = 3,
      weights: RankingWeights = RankingWeights(),
      direction: graft.query.Direction = graft.query.Direction.Any,
      metadata: Map[String, Any] = Map("name" -> "schema")
  ): (GraphSchema, ElisionReport) = {
    require(seeds.nonEmpty, "subschema requires at least one seed vertex type")
    val graph = new SchemaGraph(schema)
    val seedList = seeds.distinct
    seedList.foreach(s => if (!graph.vertexTypes(s))
      throw new NoSuchElementException(
        s"Unknown seed vertex type '$s'; declared: ${graph.vertexTypes.toSeq.sorted}"))
    val seedSet = seedList.toSet

    val ranked = scoreVertices(graph, seedList, weights, maxHops, direction)
    val signalsByName = ranked.map(s => s.name -> s).toMap

    val vertexCost = graph.vertexTypes.map(n =>
      n -> estimateTokens(vertexDict(schema.vertex(n)))).toMap
    val edgeCost = graph.edgeIds.map(k =>
      k -> estimateTokens(edgeDict(graph.edge(k)))).toMap
    // fixed envelope: counting only element costs would hand the caller a
    // payload larger than the ceiling they set (subschema.py:131-141)
    val envelopeCost = estimateTokens(Map(
      "metadata" -> metadata, "db_profile" -> dbProfileDict(schema)))

    var admitted = seedList
    var elementsUsed = admitted.size
    var tokensUsed = envelopeCost + admitted.map(vertexCost).sum
    var exhausted = "none"

    val candidates = ranked.iterator
      .filterNot(s => seedSet(s.name)).filter(_.hopDistance.isDefined)
    var stop = false
    candidates.foreach { s =>
      if (!stop) {
        if (budget.maxElements.exists(elementsUsed + 1 > _)) {
          exhausted = "elements"; stop = true
        } else if (budget.maxTokens.exists(tokensUsed + vertexCost(s.name) > _)) {
          exhausted = "tokens"; stop = true
        } else {
          admitted :+= s.name; elementsUsed += 1; tokensUsed += vertexCost(s.name)
        }
      }
    }

    val admittedSet = admitted.toSet
    val rankPos = ranked.zipWithIndex.map { case (s, i) => s.name -> i }.toMap
    val candidateEdges = graph.edgeIds
      .filter(k => admittedSet(k.source) && admittedSet(k.target))
      .sortBy(k => (math.min(rankPos(k.source), rankPos(k.target)),
        edgeSortKey(k, graph.edge(k).relationDeclared)))

    var admittedEdges = Seq.empty[EdgeId]
    stop = false
    candidateEdges.foreach { k =>
      if (!stop) {
        if (budget.maxElements.exists(elementsUsed + 1 > _)) {
          exhausted = "elements"; stop = true
        } else if (budget.maxTokens.exists(tokensUsed + edgeCost(k) > _)) {
          exhausted = "tokens"; stop = true
        } else { admittedEdges :+= k; elementsUsed += 1; tokensUsed += edgeCost(k) }
      }
    }

    val dropProperties: Map[String, Set[String]] = admitted.flatMap { n =>
      val dropped = dropPropertiesFor(schema.vertex(n), budget.maxPropertiesPerVertex)
      if (dropped.nonEmpty) Some(n -> dropped.toSet) else None
    }.toMap

    // measure the assembled slice and trim until the ceiling actually
    // holds — least valuable first: edges, then lowest-ranked non-seeds
    var trimEdges = admittedEdges
    var trimVertices = admitted.filterNot(seedSet)
    var sliced: GraphSchema = null
    var payload: Map[String, Any] = null
    var estimated = 0
    var done = false
    while (!done) {
      val keepV = (seedSet ++ trimVertices).toSet
      val keepE = trimEdges.toSet
      val vs = schema.vertices.filter(v => keepV(v.name))
      val es = schema.edges.filter(e =>
        keepE(e.key) && keepV(e.source) && keepV(e.target))
      sliced = GraphSchema(vs, es)
      payload = schemaDict(sliced, metadata, dropProperties)
      estimated = estimateTokens(payload)
      if (budget.maxTokens.forall(estimated <= _)) done = true
      else if (trimEdges.nonEmpty) { trimEdges = trimEdges.init; exhausted = "tokens" }
      else if (trimVertices.nonEmpty) { trimVertices = trimVertices.init; exhausted = "tokens" }
      else done = true
    }

    val survivingV = sliced.vertices.map(_.name).toSet
    val survivingE = sliced.edges.map(_.key).toSet
    val accounting = BudgetAccounting(budget,
      elementsUsed = survivingV.size + survivingE.size,
      estimatedTokens = estimateTokens(payload),
      serializedChars = serializeCompact(payload).length,
      exhaustedBy = exhausted)

    val elidedV = (graph.vertexTypes -- survivingV).toSeq.sorted.map { n =>
      val hop = signalsByName.get(n).flatMap(_.hopDistance)
      ElidedVertex(n, if (hop.isEmpty) "unreachable" else "budget",
        graph.degree(n), hop, s"subschema(seeds=['$n'])")
    }
    val elidedE = graph.edgeIds.filterNot(survivingE)
      .map { k =>
        val endpointsPresent = survivingV(k.source) && survivingV(k.target)
        ElidedEdge(k, if (endpointsPresent) "budget" else "endpoint_elided")
      }
    (sliced, ElisionReport(elidedV, elidedE,
      dropProperties.view.filterKeys(survivingV).toMap
        .map { case (k, v) => k -> v.toSeq.sorted },
      accounting))
  }

  // ------------------------------------------------------------------ card

  final case class EntryPoint(name: String, identity: Seq[String],
      identityMode: String, secondaryIdentities: Seq[String],
      indexedFields: Seq[Seq[String]]) {
    def dict: Map[String, Any] = {
      var m: Map[String, Any] = Map("name" -> name, "identity" -> identity,
        "identity_mode" -> identityMode)
      if (secondaryIdentities.nonEmpty) m += "secondary_identities" -> secondaryIdentities
      if (indexedFields.nonEmpty) m += "indexed_fields" -> indexedFields
      m
    }
  }

  final case class SchemaCard(
      name: String, version: Option[String], dbFlavor: String,
      vertexCount: Int, edgeCount: Int, totalPropertyCount: Int,
      hubTypes: Seq[VertexSignals], entryPoints: Seq[EntryPoint],
      identityModes: Map[String, Int], isolatedTypes: Seq[String],
      isolatedTypeCount: Int, relationVocabulary: Seq[String],
      relationCount: Int, estimatedTokens: Int) {
    def dict: Map[String, Any] = {
      var m: Map[String, Any] = Map(
        "name" -> name, "db_flavor" -> dbFlavor,
        "vertex_count" -> vertexCount, "edge_count" -> edgeCount,
        "total_property_count" -> totalPropertyCount,
        "estimated_tokens" -> estimatedTokens)
      version.foreach(v => m += "version" -> v)
      if (hubTypes.nonEmpty) m += "hub_types" -> hubTypes.map(_.dict)
      if (entryPoints.nonEmpty) m += "entry_points" -> entryPoints.map(_.dict)
      if (identityModes.nonEmpty) m += "identity_modes" -> identityModes
      if (isolatedTypes.nonEmpty) m += "isolated_types" -> isolatedTypes
      if (isolatedTypeCount != 0) m += "isolated_type_count" -> isolatedTypeCount
      if (relationVocabulary.nonEmpty) m += "relation_vocabulary" -> relationVocabulary
      if (relationCount != 0) m += "relation_count" -> relationCount
      m
    }
  }

  /** Bounded orientation card (card.py build_card): every list is bounded
    * with a total count alongside — a card whose size grows with the
    * schema is the problem this surface exists to solve.
    */
  def buildCard(schema: GraphSchema, topN: Int = 10, maxNames: Int = 25,
      name: String = "schema", version: Option[String] = None,
      dbFlavor: String = "arango"): SchemaCard = {
    val graph = new SchemaGraph(schema)
    val ranked = scoreVertices(graph)
    val isolated = graph.isolatedTypes
    val relations = graph.relationVocabulary
    val modes = graph.vertexTypes.toSeq
      .groupBy(n => identityMode(schema.vertex(n)))
      .map { case (m, xs) => m -> xs.size }

    val entryPoints = scala.collection.mutable.ArrayBuffer.empty[EntryPoint]
    ranked.iterator.takeWhile(_ => entryPoints.size < topN).foreach { s =>
      val v = schema.vertex(s.name)
      val hasIndexes = v.secondary.nonEmpty
      // a blank type has no natural key and nothing to filter on
      val skip = (identityMode(v) == "blank" && !hasIndexes) ||
        (idColumnsOf(v).isEmpty && !hasIndexes)
      if (!skip && entryPoints.size < topN)
        entryPoints += EntryPoint(s.name, idColumnsOf(v), identityMode(v),
          v.secondary.map(_.name), v.secondary.map(_.fields))
    }

    val card0 = SchemaCard(name, version, dbFlavor,
      vertexCount = graph.vertexTypes.size, edgeCount = graph.edgeIds.size,
      totalPropertyCount = graph.vertexTypes.toSeq
        .map(n => propertyNames(schema.vertex(n)).size).sum,
      hubTypes = ranked.take(topN), entryPoints = entryPoints.toSeq,
      identityModes = modes, isolatedTypes = isolated.take(maxNames),
      isolatedTypeCount = isolated.size,
      relationVocabulary = relations.take(maxNames),
      relationCount = relations.size, estimatedTokens = 0)
    card0.copy(estimatedTokens = estimateTokens(card0.dict))
  }

  /** Compact one-line-per-type schema summary (the CLI's prompt/UI text
    * rendering — graft's own face; the reference-parity card is
    * [[buildCard]]).
    */
  def schemaCardText(schema: GraphSchema): String = {
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
