package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model._
import graft.expr.FilterExpr
import graft.graph.GraphOutput

/** Query caps lattice (reference graflo/architecture/query/caps.py:23-92):
  * hard ceilings with `narrowed` semantics (query/models.py:81-121) — an
  * explicit over-ask raises, defaults clamp.
  */
final case class QueryCaps(
    maxHops: Int = 3,
    maxRows: Int = 1000,
    maxElements: Int = 5000,
    maxEdgeTypes: Int = 20,
    maxSeeds: Int = 10,
    defaultLimit: Int = 100,
    defaultEdgeLimit: Int = 1000, // reference db/traversal.py:36 DEFAULT_EDGE_LIMIT
    /** wall-clock budget per read query (reference HARD_CAPS 30 s timeout,
      * caps.py:30-92); <= 0 disables enforcement
      */
    timeoutSeconds: Int = 30
) {
  def narrowLimit(asked: Option[Int]): Int = asked match {
    case Some(n) if n > maxRows =>
      throw new IllegalArgumentException(s"limit $n exceeds cap $maxRows")
    case Some(n) => n
    case None    => defaultLimit
  }
  def narrowHops(asked: Int): Int =
    if (asked > maxHops) throw new IllegalArgumentException(s"hops $asked exceeds cap $maxHops")
    else asked
}

object QueryCaps { val Hard = QueryCaps() }

/** A read query exceeded `QueryCaps.timeoutSeconds` and its Spark jobs were
  * cancelled (the reference raises on the DB driver's timeout instead).
  */
final class QueryTimeoutException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Typed read-queries (reference graflo/architecture/query/models.py:31-283). */
final case class NodeQuery(
    vertex: String,
    filters: Option[FilterExpr] = None,
    returnFields: Seq[String] = Nil,
    limit: Option[Int] = None
)

sealed trait Direction
object Direction { case object Out extends Direction; case object In extends Direction; case object Any extends Direction }

final case class NeighborQuery(
    vertex: String,
    anchorFilter: FilterExpr, // anchor by id or field-map (db/traversal.py:268-287)
    hops: Int = 1,
    direction: Direction = Direction.Any,
    relations: Seq[String] = Nil, // edge-relation allow-list; empty = all
    filters: Option[FilterExpr] = None,
    edgeLimit: Option[Int] = None
)

final case class TraverseQuery(
    seeds: Seq[(String, FilterExpr)], // (vertexType, anchorFilter)
    hops: Int = 1,
    direction: Direction = Direction.Any,
    relations: Seq[String] = Nil
)

final case class AggregateQuery(
    vertex: String,
    agg: String, // COUNT | MAX | MIN | AVERAGE | SORTED_UNIQUE (graflo/onto.py:120-137)
    aggregatedField: Option[String] = None,
    discriminant: Option[String] = None, // group-by (COUNT only, models.py:252-283)
    filters: Option[FilterExpr] = None
)

/** Read-side engine over stored/derived graph DataFrames.
  *
  * `vertices`/`edgesOf` abstract the physical source (native store, or an
  * in-memory [[GraphOutput]]) — the analogue of the reference's
  * backend-neutral `Connection` (graflo/db/conn.py), except every backend
  * here is a DataFrame so one implementation serves all.
  */
final class GraphReader(
    schema: GraphSchema,
    vertexDf: String => DataFrame,
    edgeDf: EdgeKey => Option[DataFrame],
    caps: QueryCaps = QueryCaps.Hard
) {

  def node(q: NodeQuery): DataFrame = {
    var df = vertexDf(q.vertex)
    q.filters.foreach(f => df = df.where(FilterExpr.compile(f)))
    if (q.returnFields.nonEmpty) df = df.select(q.returnFields.map(col): _*)
    val keyCols = schema.vertex(q.vertex).idColumns.filter(df.columns.contains)
    val ordered = if (keyCols.nonEmpty) df.orderBy(keyCols.map(col): _*) else df
    ordered.limit(caps.narrowLimit(q.limit))
  }

  /** Per-collection aggregation (reference Connection.aggregate,
    * graflo/db/conn.py:612-636): COUNT with optional discriminant; other
    * aggs need `aggregatedField`.
    */
  def aggregate(q: AggregateQuery): DataFrame = {
    val aggName = q.agg.toUpperCase
    if (q.discriminant.isDefined && aggName != "COUNT")
      throw new IllegalArgumentException(
        "group_by supported with COUNT only (reference models.py:252-283)")
    if (aggName != "COUNT" && q.aggregatedField.isEmpty)
      throw new IllegalArgumentException(s"$aggName requires aggregated_field")
    var df = vertexDf(q.vertex)
    q.filters.foreach(f => df = df.where(FilterExpr.compile(f)))
    val fn = q.agg.toUpperCase match {
      case "COUNT"         => count(lit(1))
      case "MAX"           => max(col(q.aggregatedField.get))
      case "MIN"           => min(col(q.aggregatedField.get))
      case "AVERAGE"       => avg(col(q.aggregatedField.get))
      case "SORTED_UNIQUE" => sort_array(collect_set(col(q.aggregatedField.get)))
      case other           => throw new IllegalArgumentException(s"unknown aggregation: $other")
    }
    q.discriminant match {
      case Some(d) =>
        require(q.agg.equalsIgnoreCase("COUNT"),
          "group_by supported with COUNT only (reference models.py:252-283)")
        df.groupBy(col(d)).agg(fn.as("_value"))
      case None => df.agg(fn.as("_value"))
    }
  }

  /** k-hop BFS neighborhood (reference bfs_neighbors,
    * graflo/db/traversal.py:113-243): frontier expansion over the declared
    * incident edges with direction checks, visited-set anti-joins, edge-limit
    * truncation, far-endpoint hydration.
    *
    * Scale note: each hop is a set of keyed equi-joins frontier⋈edges; the
    * frontier is usually tiny → Spark broadcasts it; the visited anti-join is
    * a broadcast anti-join on the id columns. No collect of edge data to the
    * driver — only the loop *structure* is driver-side (bounded by
    * caps.maxHops ≤ 3).
    */
  def neighbors(q: NeighborQuery): GraphOutput = {
    val hops = caps.narrowHops(q.hops)
    val anchor = vertexDf(q.vertex).where(FilterExpr.compile(q.anchorFilter))
    // q.filters are EDGE filters, constraining which edges are traversed —
    // the reference passes them into the per-hop edge fetch
    // (db/traversal.py:121-204), not onto the result vertices
    withTimeout(anchor.sparkSession) {
      val (out, hopFrames) = traverse(Seq(q.vertex -> anchor), hops, q.direction,
        q.relations, q.edgeLimit.getOrElse(caps.defaultEdgeLimit), q.filters)
      finish(out, hopFrames)
    }
  }

  /** Multi-seed reachability (reference TraverseQuery, db/conn.py:791-830). */
  def traverseQuery(q: TraverseQuery): GraphOutput = {
    require(q.seeds.size <= caps.maxSeeds, s"seeds exceed cap ${caps.maxSeeds}")
    if (q.seeds.isEmpty) return GraphOutput.empty
    val seeds = q.seeds.map { case (t, f) => t -> vertexDf(t).where(FilterExpr.compile(f)) }
    withTimeout(seeds.head._2.sparkSession) {
      val (out, hopFrames) = traverse(seeds, caps.narrowHops(q.hops), q.direction,
        q.relations, caps.defaultEdgeLimit)
      finish(out, hopFrames)
    }
  }

  /** Enforce `caps.timeoutSeconds` around the actions `body` triggers
    * (reference HARD_CAPS query timeout, caps.py:30-92): the body's Spark
    * jobs run under a dedicated job group; a daemon timer cancels the group
    * when the budget elapses, and the interrupted action surfaces as
    * [[QueryTimeoutException]]. Thread-safe: the group tag is per-call and
    * `setJobGroup` is thread-local to the submitting thread.
    */
  private def withTimeout[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    if (caps.timeoutSeconds <= 0) return body
    val sc = spark.sparkContext
    val group = s"graft-query-${java.util.UUID.randomUUID()}"
    sc.setJobGroup(group, "graft read query (capped)", interruptOnCancel = true)
    val timer = new java.util.Timer("graft-query-timeout", true)
    @volatile var fired = false
    // cancelJobGroup only kills jobs LIVE at fire time; a multi-job query
    // can be between jobs when the timer fires. Re-firing every second
    // keeps cancelling whatever the group submits next, and the post-hoc
    // check below enforces the cap even if a final job slipped through.
    timer.schedule(new java.util.TimerTask {
      def run(): Unit = { fired = true; sc.cancelJobGroup(group) }
    }, caps.timeoutSeconds * 1000L, 1000L)
    try {
      val result = body
      if (fired) throw new QueryTimeoutException(
        s"query exceeded ${caps.timeoutSeconds}s cap")
      result
    } catch {
      case t: QueryTimeoutException => throw t
      case e: Throwable if fired =>
        // ambiguous: the failure may be the cancellation or an unrelated
        // error surfacing after the deadline — keep the original as cause
        throw new QueryTimeoutException(
          s"query exceeded ${caps.timeoutSeconds}s cap; jobs cancelled", e)
    } finally { timer.cancel(); sc.clearJobGroup() }
  }

  /** Enforce the element cap (materializing + caching the result), then
    * release the intermediate hop frames — the result frames are cached, so
    * downstream actions don't recompute through the released limits.
    */
  private def finish(out: GraphOutput, hopFrames: Seq[DataFrame]): GraphOutput =
    try enforceElementCap(out)
    finally hopFrames.foreach(_.unpersist()) // also on the cap-exceeded path

  /** `max_elements` hard cap (caps.py:23-92): total vertices + edges in the
    * result. Counting is bounded — per-hop edge limits already cap the
    * result size near the ceiling.
    */
  private def enforceElementCap(g: GraphOutput): GraphOutput = {
    val cached = g.cache()
    // one job for the whole cap check (GraphOutput.materialize is the one
    // union-of-1-projections counting idiom)
    val total = cached.materialize()
    if (total > caps.maxElements)
      throw new IllegalStateException(
        s"traversal result $total elements exceeds cap ${caps.maxElements}")
    cached
  }

  /** Bounded-set localization: BFS frontier / visited id-sets are small by
    * the caps lattice (maxElements ≤ 5000, per-expand edge limits), and the
    * reference ships exactly these id lists inside its backend queries
    * (db/traversal.py id-list interpolation). Collecting a small id-set to a
    * LocalRelation resets the logical-plan depth each hop — otherwise every
    * hop's joins re-analyze (and re-broadcast) the whole anchor→hopN lineage,
    * and the job count grows quadratically with hops. Sets larger than
    * `LocalizeCap` stay distributed (the scale path: broadcast joins).
    */
  private val LocalizeCap = 100000

  private def localize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rows = df.limit(LocalizeCap + 1).collect()
    if (rows.length > LocalizeCap) df
    else spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }

  private def traverse(
      seeds: Seq[(String, DataFrame)],
      hops: Int,
      direction: Direction,
      relations: Seq[String],
      edgeLimit: Int,
      edgeFilter: Option[FilterExpr] = None
  ): (GraphOutput, Seq[DataFrame]) = {
    // visited / frontier are Map[vertexType -> DataFrame of id columns]
    def idCols(t: String) = schema.vertex(t).idColumns
    var visited: Map[String, DataFrame] =
      seeds.groupBy(_._1).map { case (t, ds) =>
        t -> localize(
          ds.map(_._2.select(idCols(t).map(col): _*)).reduceLeft(_.union(_)).distinct())
      }
    var frontier = visited
    var collectedEdges = Map.empty[EdgeKey, DataFrame]
    val hopFrames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    val allowedEdges = schema.edges
      .filter(e => relations.isEmpty || relations.contains(e.relation))
    require(allowedEdges.size <= caps.maxEdgeTypes, s"edge types exceed cap ${caps.maxEdgeTypes}")

    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    for (_ <- 1 to hops if frontier.nonEmpty) {
      var nextFrontier = Map.empty[String, DataFrame]
      var newEdges = Map.empty[EdgeKey, DataFrame]
      val hopJoined = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

      def expand(e: EdgeDef, fromType: String, fromPrefix: String, toType: String, toPrefix: String): Unit =
        frontier.get(fromType).zip(edgeDf(e.key)).foreach { case (front, edf0) =>
          // edge filters constrain which edges are traversed, as in the
          // reference's _fetch_edge_rows (db/traversal.py:121-204); a filter
          // naming fields this edge type lacks doesn't apply to it
          val edf = edgeFilter match {
            case Some(f) if FilterExpr.fields(f).subsetOf(edf0.columns.toSet) =>
              edf0.where(FilterExpr.compile(f))
            case _ => edf0
          }
          val keys = idCols(fromType)
          // truncation beyond edgeLimit keeps an arbitrary subset — matching
          // the reference, whose DEFAULT_EDGE_LIMIT truncation order is
          // backend-dependent (db/traversal.py:36). The limited frame is
          // persisted ONCE and both the edge set and the frontier derive
          // from it: two independent materializations of an unordered limit
          // could pick different subsets (dangling endpoints).
          // GlobalLimit funnels through ONE partition — skip it entirely
          // when the caller disabled the cap (huge sentinel), so uncapped
          // traversals keep their parallelism.
          val expanded = edf.join(
            broadcast(front.withColumnsRenamed(keys.map(k => k -> s"$fromPrefix$k").toMap)),
            keys.map(k => s"$fromPrefix$k"), "inner")
          val joined = (if (edgeLimit >= Int.MaxValue / 2) expanded
            else expanded.limit(edgeLimit)).persist(lvl)
          hopFrames += joined
          hopJoined += joined
          newEdges += e.key -> newEdges.get(e.key).map(_.unionByName(joined, true)).getOrElse(joined)
          val farIds = joined.select(idCols(toType).map(k => col(s"$toPrefix$k").as(k)): _*).distinct()
          val unseen = visited.get(toType).map(v => farIds.join(v, idCols(toType), "left_anti")).getOrElse(farIds)
          nextFrontier += toType -> nextFrontier.get(toType).map(_.union(unseen).distinct()).getOrElse(unseen)
        }

      allowedEdges.foreach { e =>
        // OUT follows src→dst; IN follows dst→src; undirected edges are
        // followed both ways regardless of direction (models.py:142-198)
        val followOut = direction != Direction.In || !e.directed
        val followIn  = direction != Direction.Out || !e.directed
        if (followOut) expand(e, e.source, "src_", e.target, "dst_")
        if (followIn)  expand(e, e.target, "dst_", e.source, "src_")
      }

      // materialize every branch's persisted frame in ONE job (a union of
      // 1-projections): the branches run in parallel inside a single job
      // DAG instead of serially inside the per-type localize collects —
      // per-hop wall time becomes max(branch) + one job overhead rather
      // than sum(branch).
      if (hopJoined.nonEmpty)
        hopJoined.map(_.select(lit(1).as("one"))).reduce(_.union(_)).count(): Unit

      // localize each hop's small frontier set (≤ edgeLimit rows per
      // expand): later hops, hydration, and the element-cap count reuse it
      // with a depth-0 plan. A frontier above the cap stays distributed and
      // is persisted instead (re-evaluation through the limit would
      // otherwise pick a different subset).
      nextFrontier = nextFrontier.map { case (t, df) =>
        // persist BEFORE probing: an over-cap frontier's probe partitions
        // land in the cache and its consumers reuse them, instead of the
        // probe evaluating the un-persisted plan and every consumer
        // recomputing it from scratch
        val p = df.persist(lvl)
        val loc = localize(p)
        if (loc eq p) { hopFrames += p; t -> p }
        else { p.unpersist(): Unit; t -> loc }
      }

      collectedEdges = (collectedEdges.keySet ++ newEdges.keySet).map { k =>
        k -> Seq(collectedEdges.get(k), newEdges.get(k)).flatten
          .reduceLeft(_.unionByName(_, true)).dropDuplicates()
      }.toMap
      visited = (visited.keySet ++ nextFrontier.keySet).map { t =>
        t -> Seq(visited.get(t), nextFrontier.get(t)).flatten.reduceLeft(_.union(_)).distinct()
      }.toMap
      frontier = nextFrontier
    }

    // far-endpoint hydration (traversal.py far-endpoint fetch): project the
    // visited id sets back onto the full vertex docs via semi-joins; a type
    // reachable through edges but with no stored collection hydrates to its
    // bare ids (same degradation as the reference's partial graphs)
    val hydrated = visited.map { case (t, ids) =>
      val full =
        try Some(vertexDf(t))
        catch { case _: NoSuchElementException => None } // collection absent
      // any OTHER failure (corrupt data, schema drift) must propagate — a
      // silent id-only fallback would turn real errors into wrong results
      t -> full.map(v => v.join(ids, idCols(t), "left_semi")).getOrElse(ids)
    }
    (GraphOutput(hydrated, collectedEdges), hopFrames.toSeq)
  }
}
