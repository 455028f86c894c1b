package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Throwaway profiling harness: job count + per-job wall time for one
  * battery query (default q_traverse_2hop) after fixture prewarm.
  */
object TraverseProfile {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q_traverse_2hop")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.GraftQueries.prewarmFixtures(spark, sfDir)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(),
          Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.get(e.jobId)
        if (s != null) jobs.add((e.jobId, (System.nanoTime() - s._1) / 1e9,
          Option(s._2).getOrElse("").take(90)))
      }
    })
    val t0 = System.nanoTime()
    graft.GraftQueries.all(q)(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val js = jobs.asScala.toSeq.sortBy(_._1)
    println(f"== $q: $total%.2f s, ${js.size} jobs ==")
    js.foreach { case (id, sec, desc) => println(f"job $id%3d  $sec%7.3f s  $desc") }
    spark.stop()
  }
}
