package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Phase-level timing for the dedup-clusters path (local profiling only). */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      Console.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").where(col("doc_id") < 200)
    time("docs.count")(docs.count())
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 4, minSim = 0.2)
    time("pairs.count (pipeline)")(pairs.count())
    time("pairs.count again")(pairs.count())
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = time("edges persist+count") {
      val e = pairs.select(explode(array(
        struct(col("id_a").as("_src"), col("id_b").as("_dst")),
        struct(col("id_b").as("_src"), col("id_a").as("_dst")))).as("_e"))
        .select(col("_e._src").as("_src"), col("_e._dst").as("_dst"))
        .distinct().persist(lvl)
      e.count(); e
    }
    val labels = time("labels checkpoint") {
      docs.select(col("doc_id").as("_id")).distinct()
        .withColumn("component", col("_id")).localCheckpoint(true)
    }
    val neighborMin = edges
      .join(labels.withColumnsRenamed(Map("_id" -> "_src")), Seq("_src"))
      .groupBy(col("_dst").as("_id")).agg(min(col("component")).as("_nmin"))
    val propagated = labels.join(neighborMin, Seq("_id"), "left")
      .select(col("_id"), col("component").as("_prev"),
        least(col("component"), coalesce(col("_nmin"), col("component"))).as("component"))
    val mapping = propagated.select(col("_id").as("_m_id"), col("component").as("_m_comp"))
    val next = time("round join+checkpoint") {
      propagated.join(mapping, propagated("component") === mapping("_m_id"), "left")
        .select(col("_id"), col("_prev"),
          least(col("component"), coalesce(col("_m_comp"), col("component"))).as("component"))
        .localCheckpoint(true)
    }
    time("changed count")(next.where(col("component") =!= col("_prev")).limit(1).count())
    time("full cc call") {
      Dedup.connectedComponents(docs, "doc_id", pairs, "id_a", "id_b").count()
    }
    spark.stop()
  }
}
