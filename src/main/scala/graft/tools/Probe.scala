package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev scratch main for isolated timing probes (guide §1: measure the
  * component, not the guess). Edit freely between runs; not part of any
  * query path.
  */
object Probe {
  def timeIt[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(f"[probe] $tag: ${(System.nanoTime - t0) / 1e6}%.0f ms")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cost of re-reading a parquet relation (file listing + footer) per query
    (1 to 6).foreach { i =>
      timeIt(s"read.parquet lineitem $i")(
        spark.read.parquet(s"$sfDir/lineitem.parquet").schema)
      timeIt(s"read.parquet region $i")(
        spark.read.parquet(s"$sfDir/region.parquet").schema)
    }
    val liMemo = spark.read.parquet(s"$sfDir/lineitem.parquet")
    (1 to 3).foreach { i =>
      timeIt(s"memoized relation reuse $i")(liMemo.select("l_orderkey").schema)
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e = li.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    println("[probe] edges " + e.count() + " partitions " + e.rdd.getNumPartitions)
    val hubs0 = e.select(col("src").as("node")).distinct()
      .withColumn("hub", lit(1000000L)).localCheckpoint(true)
    (1 to 6).foreach { i =>
      var hubs = hubs0
      val araw = e.join(broadcast(hubs.withColumnRenamed("node", "src")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("hub").as("v"))
      val r = araw.persist(StorageLevel.MEMORY_AND_DISK)
      val total = timeIt(s"iter $i total-agg")(
        r.agg(sum(col("v")).as("t")).collect()(0).getLong(0))
      timeIt(s"iter $i checkpoint")(
        r.crossJoin(broadcast(spark.range(1).select(lit(total).as("t"))))
          .select(col("node"), expr("(v * 1000000) div t").as("hub"))
          .localCheckpoint(true))
      r.unpersist(false)
    }
    // same join WITHOUT the persist of raw (single consumer)
    (1 to 3).foreach { i =>
      timeIt(s"plain edge-join agg $i")(
        e.join(broadcast(hubs0.withColumnRenamed("node", "src")), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum("hub").as("v"))
          .write.format("noop").mode("overwrite").save())
    }
    // how much of it is the cached-scan itself?
    (1 to 3).foreach { i =>
      timeIt(s"cached scan only $i")(
        e.write.format("noop").mode("overwrite").save())
    }
    // agg without the join
    (1 to 3).foreach { i =>
      timeIt(s"scan+agg only $i")(
        e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("v"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
