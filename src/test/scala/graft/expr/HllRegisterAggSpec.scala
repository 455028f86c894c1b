package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Sketch

/** The register-vector aggregation path must be bit-identical to the
  * row-per-register layout it replaces.
  */
class HllRegisterAggSpec extends SparkSpec {

  test("vector path reproduces the row path's estimates exactly") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (s"g${i % 3}", s"v${i % 1200}"))
      .toDF("g", "v")
    // row layout
    val rowEst = Sketch.hllEstimate(
      Sketch.hllRegisters(df, Seq("g"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // vector layout: build per group, then estimate from packed stats
    val vec = Sketch.hllProject(df, "v")
      .groupBy("g")
      .agg(HllRegisterAgg.hllBuild(col("bucket"), col("_rho")).as("regs"))
    val vecEst = Sketch.estimateFromStats(
      vec.select(col("g"), HllRegisterAgg.hllStats(col("regs")).as("_st"))
        .select(col("g"), col("_st.s_present").as("_s_present"),
          col("_st.present").as("_present")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(vecEst == rowEst)
  }

  test("hllMerge unions register vectors like re-aggregating the raw values") {
    import spark.implicits._
    val a = (1 to 800).map(i => ("x", s"a$i")).toDF("g", "v")
    val b = (400 to 1200).map(i => ("x", s"a$i")).toDF("g", "v")
    def pack(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllProject(df, "v").groupBy("g")
        .agg(HllRegisterAgg.hllBuild(col("bucket"), col("_rho")).as("regs"))
    val merged = pack(a).unionByName(pack(b))
      .groupBy("g").agg(HllRegisterAgg.hllMerge(col("regs")).as("regs"))
      .select(HllRegisterAgg.hllStats(col("regs")).as("_st"))
      .select(col("_st.s_present"), col("_st.present"))
      .collect().head
    val direct = pack(a.unionByName(b))
      .select(HllRegisterAgg.hllStats(col("regs")).as("_st"))
      .select(col("_st.s_present"), col("_st.present"))
      .collect().head
    assert(merged == direct)
  }

  test("map-side partials survive repartitioning (order independence)") {
    import spark.implicits._
    val df = (1 to 3000).map(i => ("g", s"v$i")).toDF("g", "v")
    def stats(parts: Int) = Sketch.hllProject(df.repartition(parts), "v")
      .groupBy("g")
      .agg(HllRegisterAgg.hllBuild(col("bucket"), col("_rho")).as("regs"))
      .select(HllRegisterAgg.hllStats(col("regs")).as("_st"))
      .select(col("_st.s_present"), col("_st.present")).collect().head
    assert(stats(1) == stats(13))
  }
}
