package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.infer.CrossResourceIdentity
import graft.infer.CrossResourceIdentity.FsField

/** SCD2 run assembly, c-TF-IDF ranking, and Fellegi–Sunter weights. */
class Scd2AndLinkageSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("scd2History collapses runs and links validity intervals") {
    val obs = Seq(
      (1L, "A", ts("2024-01-01"), 1L),
      (1L, "A", ts("2024-01-05"), 2L), // same run
      (1L, "B", ts("2024-02-01"), 3L), // change
      (1L, "A", ts("2024-03-01"), 4L), // change back
      (2L, "X", ts("2024-01-02"), 5L)
    ).toDF("k", "v", "t", "tie")
    val hist = Events.scd2History(obs, "k", "t", "v", "tie")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(hist.toSeq == Seq(
      (1L, "A", ts("2024-01-01"), Some(ts("2024-02-01"))),
      (1L, "B", ts("2024-02-01"), Some(ts("2024-03-01"))),
      (1L, "A", ts("2024-03-01"), None),
      (2L, "X", ts("2024-01-02"), None)))
  }

  test("scd2History same-timestamp conflicts resolve by the tie column") {
    val obs = Seq(
      (1L, "B", ts("2024-01-01"), 2L),
      (1L, "A", ts("2024-01-01"), 1L)
    ).toDF("k", "v", "t", "tie")
    val hist = Events.scd2History(obs, "k", "t", "v", "tie")
      .orderBy("valid_from", "v").collect().map(_.getString(1))
    assert(hist.toSeq == Seq("A", "B")) // tie 1 first → run A then B
  }

  test("classTfidf surfaces class-exclusive terms above shared ones") {
    val docs = Seq(
      ("news", "alpha alpha shared"),
      ("news", "alpha shared"),
      ("blog", "beta beta shared"),
      ("blog", "beta shared")
    ).toDF("src", "text")
    val top = Corpus.classTfidf(docs, "text", "src", k = 1)
      .select("class", "term").as[(String, String)].collect().toMap
    assert(top == Map("news" -> "alpha", "blog" -> "beta"))
  }

  test("fellegiSunter weights are the driver-side micro-nat logs") {
    val f = FsField("x", lit(true), m = 0.9, u = 0.3)
    assert(f.wAgree == math.round(math.log(3.0) * 1e6))
    assert(f.wDisagree == math.round(math.log(0.1 / 0.7) * 1e6))
    val pairs = Seq((1L, 2L, true), (1L, 3L, false)).toDF("id_a", "id_b", "ok")
    val scored = CrossResourceIdentity.fellegiSunterScore(pairs,
      Seq(FsField("x", col("ok"), 0.9, 0.3)),
      matchThresholdMicro = 1000000L, possibleThresholdMicro = 0L)
      .select("id_b", "fs_micro", "fs_class")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(scored == Set(
      (2L, f.wAgree, "match"),
      (3L, f.wDisagree, "non_match")))
  }
}
