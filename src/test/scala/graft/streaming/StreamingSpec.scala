package graft.streaming

import graft.SparkSpec
import graft.model._
import graft.pipeline._
import graft.store.GraphStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private val schema = GraphSchema(
    vertices = Seq(VertexDef("u", Seq(FieldDef("name")), Identity.Natural(Seq("id")))))
  private val resource = ResourceDef("r", Seq(VertexStep("u")))

  test("streaming ingest: micro-batches run the pipeline and upsert idempotently") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    val store = new GraphStore(
      Files.createTempDirectory("graft-stream").toString, schema, spark)
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF().toDF("id", "name")
    val cp = Files.createTempDirectory("graft-cp").toString

    mem.addData((1L, "a"), (2L, "b"))
    val q1 = StreamIngest.ingestStream(schema, resource, src, store, cp)
    q1.awaitTermination(60000)
    assert(store.vertices("u").count() == 2)

    // second batch: update id=1, add id=3 → upsert merges
    mem.addData((1L, "a2"), (3L, "c"))
    val q2 = StreamIngest.ingestStream(schema, resource, src, store, cp)
    q2.awaitTermination(60000)
    val m = store.vertices("u").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("name")).toMap
    assert(m == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("streaming curation: quality filter + watermark dedup compose in one stream") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    val sw = "the results of this and that have come up with more to show"
    def doc(i: Int) = sw + " " + (1 to 45).map(j => s"word${i * 50 + j}").mkString(" ")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val src = mem.toDF().toDF("doc_id", "text", "ts")
    // per-row rules apply to a stream exactly as to a batch (narrow column
    // math); dedup is the stateful watermark operator
    val curated = StreamIngest.dedupStream(
      src.where(graft.ext.TextAnalysis.gopherRules(col("text")).getField("pass")),
      Seq("doc_id"), "ts", "1 hour")
    val out = Files.createTempDirectory("graft-scur").toString
    val cp = Files.createTempDirectory("graft-scur-cp").toString
    val t0 = new Timestamp(1700000000000L)
    mem.addData(
      (1L, doc(1), t0), (2L, doc(2), t0),
      (1L, doc(1), t0),            // redelivery: dropped by dedup
      (3L, "too short the of", t0)) // fails the word-count rule
    val q = curated.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("tumbling window aggregation with watermark over a stream") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val src = mem.toDF().toDF("ts", "value")
    mem.addData(
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), 4.0))
    val q = StreamIngest.tumblingCounts(src, "ts", "1 hour")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("tumbling_test").orderBy("ws").collect()
    assert(rows.map(_.getAs[Long]("cnt")).toSeq == Seq(2L, 1L))
    assert(rows.last.getAs[Double]("sum_value") == 4.0)
  }

  test("BoundedTopK aggregates over a stream: state-store round-trips the heap") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    // two micro-batches: the heap state must serialize between them and
    // batch 2's better rows must displace batch 1's
    mem.addData(("en", 0.3, 1L), ("en", 0.9, 2L), ("de", 0.5, 3L))
    val agg = mem.toDF().toDF("lang", "quality", "id")
      .groupBy($"lang")
      .agg(graft.expr.BoundedTopK.topKPairs(2, $"quality", $"id").as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_stream")
      .outputMode("update").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    mem.addData(("en", 0.7, 4L), ("en", 0.1, 5L))
    val q2 = agg.writeStream.format("memory").queryName("topk_stream2")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val rows = spark.table("topk_stream2").collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => p.getLong(1)).toSeq)
      .toMap
    // en: best two of {0.3→1, 0.9→2, 0.7→4, 0.1→5} = ids 2, 4
    assert(rows("en") == Seq(2L, 4L))
    assert(rows("de") == Seq(3L))
  }

  test("stream-stream interval join matches the batch result, append mode") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val clicks = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 11L, ts("2024-01-01 12:00:00")))
    val purchases = Seq(
      (1L, 20L, ts("2024-01-01 10:10:00")), // within 30 min of click 10
      (1L, 21L, ts("2024-01-01 11:00:00")), // outside the window
      (2L, 22L, ts("2024-01-01 12:29:00")), // within
      (3L, 23L, ts("2024-01-01 12:00:00"))) // no matching click key
    val memC = MemoryStream[(Long, Long, Timestamp)]
    val memP = MemoryStream[(Long, Long, Timestamp)]
    memC.addData(clicks: _*); memP.addData(purchases: _*)
    val joined = StreamIngest.intervalJoin(
      memC.toDF().toDF("user_id", "click_id", "click_ts"),
      memP.toDF().toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts", windowSec = 1800,
      watermark = Some("10 minutes"))
      .select($"click_id", $"purchase_id")
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("ssj_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical operator invoked on batch frames
    val batch = StreamIngest.intervalJoin(
      clicks.toDF("user_id", "click_id", "click_ts"),
      purchases.toDF("user_id", "purchase_id", "purchase_ts"),
      "user_id", "click_ts", "purchase_ts", windowSec = 1800)
      .select($"click_id", $"purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch)
    assert(got == Set((10L, 20L), (11L, 22L)))
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    import StreamIngest._
    val mem = MemoryStream[SessionEvent]
    mem.addData(
      SessionEvent(7L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      SessionEvent(7L, Timestamp.valueOf("2024-01-01 10:10:00"), 2.0),
      SessionEvent(7L, Timestamp.valueOf("2024-01-01 12:00:00"), 3.0)) // new session
    val out = sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L)
    // NO AvailableNow here: with event-time state timeouts the
    // MultiBatchExecutor can keep scheduling eviction batches, so
    // awaitTermination times out silently and the query LEAKS into later
    // suites (observed dying there with a planning NPE on the shared
    // session). processAllAvailable + stop is deterministic.
    val q = out.writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // first session (2 events, sum 3.0) closed by the 12:00 event
      val rows = spark.table("session_test").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Int]("n") == 2 && rows.head.getAs[Double]("sum") == 3.0)
    } finally q.stop()
  }

  test("streaming HLL registers equal the batch sketch over the same rows") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val regs = StreamIngest.hllRegisterStream(mem.toDF().toDF("v"), Nil, "v")
    val q = regs.writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    mem.addData((0 until 600).map(i => s"u$i"): _*)
    q.processAllAvailable()
    mem.addData((300 until 900).map(i => s"u$i"): _*) // overlap re-observes
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_regs")
    val est = graft.ext.Sketch.hllEstimate(streamed, Nil)
      .collect()(0).getDouble(0)
    val batch = graft.ext.Sketch.hllCounts(
      (0 until 900).map(i => s"u$i").toDF("v")
        .withColumn("g", lit(1)), Seq("g"), "v")
      .collect()(0).getDouble(1)
    assert(est == batch, s"stream=$est batch=$batch")
    // bounded state: at most 256 register rows no matter the stream length
    assert(streamed.count() <= 256)
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.ext.Multimodal

  private lazy val media = {
    import spark.implicits._
    Multimodal.pack(Seq((1L, "hello world"), (2L, "spark media bytes"))
      .toDF("id", "payload"), "id", "payload", "text/plain")
  }

  test("pack produces binary + typed metadata") {
    val r = media.orderBy("id").collect().head
    assert(r.getAs[Array[Byte]]("media").length == 11)
    val meta = r.getStruct(2)
    assert(meta.getAs[String]("media_type") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 11L)
  }

  test("feature extraction is deterministic, batched per partition") {
    val f1 = Multimodal.extractFeatures(media, "id", dim = 8).orderBy("id").collect()
    val f2 = Multimodal.extractFeatures(media, "id", dim = 8).orderBy("id").collect()
    assert(f1.head.getSeq[Float](1).length == 8)
    assert(f1.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
    // different payloads → different features
    assert(f1(0).getSeq[Float](1) != f1(1).getSeq[Float](1))
  }

  test("resize truncates the byte budget and rewrites metadata") {
    val r = Multimodal.resize(media, maxBytes = 5).orderBy("id").collect().head
    assert(r.getAs[Array[Byte]]("media").length == 5)
    assert(r.getStruct(2).getAs[Long]("n_bytes") == 5L)
  }

  test("frame sampling explodes n frames with byte slices") {
    val f = Multimodal.frameSample(media.where(col("id") === 2), "id", nFrames = 4)
    assert(f.count() == 4)
    assert(f.columns.contains("frame") && f.columns.contains("frame_idx"))
  }

  test("streaming SCD2 closed intervals equal the batch history's") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sq = spark.sqlContext
    import StreamIngest.Scd2Event
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val batch1 = Seq(
      Scd2Event(1L, ts(0), "A"), Scd2Event(1L, ts(5), "A"),
      Scd2Event(2L, ts(1), "X"))
    val batch2 = Seq(
      Scd2Event(1L, ts(10), "B"), // closes 1/A
      Scd2Event(2L, ts(12), "Y"), // closes 2/X
      Scd2Event(1L, ts(20), "A")) // closes 1/B
    val mem = MemoryStream[Scd2Event]
    val out = StreamIngest.scd2Stream(mem.toDS())
    val q = out.writeStream.format("memory").queryName("scd2_test")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("scd2_test")
        .select("key", "value", "validFromMs", "validToMs")
        .as[(Long, String, Long, Long)].collect().toSet
      // batch reference over the same rows: closed rows only
      val obs = (batch1 ++ batch2)
        .map(e => (e.key, e.value, e.ts, e.ts.getTime)).toDF("k", "v", "t", "tie")
      val closed = graft.ext.Events.scd2History(obs, "k", "t", "v", "tie")
        .where(col("valid_to").isNotNull)
        .select(col("k"), col("v"),
          unix_millis(col("valid_from")), unix_millis(col("valid_to")))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed == closed, s"stream=$streamed batch=$closed")
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("spikeStream equals batch spikeDetect over in-order bucket counts") {
    import spark.implicits._
    import graft.streaming.StreamIngest.{SpikeEvent, SpikeOut}
    implicit val sq = spark.sqlContext
    // raw events: key x calm 4 buckets then a burst; key y constant
    val raw = (0 until 4).map(b => ("x", b.toLong, 1L)) ++
      Seq(("x", 4L, 9L)) ++ // spike bucket
      Seq(("x", 7L, 1L)) ++ // gap: buckets 5, 6 are zero
      (0 until 6).map(b => ("y", b.toLong, 2L))
    val counts = raw.map { case (k, b, c) => SpikeEvent(k, b, c) }
    val mem = MemoryStream[SpikeEvent]
    val out = StreamIngest.spikeStream(mem.toDS(), stepSeconds = 10L,
      trail = 3, num = 2L, den = 1L)
    val q = out.writeStream.format("memory").queryName("spike_test")
      .outputMode("append").start()
    try {
      mem.addData(counts.filter(_.b <= 2): _*)
      q.processAllAvailable()
      mem.addData(counts.filter(_.b > 2): _*)
      q.processAllAvailable()
      val streamed = spark.table("spike_test")
        .as[SpikeOut].collect().map(o => (o.k, o.bucket_ts) -> o).toMap
      // batch reference: one raw event per (k, bucket) unit of count
      val rawEvents = raw.flatMap { case (k, b, c) =>
        (0L until c).map(i => (k, b * 10L * 1000000L + i))
      }.toDF("k", "us").withColumn("ts", timestamp_micros(col("us")))
      val batch = graft.ext.Events.spikeDetect(rawEvents, "k", "ts",
        stepSeconds = 10L, trail = 3, num = 2L, den = 1L)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (key, (cnt, tsum, spike)) =>
        val o = streamed(key)
        assert((o.cnt, o.trail_sum, o.spike) == ((cnt, tsum, spike)),
          s"$key stream=${(o.cnt, o.trail_sum, o.spike)} batch=${(cnt, tsum, spike)}")
      }
      assert(streamed(("x", 40L)).spike) // the burst bucket flags
    } finally q.stop()
  }

  test("cusumStream equals a batch fold with the same fixed target") {
    import spark.implicits._
    import graft.streaming.StreamIngest.{CusumEvent, CusumOut}
    implicit val sq = spark.sqlContext
    // key x: under-target run then recovery; key y: on-target with a gap
    val raw = Seq(("x", 0L, 500L), ("x", 1L, 500L), ("x", 2L, 500L),
      ("x", 3L, 2500L), ("y", 0L, 1000L), ("y", 3L, 1000L))
    val mem = MemoryStream[CusumEvent]
    val out = StreamIngest.cusumStream(mem.toDS(), targetCents = 1000L,
      theta = 1)
    val q = out.writeStream.format("memory").queryName("cusum_test")
      .outputMode("append").start()
    try {
      mem.addData(raw.filter(_._2 <= 1).map(CusumEvent.tupled): _*)
      q.processAllAvailable()
      mem.addData(raw.filter(_._2 > 1).map(CusumEvent.tupled): _*)
      q.processAllAvailable()
      val streamed = spark.table("cusum_test").as[CusumOut].collect()
        .map(o => (o.k, o.period) -> (o.cumDev, o.drift)).toMap
      // batch fold reference with zero-fill for gaps
      def fold(evs: Seq[(Long, Long)]): Map[Long, (Long, Boolean)] = {
        var cum = 0L; var last = -1L
        evs.sortBy(_._1).map { case (p, x) =>
          val gap = if (last < 0) 0L else p - last - 1
          cum = cum - gap * 1000L + (x - 1000L); last = p
          p -> (cum, math.abs(cum) > 1000L)
        }.toMap
      }
      val bx = fold(raw.filter(_._1 == "x").map(t => (t._2, t._3)))
      val by = fold(raw.filter(_._1 == "y").map(t => (t._2, t._3)))
      bx.foreach { case (p, v) => assert(streamed(("x", p)) == v, s"x $p") }
      by.foreach { case (p, v) => assert(streamed(("y", p)) == v, s"y $p") }
      // x dips to -1500 at period 2 -> drift; recovers at 3 -> clears
      assert(streamed(("x", 2L))._2 && !streamed(("x", 3L))._2)
      // y's gap at periods 1-2 contributes -2000 silently: period 3 on
      // target leaves cum at -2000 -> drift
      assert(streamed(("y", 3L)) == ((-2000L, true)))
    } finally q.stop()
  }
}
