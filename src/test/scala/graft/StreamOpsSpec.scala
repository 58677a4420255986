package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

class StreamOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window with watermark drops late events (O12 analog)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = StreamOps.tumblingCounts(events, "1 hour", "10 minutes")
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("tumbling_out").start()
    try {
      // batch 1: events in hours 10 and 11; max event time 11:30
      input.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:55:00"), "a"),
        (ts("2024-01-01 11:30:00"), "a"))
      q.processAllAvailable()
      // batch 2: advance watermark far past hour 10 (wm = 13:00 - 10m)
      input.addData((ts("2024-01-01 13:00:00"), "a"))
      q.processAllAvailable()
      // batch 3: a late event for hour 10 — behind the watermark, dropped
      input.addData((ts("2024-01-01 10:10:00"), "a"))
      q.processAllAvailable()
      // batch 4: push watermark to close every window
      input.addData((ts("2024-01-01 20:00:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .select($"window_start", $"n_events").as[(Timestamp, Long)].collect().toMap
      // hour-10 window emitted with 2 events only — the late third was dropped
      assert(rows(ts("2024-01-01 10:00:00")) == 2L)
      assert(rows(ts("2024-01-01 11:00:00")) == 1L)
    } finally q.stop()
  }

  test("sliding windows count each event in window/slide overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = StreamOps.slidingCounts(events, "1 hour", "30 minutes", "10 minutes")
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sliding_out").start()
    try {
      input.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:40:00"), "a"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), "a")) // close all early windows
      q.processAllAvailable()
      val rows = spark.table("sliding_out")
        .select($"window_start", $"n_events").as[(Timestamp, Long)].collect().toMap
      // 10:05 ∈ [09:30,10:30) and [10:00,11:00); 10:40 ∈ [10:00,11:00) and [10:30,11:30)
      assert(rows(ts("2024-01-01 09:30:00")) == 1L)
      assert(rows(ts("2024-01-01 10:00:00")) == 2L)
      assert(rows(ts("2024-01-01 10:30:00")) == 1L)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val q = StreamOps.sessionCounts(events, "30 minutes", "10 minutes")
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("session_out").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:20:00"), 1L), // one session
        (ts("2024-01-01 12:00:00"), 1L)) // separate session
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), 2L)) // advance watermark, close sessions
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .select($"session_start", $"session_end", $"n_events")
        .as[(Timestamp, Timestamp, Long)].collect().sortBy(_._1.getTime)
      assert(rows.head == ((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:50:00"), 2L)))
      assert(rows(1) == ((ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00"), 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates, keeps state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("doc_hash", "ts")
    val q = StreamOps.dedupStream(events, Seq("doc_hash"), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // same key again within the watermark window → dropped
      input.addData((1L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // advance far past the watermark: old state GC'd, key 1 admits again
      input.addData((9L, ts("2024-01-01 20:00:00")))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 20:01:00")))
      q.processAllAvailable()
      val keys = spark.table("dedup_out").select($"doc_hash").as[Long].collect().toSeq
      assert(keys.count(_ == 1L) == 2) // once early, once after state expiry
      assert(keys.count(_ == 2L) == 1)
    } finally q.stop()
  }

  test("stream-stream join matches purchases to in-horizon signups only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val signups = MemoryStream[(Long, Timestamp, Long)]
    val pDf = purchases.toDF().toDF("user_id", "ts", "event_id")
    val sDf = signups.toDF().toDF("user_id", "ts", "event_id")
    val q = StreamOps.purchasesJoinedToSignups(pDf, sDf, "2 hours", "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_out").start()
    try {
      signups.addData(
        (1L, ts("2024-01-01 09:00:00"), 100L), // in horizon for the 10:00 purchase
        (1L, ts("2024-01-01 05:00:00"), 101L), // too old
        (2L, ts("2024-01-01 09:30:00"), 102L)) // other user
      purchases.addData((1L, ts("2024-01-01 10:00:00"), 200L))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_out")
        .select($"purchase_id", $"signup_ts").as[(Long, Timestamp)].collect().toSeq
      assert(rows == Seq((200L, ts("2024-01-01 09:00:00"))))
    } finally q.stop()
  }

  test("no session conf differs before/after any streaming query") {
    // the round-5 advisor flagged the ns-parquet legacy toggle leaking
    // session-globally from the real-stream queries; it is now scoped
    // inside withRightSizedStreaming alongside shuffle.partitions. Steady-
    // state the session first (the batch events accessor documents a
    // one-way set of the same toggle), then every q_stream_* entry must
    // leave the full session conf bit-identical.
    val sfDir = "/root/testdata/sf0.001"
    graft.tables.Tables.events(spark, sfDir).limit(1).collect()
    val streamKeys = graft.SparkEntry.queries.keys.filter(_.startsWith("q_stream_"))
    assert(streamKeys.size == 14) // r10 q_stream_curate, r11 q_stream_decontaminate_bc, r16 q_stream_decontaminate_semantic + q_stream_multimodal_audit, r17 q_stream_video_frames + q_stream_similarity_serve
    streamKeys.toSeq.sorted.foreach { name =>
      val before = spark.conf.getAll
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
      val after = spark.conf.getAll
      assert(after == before, {
        val diff = (before.toSet diff after.toSet) ++ (after.toSet diff before.toSet)
        s"$name leaked session conf: $diff"
      })
    }
    spark.catalog.clearCache()
  }

  test("flatMapGroupsWithState keeps running per-user counters across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.UserEvent]
    val q = StreamOps.runningUserCounters(input.toDS())
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("state_out").start()
    try {
      input.addData(
        StreamOps.UserEvent(1, ts("2024-01-01 10:00:00"), "view"),
        StreamOps.UserEvent(1, ts("2024-01-01 10:01:00"), "purchase"))
      q.processAllAvailable()
      input.addData(StreamOps.UserEvent(1, ts("2024-01-01 10:02:00"), "purchase"))
      q.processAllAvailable()
      val rows = spark.table("state_out").as[StreamOps.UserRunning].collect()
      // second emission reflects accumulated state: 3 events, 2 purchases
      assert(rows.map(r => (r.n_events, r.n_purchases)).toSet ==
        Set((2L, 1L), (3L, 2L)))
    } finally q.stop()
  }
}
