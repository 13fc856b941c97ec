package graft

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowed streaming aggregate matches its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, 10, "click", 1.0, ts("2024-01-01 10:05:00")),
      Event(2, 10, "click", 2.0, ts("2024-01-01 10:55:00")),
      Event(3, 11, "view", 5.0, ts("2024-01-01 11:10:00")))
    q.processAllAvailable()
    // advance watermark far enough to close the 10:00 and 11:00 windows
    input.addData(Event(4, 12, "view", 1.0, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_out")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
  }

  test("file-source streaming entry processes a parquet directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value", "ts")
      .limit(500).write.mode("overwrite").parquet(dir)
    val q = EventsStream.windowedCounts(EventsStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("file_win_out")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode only emits watermark-closed windows; with a single burst
    // the final windows stay open, so assert the stream ran and the state
    // machinery processed rows rather than a specific count
    assert(q.lastProgress != null && q.recentProgress.map(_.numInputRows).sum == 500)
  }

  test("streaming dedup drops duplicate keys within the watermark, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, 10, "click", 1.0, ts("2024-01-01 10:00:00")),
      Event(1, 10, "click", 1.0, ts("2024-01-01 10:00:00")), // exact dup, same batch
      Event(2, 10, "click", 2.0, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    input.addData(
      Event(1, 10, "click", 1.0, ts("2024-01-01 10:01:00")), // dup key, later batch
      Event(3, 11, "view", 5.0, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"each key exactly once: ${ids.toSeq}")
  }

  test("stream-stream interval join attributes clicks to purchases, equal to its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.attributeWithin(input.toDF(), horizonMinutes = 30)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()

    val events = Seq(
      Event(1, 10, "click", 1.0, ts("2024-01-01 10:00:00")),
      Event(2, 10, "purchase", 9.0, ts("2024-01-01 10:10:00")), // within 30m → attributed
      Event(3, 10, "purchase", 9.0, ts("2024-01-01 11:30:00")), // outside horizon
      Event(4, 11, "purchase", 5.0, ts("2024-01-01 10:05:00")), // no click for user 11
      Event(5, 12, "click", 1.0, ts("2024-01-01 10:20:00")),
      Event(6, 12, "purchase", 2.0, ts("2024-01-01 10:50:00"))) // exactly at +30m → attributed
    input.addData(events: _*)
    q.processAllAvailable()
    // Advance the watermark past every buffered row so append mode emits
    // all matches (join state for the earlier rows is evictable).
    input.addData(Event(7, 99, "view", 0.0, ts("2024-01-01 20:00:00")))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("attr_out")
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Batch twin: identical code path over a batch frame (watermarks are
    // no-ops there) — streamed attribution must equal the batch join.
    val batch = EventsStream.attributeWithin(
        (events :+ Event(7, 99, "view", 0.0, ts("2024-01-01 20:00:00"))).toDF(),
        horizonMinutes = 30)
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed $streamed != batch $batch")
    assert(streamed == Set((10L, 1L, 2L), (12L, 5L, 6L)))
  }

  test("left-outer interval join emits unmatched clicks once the watermark proves no match can come") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.attributeWithin(input.toDF(), horizonMinutes = 30,
        joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, 10, "click", 1.0, ts("2024-01-01 10:00:00")),
      Event(2, 10, "purchase", 9.0, ts("2024-01-01 10:10:00")), // matched
      Event(3, 11, "click", 1.0, ts("2024-01-01 10:05:00")))    // never converts
    q.processAllAvailable()
    // Before the watermark passes 10:05 + 30m (+ the 1h watermark delay),
    // the unmatched click for user 11 must NOT have been emitted — Spark
    // cannot yet prove a matching purchase won't arrive.
    val early = spark.table("attr_outer_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!early.contains((11L, 3L)),
      s"unmatched click emitted before the watermark could prove no-match: $early")
    // Advance event time far past every horizon + watermark delay. The
    // advancing rows must reach BOTH join sides: each side's watermark
    // tracks its own filtered stream, so a row of any other event_type
    // (filtered out upstream) would advance neither.
    input.addData(
      Event(4, 99, "click", 0.0, ts("2024-01-02 00:00:00")),
      Event(5, 99, "purchase", 0.0, ts("2024-01-02 00:00:00")))
    q.processAllAvailable()
    // Outer-side null rows flush on the trigger AFTER the watermark
    // moves — give the stream one more batch to close out.
    input.addData(
      Event(6, 98, "click", 0.0, ts("2024-01-03 00:00:00")),
      Event(7, 98, "purchase", 0.0, ts("2024-01-03 00:00:00")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attr_outer_out")
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(Set((10L, 1L, 2L), (11L, 3L, -1L)).subsetOf(out),
      s"expected the matched pair plus the null-extended unmatched click: $out")
  }

  test("streaming landing sink is exactly-once across re-runs (checkpointed)") {
    val root = java.nio.file.Files.createTempDirectory("graft_stream_land")
    val (src, land, ckpt) = (s"$root/src", s"$root/landing", s"$root/ckpt")
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value", "ts")
      .limit(200).write.mode("overwrite").parquet(src)

    EventsStream.toLanding(EventsStream.readEvents(spark, src), land, ckpt)
      .awaitTermination(60000)
    assert(spark.read.parquet(land).count() == 200)

    // Re-run with no new source data: the checkpoint (the streaming form
    // of the watermark store) must prevent re-ingestion.
    EventsStream.toLanding(EventsStream.readEvents(spark, src), land, ckpt)
      .awaitTermination(60000)
    assert(spark.read.parquet(land).count() == 200, "second run must ingest nothing")
  }

  test("stateful sessionization closes sessions on the event-time gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, 10, "click", 1.0, ts("2024-01-01 10:00:00")),
      Event(2, 10, "click", 2.0, ts("2024-01-01 10:10:00")), // same session
      Event(3, 10, "click", 4.0, ts("2024-01-01 11:30:00"))) // new session (80-min gap)
    q.processAllAvailable()
    // push watermark ahead so the open session times out and emits
    input.addData(Event(9, 99, "view", 0.0, ts("2024-01-01 18:00:00")))
    q.processAllAvailable()
    input.addData(Event(10, 98, "view", 0.0, ts("2024-01-02 12:00:00")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_out").as[Session]
      .collect().filter(_.user_id == 10).sortBy(_.session_start.getTime)
    assert(out.length == 2, s"two sessions for user 10, got ${out.toSeq}")
    assert(out(0).n_events == 2 && out(0).total_value == 3.0)
    assert(out(0).session_end.toString == "2024-01-01 10:10:00.0")
    assert(out(1).n_events == 1 && out(1).total_value == 4.0)
  }
}
