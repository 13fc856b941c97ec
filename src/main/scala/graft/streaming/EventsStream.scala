package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10): the reference's 20-min
  * EventBridge micro-batch cadence formalized as a streaming query. The
  * same transforms run in batch (queries q24/q25) and streaming — one
  * logical plan, two triggers.
  *
  * Scale: the windowed aggregate is a streaming partial-agg with state in
  * the state store keyed by (window, event_type); watermarking bounds
  * state. Sessionization keeps one state row per user, timing out on the
  * processing gap — `flatMapGroupsWithState` is the Spark-native form of
  * a custom streaming operator.
  */
object EventsStream {

  final case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Tumbling 1-hour event-time window with a 2-hour watermark — the
    * streaming twin of batch query q25. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Gap-based sessionization with explicit state: a session closes when
    * no event arrives within `gapMinutes` (event time, per user). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** File-source streaming read of an events directory — the production
    * entry (`readStream` over a landing path); tests use MemoryStream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP")
      .parquet(dir)

  /** Streaming exactly-once dedup on the event key: duplicates arriving
    * within the watermark horizon are dropped with BOUNDED state
    * (`dropDuplicatesWithinWatermark` evicts keys once the watermark
    * passes them — plain `dropDuplicates` would grow state forever on an
    * unbounded stream). The streaming twin of the batch keep-one dedup
    * (A2/A3): at-least-once upstream delivery becomes exactly-once per
    * key downstream — the property the reference's immutable-increment
    * contract approximates in batch. */
  def dedupEvents(events: DataFrame, keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream INTERVAL JOIN — each click attributed to
    * the same user's purchases within the next `horizonMinutes` (the
    * classic attribution shape; a self-join of the one event stream
    * split by type). Both sides carry watermarks and the join condition
    * bounds purchase_ts to [click_ts, click_ts + horizon], so Spark can
    * evict buffered state on BOTH sides: a click past
    * watermark + horizon can never match a future purchase, and an
    * unmatched purchase evicts at its own watermark — without the time
    * bound the join state grows forever on an unbounded stream. Append
    * mode; works identically on a batch frame (watermarks are no-ops
    * there), which is what the spec's batch-twin equality pins. */
  def attributeWithin(events: DataFrame, horizonMinutes: Int = 30,
      joinType: String = "inner"): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    // joinType "left_outer": a click with no purchase in its horizon is
    // still emitted (purchase columns NULL) — but only once the
    // watermark has passed click_ts + horizon, when Spark can PROVE no
    // future purchase can match. The unmatched-conversion report every
    // attribution pipeline also needs, and the semantics that only
    // watermarked state eviction makes possible on an unbounded stream.
    clicks.join(purchases,
      expr(s"""c_user = p_user AND purchase_ts >= click_ts
              | AND purchase_ts <= click_ts + interval $horizonMinutes minutes""".stripMargin),
      joinType)
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming landing sink: append the (deduped) stream as parquet under
    * the landing root with an exactly-once checkpoint — the streaming
    * form of the reference's ingest stage (S3 + S14 collapse into the
    * sink + its offset log). `AvailableNow` drains what exists and stops:
    * the reference's 20-minute EventBridge cadence becomes re-running
    * this one query, with the checkpoint as the watermark store. */
  def toLanding(events: DataFrame, landingDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .format("parquet")
      .option("path", landingDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
