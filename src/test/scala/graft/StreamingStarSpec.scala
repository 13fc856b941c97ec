package graft

import graft.sources.WatermarkStore
import graft.star.Runner
import graft.streaming.EventsStream
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** The streaming→batch seam composed end-to-end: a checkpointed
  * `EventsStream.toLanding` stream feeds the SAME landing surface the
  * incremental star pipeline extracts from — stream → parquet landing
  * (exactly-once via the checkpoint) → watermark-gated ingest → CSV log
  * → star rebuild. Re-running either stage with no new data ingests
  * nothing twice: the checkpoint guards the streaming hop, the
  * watermark store guards the batch hop. */
class StreamingStarSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)

  private val root = Files.createTempDirectory("graft_stream_star").toString
  private val streamSrc = s"$root/stream_src"     // the "operational" feed
  private val streamed = s"$root/streamed_landing" // toLanding output
  private val ckpt = s"$root/ckpt"
  private val landing = s"$root/landing"
  private val processed = s"$root/processed"
  private val state = s"$root/state/update_tracking.json"

  private def orderRows(v2: Boolean): DataFrame = {
    val base = Seq(
      (101, ts("2025-09-01 09:15:00"), ts("2025-09-01 09:15:00"), 7, 12, 23, 100,
        BigDecimal("3.25"), 1, dt("2025-09-10"), dt("2025-09-12"), 15))
    val extra = Seq(
      (101, ts("2025-09-01 09:15:00"), ts("2025-09-01 10:11:00"), 7, 12, 23, 120,
        BigDecimal("3.25"), 1, dt("2025-09-10"), dt("2025-09-12"), 15),
      (102, ts("2025-09-01 10:05:00"), ts("2025-09-01 10:05:00"), 8, 14, 23, 40,
        BigDecimal("9.99"), 2, dt("2025-09-11"), dt("2025-09-13"), 16))
    (if (v2) extra else base).toDF("sales_order_id", "created_at", "last_updated",
      "design_id", "staff_id", "counterparty_id", "units_sold", "unit_price",
      "currency_id", "agreed_delivery_date", "agreed_payment_date",
      "agreed_delivery_location_id")
      // Scala BigDecimal infers decimal(38,18); the feed must carry the
      // source schema's money type for the streaming read to match.
      .withColumn("unit_price", $"unit_price".cast("decimal(10,2)"))
  }

  private def drainToLanding(): Unit = {
    val stream = spark.readStream
      .schema(graft.model.Schemas.sources("sales_order")._1)
      .parquet(streamSrc)
    EventsStream.toLanding(stream, streamed, ckpt).awaitTermination(60000)
  }

  private def runBatch(batchId: String): Seq[String] = {
    val store = new WatermarkStore(state)
    val src = Map("sales_order" -> spark.read.parquet(streamed))
    val updated = Runner.ingestOnce(src, landing, store, batchId)
    if (updated.isEmpty) Seq.empty
    else Runner.processBatch(spark, landing, processed, updated.toSet)
  }

  test("streamed landing feeds the star rebuild; neither hop ingests twice") {
    // Batch 1: one order lands via the stream, the star pipeline picks it up.
    orderRows(v2 = false).write.mode("append").parquet(streamSrc)
    drainToLanding()
    assert(spark.read.parquet(streamed).count() == 1)
    val w1 = runBatch("2025-09-01 10:00:00.000")
    assert(w1.toSet == Set("dim-date", "fact-sales_order"), s"batch 1 wrote: $w1")
    val f1 = graft.sources.LandingLog.readSnapshot(spark, processed, "fact-sales_order").collect()
    assert(f1.length == 1 && f1(0).getAs[Int]("units_sold") == 100)

    // Batch 2: two more rows stream in (an update of 101 + new 102); the
    // checkpoint ingests only the new file, the watermark gate extracts
    // only rows past 09:15, and keep-last rebuilds the fact.
    orderRows(v2 = true).write.mode("append").parquet(streamSrc)
    drainToLanding()
    assert(spark.read.parquet(streamed).count() == 3, "only the new rows were streamed")
    val w2 = runBatch("2025-09-01 11:30:00.000")
    assert(w2.toSet == Set("dim-date", "fact-sales_order"), s"batch 2 wrote: $w2")
    val f2 = graft.sources.LandingLog.readSnapshot(spark, processed, "fact-sales_order")
      .orderBy("sales_order_id").collect()
    assert(f2.map(_.getAs[Int]("sales_order_id")).toSeq == Seq(101, 102))
    assert(f2(0).getAs[Int]("units_sold") == 120, "keep-last version feeds the fact")

    // No new data anywhere: the streaming re-run ingests nothing (the
    // checkpoint is its watermark store) and the batch gate skips.
    drainToLanding()
    assert(spark.read.parquet(streamed).count() == 3, "checkpointed re-run must be a no-op")
    assert(runBatch("2025-09-01 12:00:00.000").isEmpty, "watermark gate must skip")
  }
}
