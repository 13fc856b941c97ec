package graft

import java.nio.file.Files

import graft.operators.SketchLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming→stats seam: an event stream maintains the persisted
  * HLL sketch log through `foreachBatch`, the same composition the
  * index logs pin. Each micro-batch pays one scan of its increment;
  * estimates refresh from the sketch rows alone; the micro-batch id as
  * batch key turns foreachBatch's at-least-once re-delivery into an
  * overwrite of itself — no double-counting. */
class StreamingSketchLogSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(root: String): Map[String, (Long, Long)] =
    SketchLog.estimate(spark, root, "event_type").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("an event stream maintains the sketch log incrementally via foreachBatch") {
    val root = Files.createTempDirectory("graft_stream_sklog").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]

    val q = input.toDF().toDF("event_type", "user_id")
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        SketchLog.ingest(spark, root, df, "event_type", "user_id",
          batchKey = Some(s"mb$batchId"))
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      input.addData("click" -> 1L, "click" -> 2L, "view" -> 1L)
      q.processAllAvailable()
      input.addData("click" -> 2L, "click" -> 9L, "view" -> 4L, "buy" -> 5L)
      q.processAllAvailable()
      q.processAllAvailable() // no data → no extra batch scheduled
    } finally q.stop()

    val after = estimates(root)
    assert(after === Map(
      "click" -> ((3L, 4L)), "view" -> ((2L, 2L)), "buy" -> ((1L, 1L))),
      s"merged stream estimates wrong: $after")

    // Crash-re-delivery of the last micro-batch: replaying under its own
    // key must leave estimates unchanged (overwrite, not double-count).
    SketchLog.ingest(spark, root,
      Seq("click" -> 2L, "click" -> 9L, "view" -> 4L, "buy" -> 5L)
        .toDF("event_type", "user_id"),
      "event_type", "user_id", batchKey = Some("mb1"))
    assert(estimates(root) === after, "re-delivered micro-batch must not double-count")
  }
}
