package graft

import java.nio.file.Files

import graft.operators.AnnIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming→ANN seam: an embedding stream maintains the persisted
  * IVF-SQ8 index through `foreachBatch` — the vector-side twin of
  * `StreamingDedupIndexSpec`. The quantizer freezes on the FIRST
  * micro-batch; every later batch encodes only its increment, and the
  * streamed index answers queries identically to one built in a single
  * batch ingest of the same vectors. A mid-stream takedown (tombstone)
  * composes with the stream: later batches keep appending while the
  * removed id stays invisible to topK. */
class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("an embedding stream maintains the ANN index incrementally via foreachBatch") {
    val root = Files.createTempDirectory("graft_stream_ann").toString
    val oneShotRoot = Files.createTempDirectory("graft_stream_ann_ref").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // Three micro-batches of ids; MemoryStream carries the id, the batch
    // body joins the vectors back (embeddings are not encodable as a
    // MemoryStream product type).
    val input = MemoryStream[Long]
    val newCounts = scala.collection.mutable.ArrayBuffer.empty[Long]

    val q = input.toDF().toDF("vec_id")
      .writeStream
      .foreachBatch { (ids: DataFrame, batchId: Long) =>
        val batch = vecs.join(ids, "vec_id")
        // Micro-batch id as the replay-idempotence key: a re-delivered
        // batch overwrites its own code files (at-least-once -> exactly-once).
        newCounts += AnnIndex.ingest(spark, root, batch,
          batchKey = Some(s"mb$batchId")).newCodes.count()
        CacheJanitor.drain()
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      input.addData(0L until 200L: _*)
      q.processAllAvailable()
      // Takedown arrives mid-stream: id 7 must vanish from queries while
      // the stream keeps appending increments afterwards.
      AnnIndex.remove(spark, root, Seq(7L))
      input.addData(200L until 400L: _*)
      q.processAllAvailable()
      input.addData(400L until 500L: _*)
      q.processAllAvailable()
      q.processAllAvailable() // no new data → no extra ingest
    } finally q.stop()
    assert(newCounts.toSeq == Seq(200L, 200L, 100L),
      s"each micro-batch must encode exactly its increment: $newCounts")

    // Reference: the same 500 vectors ingested as ONE batch (so the same
    // quantizer training set: the stream's first batch is ids 0..199 and
    // training reads the k/cap smallest vec_ids — replicate by training
    // on the first 200 then appending the rest).
    AnnIndex.ingest(spark, oneShotRoot, vecs.where(col("vec_id") < 200))
    AnnIndex.ingest(spark, oneShotRoot, vecs.where(col("vec_id") >= 200))
    AnnIndex.remove(spark, oneShotRoot, Seq(7L))

    val queries = vecs.where(col("vec_id").isin(0L, 100L, 300L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    def top(r: String) = AnnIndex.topK(spark, r, queries, k = 3, rerank = Some(vecs))
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val streamed = top(root)
    val oneShot = top(oneShotRoot)
    CacheJanitor.drain()
    assert(streamed == oneShot,
      s"streamed index answers must equal the batch-built index: $streamed vs $oneShot")
    assert(!streamed.exists(_._2 == 7L), "tombstoned id must not appear as a neighbor")
    assert(streamed.nonEmpty)
  }

  test("a mid-stream refreeze composes with foreachBatch ingestion") {
    val root = Files.createTempDirectory("graft_stream_refreeze").toString
    val refRoot = Files.createTempDirectory("graft_stream_refreeze_ref").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("vec_id")
      .writeStream
      .foreachBatch { (ids: DataFrame, batchId: Long) =>
        AnnIndex.ingest(spark, root, vecs.join(ids, "vec_id"),
          batchKey = Some(s"mb$batchId"))
        CacheJanitor.drain()
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      // Batches 1–2 freeze the quantizer at |batch 1| = 200's ladder
      // step; by live = 400 the corpus has outgrown it.
      input.addData(0L until 200L: _*)
      q.processAllAvailable()
      input.addData(200L until 400L: _*)
      q.processAllAvailable()
      assert(AnnIndex.needsRefreeze(spark, root),
        "live count past the frozen ladder step must raise the drift signal")
      // The operator refreezes BETWEEN micro-batches (the maintenance
      // window foreachBatch naturally provides): retrain on the live
      // 400, re-encode, swap. The stream then keeps ingesting — batch 3
      // encodes under the RETRAINED quantizer.
      AnnIndex.refreeze(spark, root, vecs)
      assert(!AnnIndex.needsRefreeze(spark, root),
        "refreeze must clear the drift signal")
      input.addData(400L until 500L: _*)
      q.processAllAvailable()
    } finally q.stop()

    // Reference: a root whose FIRST batch is the 400 vectors the
    // refreeze retrained on — identical training inputs, identical
    // quantizer — with the stream's batch 3 appended after.
    AnnIndex.ingest(spark, refRoot, vecs.where(col("vec_id") < 400))
    AnnIndex.ingest(spark, refRoot, vecs.where(col("vec_id") >= 400))

    val queries = vecs.where(col("vec_id").isin(0L, 250L, 450L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    def top(r: String) = AnnIndex.topK(spark, r, queries, k = 3, rerank = Some(vecs))
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val streamed = top(root)
    val reference = top(refRoot)
    CacheJanitor.drain()
    assert(streamed == reference,
      s"refrozen streamed index must answer like a root born at the new step: $streamed vs $reference")
    assert(streamed.nonEmpty)
  }
}
