package graft

import java.nio.file.Files

import graft.operators.PqIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming→IVF-PQ seam — `StreamingAnnIndexSpec`'s contract on
  * the PQ index: both quantizers (coarse cells + per-subspace
  * codebooks) freeze on the FIRST micro-batch, each later batch
  * encodes only its increment, the streamed index answers queries
  * identically to a batch-built one, and a mid-stream tombstone stays
  * invisible to topK while the stream keeps appending. */
class StreamingPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("an embedding stream maintains the PQ index incrementally via foreachBatch") {
    val root = Files.createTempDirectory("graft_stream_pq").toString
    val oneShotRoot = Files.createTempDirectory("graft_stream_pq_ref").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val input = MemoryStream[Long]
    val newCounts = scala.collection.mutable.ArrayBuffer.empty[Long]

    val q = input.toDF().toDF("vec_id")
      .writeStream
      .foreachBatch { (ids: DataFrame, batchId: Long) =>
        val batch = vecs.join(ids, "vec_id")
        // Micro-batch id as the replay-idempotence key (same contract as
        // the SQ8 stream).
        newCounts += PqIndex.ingest(spark, root, batch,
          batchKey = Some(s"mb$batchId")).newCodes.count()
        CacheJanitor.drain()
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      input.addData(0L until 200L: _*)
      q.processAllAvailable()
      PqIndex.remove(spark, root, Seq(7L))
      input.addData(200L until 400L: _*)
      q.processAllAvailable()
      input.addData(400L until 500L: _*)
      q.processAllAvailable()
      q.processAllAvailable() // no new data → no extra ingest
    } finally q.stop()
    assert(newCounts.toSeq == Seq(200L, 200L, 100L),
      s"each micro-batch must encode exactly its increment: $newCounts")

    // Reference: same vectors, same first-batch training set, one ingest
    // pair instead of a stream.
    PqIndex.ingest(spark, oneShotRoot, vecs.where(col("vec_id") < 200))
    PqIndex.ingest(spark, oneShotRoot, vecs.where(col("vec_id") >= 200))
    PqIndex.remove(spark, oneShotRoot, Seq(7L))

    val queries = vecs.where(col("vec_id").isin(0L, 100L, 300L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    def top(r: String) = PqIndex.topK(spark, r, queries, k = 3, rerank = Some(vecs))
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
    val root = Files.createTempDirectory("graft_stream_pq_refreeze").toString
    val refRoot = Files.createTempDirectory("graft_stream_pq_refreeze_ref").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("vec_id")
      .writeStream
      .foreachBatch { (ids: DataFrame, batchId: Long) =>
        PqIndex.ingest(spark, root, vecs.join(ids, "vec_id"),
          batchKey = Some(s"mb$batchId"))
        CacheJanitor.drain()
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      input.addData(0L until 200L: _*)
      q.processAllAvailable()
      input.addData(200L until 400L: _*)
      q.processAllAvailable()
      assert(PqIndex.needsRefreeze(spark, root),
        "live count past the frozen ladder step must raise the drift signal")
      // Retrains BOTH artifacts (coarse cells at the new ladder step +
      // per-subspace codebooks) on the live 400 and re-encodes.
      PqIndex.refreeze(spark, root, vecs)
      assert(!PqIndex.needsRefreeze(spark, root),
        "refreeze must clear the drift signal")
      input.addData(400L until 500L: _*)
      q.processAllAvailable()
    } finally q.stop()

    // Reference: a root whose FIRST batch is the 400-vector retrain set,
    // then the stream's batch 3.
    PqIndex.ingest(spark, refRoot, vecs.where(col("vec_id") < 400))
    PqIndex.ingest(spark, refRoot, vecs.where(col("vec_id") >= 400))

    val queries = vecs.where(col("vec_id").isin(0L, 250L, 450L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    def top(r: String) = PqIndex.topK(spark, r, queries, k = 3, rerank = Some(vecs))
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
