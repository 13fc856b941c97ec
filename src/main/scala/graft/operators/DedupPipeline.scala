package graft.operators

import graft.sources.LandingLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental dedup MAINTENANCE LOOP as one user-facing entry —
  * what a curation pipeline actually schedules per landing batch
  * (the training-data analog of `star.Runner.runOnce`):
  *
  *   1. [[SignatureIndex.ingest]] — signatures for the increment only,
  *      appended; the batch's near-dup delta pairs (O(increment));
  *   2. [[ClusterLabels.merge]] — the delta folded into the persisted
  *      cluster assignment (CC over delta ∪ touched components only);
  *      every increment doc gets a label, including unshingleable ones
  *      (singletons by definition — a doc with no signature can never
  *      pair);
  *   3. an ATOMIC refresh of the `keeper_manifest` snapshot
  *      ([[LandingLog.writeSnapshot]] stage-then-commit), the table a
  *      downstream training-data reader anti-joins to drop near-dups.
  *
  * Per-batch cost is O(increment ∪ touched components) compute plus one
  * manifest rewrite (corpus-row-sized but tiny rows; retention/time
  * travel available via the snapshot layer). [[ClusterLabels.keeperDelta]]
  * serves consumers that apply keeper changes incrementally instead.
  */
object DedupPipeline {

  final case class BatchStats(
      newDocs: Long, deltaPairs: Long, clusters: Long, keepers: Long)

  /** One maintenance batch over a `(doc_id, text)` increment; doc_ids
    * must be new to the index (keep-last dedup is the landing layer's
    * job, as in the star pipeline). Returns the batch's observable
    * counts (all metadata-scale aggregates). */
  def runOnce(spark: SparkSession, root: String, increment: DataFrame): BatchStats = {
    val b = SignatureIndex.ingest(spark, root, increment)
    val labels = ClusterLabels.merge(spark, root,
      b.deltaPairs.select(col("doc_a"), col("doc_b")),
      increment.select(col("doc_id")))
    val manifest = graft.CacheJanitor.register(
      ClusterLabels.keeperManifest(labels).persist())
    LandingLog.writeSnapshot(manifest, root, "keeper_manifest")
    val stats = BatchStats(
      newDocs = increment.count(),
      deltaPairs = b.deltaPairs.count(),
      clusters = manifest.select("label").distinct().count(),
      keepers = manifest.where(col("keep")).count())
    graft.CacheJanitor.drain()
    stats
  }

  /** The current keeper manifest (atomic snapshot read). */
  def keeperManifest(spark: SparkSession, root: String): DataFrame =
    LandingLog.readSnapshot(spark, root, "keeper_manifest")

  /** Deduplicate a corpus frame against the manifest: keep exactly the
    * per-cluster keepers plus every doc the index has never seen (new
    * docs are not dropped by a stale manifest). */
  def applyManifest(corpus: DataFrame, manifest: DataFrame): DataFrame = {
    val drop = manifest.where(!col("keep")).select(col("doc_id"))
    corpus.join(drop, Seq("doc_id"), "left_anti")
  }
}
