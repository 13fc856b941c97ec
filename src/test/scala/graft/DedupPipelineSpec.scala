package graft

import java.nio.file.Files

import graft.operators.DedupPipeline

/** The packaged dedup maintenance loop: two landing batches through
  * `runOnce`, the atomic keeper manifest after each, and the
  * anti-join application a training-data reader runs. */
class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val batchA = Seq(
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "the quick brown fox jumps over the lazy cat today",
    3L -> "completely different text about spark engines and parquet files",
    7L -> "short doc") // unshingleable → singleton by definition
  private val batchB = Seq(
    4L -> "the quick brown fox jumps over the lazy dog yesterday",
    5L -> "another unrelated document with entirely distinct words inside",
    6L -> "completely different text about spark engines and parquet files")

  test("two batches: incremental manifest equals the from-scratch expectation") {
    val root = Files.createTempDirectory("graft_dedup_pipe").toString

    val s1 = DedupPipeline.runOnce(spark, root, docs(batchA: _*))
    assert(s1.newDocs == 4 && s1.deltaPairs == 1, s1)
    assert(s1.clusters == 3 && s1.keepers == 3, s1) // {1,2}, {3}, {7}
    val m1 = DedupPipeline.keeperManifest(spark, root)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(m1 === Map(1L -> true, 2L -> false, 3L -> true, 7L -> true))

    val s2 = DedupPipeline.runOnce(spark, root, docs(batchB: _*))
    // Delta pairs touch the increment only: (1,4), (2,4), (3,6).
    assert(s2.newDocs == 3 && s2.deltaPairs == 3, s2)
    assert(s2.clusters == 4 && s2.keepers == 4, s2) // {1,2,4}, {3,6}, {5}, {7}
    val m2 = DedupPipeline.keeperManifest(spark, root)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(m2 === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> true))

    // The reader-side application: keepers survive, near-dups drop,
    // docs the index never saw survive a stale manifest.
    val corpus = docs(batchA ++ batchB :+ (99L -> "brand new doc"): _*)
    val kept = DedupPipeline.applyManifest(corpus,
      DedupPipeline.keeperManifest(spark, root))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 5L, 7L, 99L))
  }
}
