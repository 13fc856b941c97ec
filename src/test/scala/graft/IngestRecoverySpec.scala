package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.{AnnIndex, BatchLog, CosineDedupIndex, PqIndex, SignatureIndex, Tombstones}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutating entry points must run swap recovery BEFORE touching state.
  *
  * The failure this pins (found in review, fixed across every index):
  * a compaction that crashed between its delete and rename leaves the
  * snapshot dir missing and the fold fully staged in `__compact_tmp`.
  * An ingest landing in that window used to recreate the dir with only
  * its own increment — after which recovery (its own read path's, in
  * the SAME call) saw dest present ∧ tmp present and dropped the staged
  * fold as an abandoned stage: the whole pre-compaction corpus silently
  * lost. Likewise a tombstone appended in the window was cleared when
  * the fold was adopted (the adopt path drops the side table). Each
  * test stages the window for real and proves the post-fix sequencing:
  * adopt first, then mutate. */
class IngestRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def vecs: DataFrame =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")

  private def rmTree(p: Path): Unit =
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  /** Stage a compaction fold of `path` into its tmp and delete `path` —
    * the exact on-disk state of a compact() that died before its
    * rename. */
  private def stageCrashWindow(path: String, op: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val folded = BatchLog.read(spark, path, op)
    BatchLog.stageRewrite(folded, path, s"$path.__compact_tmp", partitionBy)
    rmTree(Paths.get(path))
  }

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val batchA = Seq(
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "completely different text about spark engines and parquet files")
  private val batchB = Seq(
    3L -> "rain in spain falls mainly on the plain every year")

  test("SignatureIndex: ingest inside a crashed compaction window adopts the fold first") {
    val root = Files.createTempDirectory("graft_recov").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    stageCrashWindow(s"$root/signatures", "SignatureIndex")
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("b2"))
    val ids = SignatureIndex.readIndex(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L),
      s"pre-compaction corpus must survive an in-window ingest, got $ids")
  }

  test("SignatureIndex: remove inside a crashed compaction window keeps the tombstone") {
    val root = Files.createTempDirectory("graft_recov").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    stageCrashWindow(s"$root/signatures", "SignatureIndex")
    SignatureIndex.remove(spark, root, Seq(1L))
    val ids = SignatureIndex.readIndex(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L),
      s"the in-window tombstone must survive fold adoption, got $ids")
  }

  test("CosineDedupIndex: ingest inside a crashed compaction window adopts the fold first") {
    val root = Files.createTempDirectory("graft_recov").toString
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") < 100),
      batchKey = Some("b1"))
    CacheJanitor.drain()
    stageCrashWindow(s"$root/codes", "CosineDedupIndex")
    val b2 = CosineDedupIndex.ingest(spark, root,
      vecs.where(col("vec_id") >= 100 && col("vec_id") < 120), batchKey = Some("b2"))
    assert(b2.allCodes.count() === 120,
      "pre-compaction code rows must survive an in-window ingest")
    CacheJanitor.drain()
  }

  test("AnnIndex: ingest inside a crashed compaction window adopts the fold first") {
    val root = Files.createTempDirectory("graft_recov").toString
    AnnIndex.ingest(spark, root, vecs.where(col("vec_id") < 100), batchKey = Some("b1"))
    CacheJanitor.drain()
    stageCrashWindow(s"$root/codes", "AnnIndex", partitionBy = Seq("cell"))
    val b2 = AnnIndex.ingest(spark, root,
      vecs.where(col("vec_id") >= 100 && col("vec_id") < 120), batchKey = Some("b2"))
    assert(b2.allCodes.count() === 120,
      "pre-compaction code rows must survive an in-window ingest")
    CacheJanitor.drain()
  }

  test("PqIndex: ingest inside a crashed compaction window adopts the fold first") {
    val root = Files.createTempDirectory("graft_recov").toString
    PqIndex.ingest(spark, root, vecs.where(col("vec_id") < 100), batchKey = Some("b1"))
    CacheJanitor.drain()
    stageCrashWindow(s"$root/codes", "PqIndex", partitionBy = Seq("cell"))
    val b2 = PqIndex.ingest(spark, root,
      vecs.where(col("vec_id") >= 100 && col("vec_id") < 120), batchKey = Some("b2"))
    assert(b2.allCodes.count() === 120,
      "pre-compaction code rows must survive an in-window ingest")
    CacheJanitor.drain()
  }
}
