package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.{AnnIndex, BatchLog, ClusterLabels, CosineDedupIndex, PqIndex, RefreezeProtocol, SignatureIndex, Tombstones}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replay idempotence of the batch-keyed index logs: a driver that dies
  * AFTER a batch's append committed and then replays the batch (the
  * standard at-least-once retry) must leave every index byte-equivalent
  * to a single ingest — no duplicate signature/code rows, no inflated
  * delta pairs or stats, no burned label batch numbers. Plus the legacy
  * (pre-batch-format) layout gate: unversioned roots are refused loudly
  * and migrate in place. */
class BatchLogSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val batchA = Seq(
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "the quick brown fox jumps over the lazy cat today",
    3L -> "completely different text about spark engines and parquet files")
  private val batchB = Seq(
    4L -> "the quick brown fox jumps over the lazy dog yesterday",
    5L -> "another unrelated document with entirely distinct words inside",
    6L -> "completely different text about spark engines and parquet files")

  // Listed through the version pointer: post-swap roots hold their
  // current batch dirs inside _versions/<n> (the superseded flat state
  // lingers for grace-GC and must not be mistaken for the log).
  private def batchDirs(path: String): Seq[String] = {
    val rp = BatchLog.resolve(spark, path)
    if (!Files.isDirectory(Paths.get(rp))) Seq.empty
    else Files.list(Paths.get(rp)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch_key=")).toSeq.sorted
  }

  private def pairSet(df: DataFrame) =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("signature index: replaying a keyed batch replaces itself — state equals a single ingest") {
    val root = Files.createTempDirectory("graft_bk_sig").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    val b2 = SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("b2"))
    val wantPairs = pairSet(b2.deltaPairs)
    val wantRows = SignatureIndex.readIndex(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    CacheJanitor.drain()

    // Crash-after-commit retry: same increment, same key.
    val replay = SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("b2"))
    val replayPairs = pairSet(replay.deltaPairs)
    val gotRows = SignatureIndex.readIndex(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    CacheJanitor.drain()

    assert(gotRows == wantRows, "replay must not add rows")
    assert(SignatureIndex.readIndex(spark, root).count() == wantRows.size,
      "no duplicate physical rows after replay")
    assert(replayPairs == wantPairs, "replayed delta pairs must equal the original batch's")
    assert(batchDirs(s"$root/signatures") == Seq("batch_key=bb1", "batch_key=bb2"),
      "replay must reuse its own batch directory, not append a third")
  }

  test("cluster labels: a replayed merge reproduces its own batch number and state") {
    val root = Files.createTempDirectory("graft_bk_lbl").toString
    def labelMap() = ClusterLabels.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    ClusterLabels.merge(spark, root,
      Seq((1L, 2L)).toDF("doc_a", "doc_b"),
      Seq(1L, 2L, 3L).toDF("doc_id"), batchKey = Some("b1"))
    ClusterLabels.merge(spark, root,
      Seq((2L, 4L)).toDF("doc_a", "doc_b"),
      Seq(4L, 5L).toDF("doc_id"), batchKey = Some("b2"))
    CacheJanitor.drain()
    val want = labelMap()
    val wantBatch = ClusterLabels.latestBatch(spark, root)
    val wantLogRows = spark.read.parquet(ClusterLabels.dir(root)).count()

    // Replay batch 2 after a simulated crash-after-commit.
    ClusterLabels.merge(spark, root,
      Seq((2L, 4L)).toDF("doc_a", "doc_b"),
      Seq(4L, 5L).toDF("doc_id"), batchKey = Some("b2"))
    CacheJanitor.drain()

    assert(labelMap() == want, "labels must be unchanged by the replay")
    assert(ClusterLabels.latestBatch(spark, root) == wantBatch,
      "replay must not burn a batch number")
    assert(spark.read.parquet(ClusterLabels.dir(root)).count() == wantLogRows,
      "replay must not grow the label log")
    assert(batchDirs(ClusterLabels.dir(root)) == Seq("batch_key=bb1", "batch_key=bb2"))
    // keeperDelta of the replayed batch is still one coherent delta.
    assert(ClusterLabels.keeperDelta(spark, root, wantBatch).count() > 0)
  }

  test("cosine index: replayed ingest leaves codes, deltas, and mask as a single ingest") {
    val root = Files.createTempDirectory("graft_bk_cos").toString
    def vec(seed: Long) = Array.tabulate(8)(i => if (i == (seed % 8).toInt) 1.0f else 0.0f)
    val va = (0L until 40L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")
    val vb = (40L until 60L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")

    CosineDedupIndex.ingest(spark, root, va, batchKey = Some("b1"))
    val b2 = CosineDedupIndex.ingest(spark, root, vb, batchKey = Some("b2"))
    val wantPairs = b2.deltaPairs.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantCount = CosineDedupIndex.readIndex(spark, root).count()
    val mask = CosineDedupIndex.frozenMask(spark, root).get
    CacheJanitor.drain()

    val replay = CosineDedupIndex.ingest(spark, root, vb, batchKey = Some("b2"))
    val gotPairs = replay.deltaPairs.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheJanitor.drain()

    assert(CosineDedupIndex.readIndex(spark, root).count() == wantCount)
    assert(gotPairs == wantPairs)
    assert(CosineDedupIndex.frozenMask(spark, root).contains(mask))
    assert(batchDirs(s"$root/codes") == Seq("batch_key=bb1", "batch_key=bb2"))
  }

  test("ANN indexes: replayed ingest leaves codes identical to a single ingest") {
    val dir0 = "/root/testdata/sf0.01"
    val vecs = Tables.embeddings(spark, dir0).select("vec_id", "embedding")
    def codeSet(df: DataFrame) =
      df.select("vec_id", "cell", "codes").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet

    val rootA = Files.createTempDirectory("graft_bk_ann").toString
    AnnIndex.ingest(spark, rootA, vecs.where(col("vec_id") < 250), batchKey = Some("b1"))
    val b2 = AnnIndex.ingest(spark, rootA, vecs.where(col("vec_id") >= 250), batchKey = Some("b2"))
    val want = codeSet(b2.allCodes); CacheJanitor.drain()
    val rep = AnnIndex.ingest(spark, rootA, vecs.where(col("vec_id") >= 250), batchKey = Some("b2"))
    assert(codeSet(rep.allCodes) == want)
    assert(rep.allCodes.count() == want.size, "no duplicate rows after replay")
    CacheJanitor.drain()
    assert(batchDirs(s"$rootA/codes") == Seq("batch_key=bb1", "batch_key=bb2"))

    val rootP = Files.createTempDirectory("graft_bk_pq").toString
    PqIndex.ingest(spark, rootP, vecs.where(col("vec_id") < 250), batchKey = Some("b1"))
    val p2 = PqIndex.ingest(spark, rootP, vecs.where(col("vec_id") >= 250), batchKey = Some("b2"))
    val wantP = codeSet(p2.allCodes); CacheJanitor.drain()
    val repP = PqIndex.ingest(spark, rootP, vecs.where(col("vec_id") >= 250), batchKey = Some("b2"))
    assert(codeSet(repP.allCodes) == wantP)
    assert(repP.allCodes.count() == wantP.size, "no duplicate rows after replay")
    CacheJanitor.drain()
  }

  test("row-count sidecars: driver-side totals == footer counts; any gap falls back") {
    val root = Files.createTempDirectory("graft_bk_rows").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("b2"))
    CacheJanitor.drain()
    val log = s"$root/signatures"
    val footer = spark.read.parquet(log).count()
    assert(BatchLog.committedRowCount(spark, log).contains(footer),
      "sidecar total must equal the footer count")

    // Replay overwrites its directory — the sidecar must follow, not stack.
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("b2"))
    CacheJanitor.drain()
    assert(BatchLog.committedRowCount(spark, log).contains(footer))

    // A crashed sidecar write (simulated): the total must become None —
    // callers fall back to the footer job, never a wrong number.
    val p = Paths.get(BatchLog.dirOf(log, BatchLog.sanitize("b1")), "_row_count.json")
    Files.delete(p)
    assert(BatchLog.committedRowCount(spark, log).isEmpty,
      "a directory without a sidecar must force the footer fallback")
    Files.write(p, "{\"rows\": garbage".getBytes("UTF-8"))
    assert(BatchLog.committedRowCount(spark, log).isEmpty,
      "a torn sidecar must force the footer fallback, loudly, never throw")

    // Compaction rewrites the log into one fold directory WITH a fresh
    // sidecar — the fast path heals along with the stats chain. The
    // footer read must RESOLVE first: the versioned commit dropped the
    // reader-too-old sentinel at the logical top level (by design — a
    // raw read here is exactly the pre-upgrade read it refuses).
    SignatureIndex.compact(spark, root)
    assert(BatchLog.committedRowCount(spark, log)
      .contains(spark.read.parquet(BatchLog.resolve(spark, log)).count()))
  }

  test("keyless ingests still accumulate distinct auto-keyed batches") {
    val root = Files.createTempDirectory("graft_bk_auto").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*))
    SignatureIndex.ingest(spark, root, docs(batchB: _*))
    CacheJanitor.drain()
    assert(batchDirs(s"$root/signatures") == Seq("batch_key=a00001", "batch_key=a00002"))
    assert(SignatureIndex.readIndex(spark, root).count() == 6)
    CacheJanitor.drain()
  }

  test("replaying a batch folded away by compaction is a no-op — never a double-append") {
    val root = Files.createTempDirectory("graft_bk_retired").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("mb0"))
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("mb1"))
    CacheJanitor.drain()
    SignatureIndex.compact(spark, root)
    assert(SignatureIndex.readIndex(spark, root).count() == 6)
    // At-least-once crash replay of the LAST landing batch arrives
    // AFTER the fold absorbed it: the retirement ledger makes the
    // append a no-op instead of duplicating every row beside the fold.
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("mb1"))
    CacheJanitor.drain()
    assert(SignatureIndex.readIndex(spark, root).count() == 6,
      "a retired batch key must not double-append across compaction")
    // A genuinely NEW batch still lands normally.
    SignatureIndex.ingest(spark, root,
      docs(7L -> "yet another brand new document with fresh words inside"),
      batchKey = Some("mb2"))
    CacheJanitor.drain()
    assert(SignatureIndex.readIndex(spark, root).count() == 7)
    // Keyless (auto-numbered) appends never re-mint a retired number:
    // their rows must accumulate, not vanish into a no-op.
    SignatureIndex.ingest(spark, root,
      docs(8L -> "one more completely distinct document about file formats"))
    CacheJanitor.drain()
    assert(SignatureIndex.readIndex(spark, root).count() == 8,
      "an auto key colliding with a retired number would silently no-op")
  }

  test("compaction never retires an uncommitted partial — its replay still lands") {
    val root = Files.createTempDirectory("graft_bk_partial_compact").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("mb0"))
    CacheJanitor.drain()
    // Crash state: batch mb1's append died mid-write — its directory
    // holds only hidden task state, so its rows are NOT in any fold.
    val partial = s"$root/signatures/batch_key=${BatchLog.sanitize("mb1")}/_temporary"
    Files.createDirectories(Paths.get(partial))
    Files.write(Paths.get(s"$partial/part-x"), "partial".getBytes("UTF-8"))
    SignatureIndex.compact(spark, root)
    assert(SignatureIndex.readIndex(spark, root).count() == 3)
    // The at-least-once replay of mb1 must still LAND — retiring the
    // uncommitted key would have turned the replay into a permanent
    // no-op and lost the batch.
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("mb1"))
    CacheJanitor.drain()
    assert(SignatureIndex.readIndex(spark, root).count() == 6,
      "an uncommitted partial's key must not be retired by compaction")
  }

  test("pre-upgrade batch directories keep their replay idempotence") {
    val root = Files.createTempDirectory("graft_bk_upgrade").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("mb_0"))
    CacheJanitor.drain()
    // Simulate a root written by the pre-injective release: the same
    // caller key landed under the old lossy mapping (literal '_'), and
    // no legacy-name snapshot exists yet (that file is this release's).
    val sigs = Paths.get(s"$root/signatures")
    Files.move(sigs.resolve(s"batch_key=${BatchLog.sanitize("mb_0")}"),
      sigs.resolve("batch_key=bmb_0"))
    Files.deleteIfExists(sigs.resolve("_graft_legacy_keys"))
    // The replay must resolve to the ORIGINAL directory and overwrite
    // it — a second directory beside it would be the double-append the
    // key mechanism exists to prevent.
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("mb_0"))
    CacheJanitor.drain()
    assert(batchDirs(s"$root/signatures") == Seq("batch_key=bmb_0"),
      "a pre-upgrade directory must keep receiving its key's replays")
    assert(SignatureIndex.readIndex(spark, root).count() == 3)
    // The old name must keep working THROUGH a compaction: the fold
    // retires it (under the old name), so a later replay is a no-op,
    // not a double-append under the new mapping.
    SignatureIndex.compact(spark, root)
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("mb_0"))
    CacheJanitor.drain()
    assert(SignatureIndex.readIndex(spark, root).count() == 3,
      "a folded pre-upgrade key must stay retired across the upgrade")
    assert(batchDirs(s"$root/signatures").forall(_.startsWith("batch_key=a")),
      "the replay must not mint a new-mapping directory beside the fold")
  }

  test("a new-mapping directory is never hijacked through the legacy fallback") {
    val root = Files.createTempDirectory("graft_bk_hijack").toString
    // Key 1's NEW mapping escapes '_' to _005f: directory bx_005f0abc.
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("x_0abc"))
    // Key 2's OLD mapping ('*' collapsed to '_') is ALSO bx_005f0abc —
    // a live-probe fallback would resolve key 2 there and overwrite
    // key 1's batch. The legacy snapshot (written before key 1's
    // directory existed, hence empty) refuses the fallback.
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("x*005f0abc"))
    CacheJanitor.drain()
    assert(batchDirs(s"$root/signatures").size == 2,
      "a fresh root's keys must never resolve through the legacy mapping")
    assert(SignatureIndex.readIndex(spark, root).count() == 6)
  }

  test("a key whose new mapping lands on another key's pre-upgrade name is refused") {
    val root = Files.createTempDirectory("graft_bk_collide").toString
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("k0"))
    CacheJanitor.drain()
    // Simulate a pre-upgrade root holding a directory whose old-mapping
    // name equals the NEW mapping of the (different) key "x_0abc".
    val sigs = Paths.get(s"$root/signatures")
    Files.move(sigs.resolve(s"batch_key=${BatchLog.sanitize("k0")}"),
      sigs.resolve("batch_key=bx_005f0abc"))
    Files.deleteIfExists(sigs.resolve("_graft_legacy_keys"))
    // Neither overwriting the old batch nor silently swallowing the new
    // one is acceptable — the ambiguity must refuse loudly.
    val e = intercept[IllegalArgumentException](
      SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("x_0abc")))
    assert(e.getMessage.contains("pre-upgrade"), e.getMessage)
    CacheJanitor.drain()
    assert(SignatureIndex.readIndex(spark, root).count() == 3,
      "the refused append must leave the old batch untouched")
  }

  test("compaction retires only the batches its fold actually read") {
    val root = Files.createTempDirectory("graft_bk_race").toString
    val dest = s"$root/signatures"
    val tmp = s"$dest.__compact_tmp"
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("mb0"))
    CacheJanitor.drain()
    // The fold frame lists the log's files NOW (scan snapshot)…
    val fold = SignatureIndex.readIndex(spark, root)
    // …then a racing at-least-once replay commits batch mb1 — AFTER the
    // listing, so the fold holds none of its rows.
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("mb1"))
    CacheJanitor.drain()
    BatchLog.stageRewrite(fold, dest, tmp)
    Tombstones.commitCompaction(spark, root, tmp, dest)
    // mb1's directory died in the swap — but its key must NOT be
    // retired (the fold never absorbed it), so the replay still lands
    // the batch instead of being vetoed forever.
    assert(SignatureIndex.readIndex(spark, root).count() == 3)
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("mb1"))
    CacheJanitor.drain()
    assert(SignatureIndex.readIndex(spark, root).count() == 6,
      "a batch committing after the fold's listing must stay replayable")
  }

  test("a crashed refreeze sealed under the old side-by-side layout installs its quantizer on recovery") {
    val root = Files.createTempDirectory("graft_bk_oldstage").toString
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding")
    AnnIndex.ingest(spark, root, vecs.where(col("vec_id") < 100))
    CacheJanitor.drain()
    // Fabricate the crash state the PREVIOUS release could leave:
    // quantizer staged side-by-side, codes staged, marker landed,
    // commit never ran.
    val qtmp = s"$root/quantizer.__refreeze_tmp"
    spark.read.parquet(s"$root/quantizer/centroids")
      .coalesce(1).write.parquet(s"$qtmp/centroids")
    spark.read.parquet(s"$root/quantizer/stats")
      .coalesce(1).write.parquet(s"$qtmp/stats")
    val stagedParts = Files.list(Paths.get(s"$qtmp/centroids")).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    val ctmp = s"$root/codes.__refreeze_tmp"
    BatchLog.stageRewrite(
      BatchLog.read(spark, s"$root/codes", "test"), s"$root/codes", ctmp,
      partitionBy = Seq("cell"))
    RefreezeProtocol.sealStage(spark, ctmp, "ann")
    // Any entry point triggers recovery; committing the staged codes
    // while skipping the staged quantizer would serve new codes under
    // the old centroids — the quantizer must install from the old tmp.
    val q0 = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(AnnIndex.topK(spark, root, q0, k = 1).count() == 1)
    CacheJanitor.drain()
    assert(!Files.exists(Paths.get(qtmp)), "the staged quantizer must be consumed, not skipped")
    assert(!Files.exists(Paths.get(ctmp)))
    // Since r19 recovery UPGRADES a legacy stage into the versioned
    // pair protocol: the staged quantizer rides the codes commit as
    // `codes/_versions/<n>/_quantizer` (one committed state — a read
    // can never pair the new codes with the old centroids), while the
    // top-level `quantizer` dir stays untouched as the fallback for
    // readers still pinned to pre-refreeze versions.
    val resolved = BatchLog.resolve(spark, s"$root/codes")
    assert(resolved.contains("_versions"),
      "recovery must commit the legacy stage through the versioned protocol")
    val installedParts = Files.list(Paths.get(s"$resolved/_quantizer/centroids"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet
    assert(installedParts == stagedParts,
      "recovery must install the quantizer the crashed refreeze staged, in-version")
  }

  test("refreeze refuses a corpus with missing or duplicate live ids") {
    val root = Files.createTempDirectory("graft_bk_refreeze_corpus").toString
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding")
    AnnIndex.ingest(spark, root, vecs.where(col("vec_id") < 100))
    CacheJanitor.drain()
    val missing = intercept[IllegalArgumentException](
      AnnIndex.refreeze(spark, root, vecs.where(col("vec_id") < 50)))
    assert(missing.getMessage.contains("missing"), missing.getMessage)
    val dups = intercept[IllegalArgumentException](
      AnnIndex.refreeze(spark, root,
        vecs.where(col("vec_id") < 100).unionAll(vecs.where(col("vec_id") === 7))))
    assert(dups.getMessage.contains("duplicate"), dups.getMessage)
    // The aborts left the index untouched and still answering.
    val q0 = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(AnnIndex.topK(spark, root, q0, k = 1).count() == 1)
    CacheJanitor.drain()
  }

  test("distinct caller keys always land in distinct batch directories") {
    val root = Files.createTempDirectory("graft_bk_inject").toString
    // These two keys differ only in a character the old lossy sanitize
    // collapsed to '_' — a collision would make batch 2 OVERWRITE
    // batch 1 through the replay-idempotent mode(overwrite).
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("2026:01"))
    SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("2026_01"))
    CacheJanitor.drain()
    assert(batchDirs(s"$root/signatures").size == 2,
      "distinct caller keys must map to distinct directories")
    assert(SignatureIndex.readIndex(spark, root).count() == 6)
  }

  test("a crash mid-FIRST-append leaves a partial the replay repairs — reads see empty, not an error") {
    val root = Files.createTempDirectory("graft_bk_partial").toString
    val labels = s"$root/labels"
    // Simulate the crash state: the batch directory exists but holds
    // only uncommitted _temporary task state (no committed data files).
    Files.createDirectories(Paths.get(s"$labels/batch_key=bmb0/_temporary"))
    Files.write(Paths.get(s"$labels/batch_key=bmb0/_temporary/part-x"),
      "partial".getBytes("UTF-8"))
    Files.write(Paths.get(s"$labels/${BatchLog.markerName}"), Array.empty[Byte])
    // Reads must classify this as EMPTY (not throw schema inference
    // errors on a log whose only batch is hidden task state).
    assert(ClusterLabels.read(spark, root).count() == 0)
    assert(ClusterLabels.latestBatch(spark, root) == 0L)
    // The at-least-once replay of the same batch key overwrites the
    // partial directory and the merge proceeds normally.
    ClusterLabels.merge(spark, root,
      Seq((1L, 2L)).toDF("doc_a", "doc_b"),
      Seq(1L, 2L, 3L).toDF("doc_id"), batchKey = Some("mb0"))
    CacheJanitor.drain()
    val got = ClusterLabels.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), got)
  }

  test("a legacy flat label log is refused loudly on READ paths and migrates in place") {
    val root = Files.createTempDirectory("graft_bk_legacy_labels").toString
    // Pre-batch-format label log: flat parquet rows, no marker.
    Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 3L, 2L))
      .toDF("doc_id", "label", "batch")
      .write.mode("append").parquet(s"$root/labels")
    // Every read path must refuse — a silent empty read here would
    // ignore the entire accumulated label history.
    for (probe <- Seq(
      () => ClusterLabels.read(spark, root).collect(),
      () => { ClusterLabels.latestBatch(spark, root); () },
      () => { ClusterLabels.logDepth(spark, root); () })) {
      val e = intercept[IllegalArgumentException](probe())
      assert(e.getMessage.contains("legacy"), e.getMessage)
    }
    ClusterLabels.migrateLegacy(spark, root)
    val got = ClusterLabels.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    assert(ClusterLabels.latestBatch(spark, root) == 2L)
  }

  test("a legacy flat-append root is refused loudly and migrates in place") {
    val root = Files.createTempDirectory("graft_bk_legacy").toString
    // Simulate a pre-change index: flat parquet files, UNSORTED shingle
    // arrays (array_distinct order), no format marker.
    val legacyRows = SignatureIndex.signatures(docs(batchA: _*))
      .select(col("doc_id"), reverse(col("shs")).as("shs"))
    legacyRows.write.mode("append").parquet(s"$root/signatures")

    val e = intercept[IllegalArgumentException](
      SignatureIndex.readIndex(spark, root).collect())
    assert(e.getMessage.contains("legacy"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      SignatureIndex.ingest(spark, root, docs(batchB: _*)))
    assert(e2.getMessage.contains("legacy"), e2.getMessage)
    CacheJanitor.drain()

    // Migration re-sorts rows (the intersect kernel's precondition) and
    // adopts the batch-keyed layout; ingest then proceeds normally.
    SignatureIndex.migrateLegacy(spark, root)
    val migrated = SignatureIndex.readIndex(spark, root)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(migrated.keySet == Set(1L, 2L, 3L))
    assert(migrated.values.forall(s => s == s.sorted), "migration must re-sort signatures")
    val b2 = SignatureIndex.ingest(spark, root, docs(batchB: _*), batchKey = Some("b2"))
    // Post-migration pair detection is exact: the cross-batch exact dup
    // (3,6) at jaccard 1.0 must surface — it is precisely the pair an
    // unsorted legacy row would have silently dropped.
    assert(pairSet(b2.deltaPairs).contains((3L, 6L)))
    CacheJanitor.drain()
  }

  // ----------------------- swap-intent cross-protocol recovery (r16 HIGH)

  private def writeIntent(dest: String, tmp: String, root: Option[String]): Unit = {
    val body = graft.sources.MiniJson.renderFlat(
      Map("v" -> "2", "tmp" -> tmp) ++ root.map(r => "root" -> r))
    Files.write(Paths.get(s"$dest.__swap_intent"), (body + "\n").getBytes("UTF-8"))
    ()
  }

  test("a finished MIGRATE's dangling intent must not make compaction recovery clear tombstones") {
    // The r16 advisory's HIGH finding: adoptLegacy commits via
    // commitSwap(dest.__migrate_tmp, dest); a crash after its rename but
    // before the intent delete leaves the marker with NO tmp on disk.
    // The old (dest-keyed, content-less) marker made the next reader's
    // recoverCompaction — probing its OWN __compact_tmp, absent —
    // conclude "rename finished", drop the intent, and DELETE the
    // tombstone side table: removed ids silently resurfacing. The v2
    // marker records the swap; a migrate intent never clears tombstones.
    val root = Files.createTempDirectory("graft_bk_intent1").toString
    val dest = s"$root/signatures"
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    CacheJanitor.drain()
    SignatureIndex.remove(spark, root, Seq(2L))
    assert(!SignatureIndex.readIndex(spark, root).collect().map(_.getLong(0)).contains(2L))
    // Crash state: migrate's rename FINISHED (tmp gone), intent remains.
    writeIntent(dest, s"$dest.__migrate_tmp", root = None)
    // Any reader path runs recoverCompaction(root, dest.__compact_tmp, dest).
    val ids = SignatureIndex.readIndex(spark, root).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L),
      s"a foreign (migrate) intent must not clear the tombstone table: $ids")
    assert(!Files.exists(Paths.get(s"$dest.__swap_intent")),
      "recovery must clear the completed swap's intent")
    CacheJanitor.drain()
  }

  test("a MIGRATE crashed mid-swap is completed from ITS recorded tmp by any recoverer") {
    val root = Files.createTempDirectory("graft_bk_intent2").toString
    val dest = s"$root/signatures"
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    CacheJanitor.drain()
    val want = SignatureIndex.readIndex(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    // Crash state: the staged migrate tmp is complete, dest was deleted,
    // the rename never ran (the delete-to-rename window), intent present.
    val tmp = s"$dest.__migrate_tmp"
    Files.move(Paths.get(dest), Paths.get(tmp))
    writeIntent(dest, tmp, root = None)
    // The reader's compaction recovery (probing __compact_tmp) must
    // adopt the RECORDED migrate tmp, not conclude completion over a
    // missing dest.
    val got = SignatureIndex.readIndex(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(got == want, "recovery must complete the recorded swap")
    assert(!Files.exists(Paths.get(tmp)) && !Files.exists(Paths.get(s"$dest.__swap_intent")))
    CacheJanitor.drain()
  }

  test("a compaction intent whose tombstone clear was lost is completed — table cleared — by recovery") {
    val root = Files.createTempDirectory("graft_bk_intent3").toString
    val dest = s"$root/signatures"
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    CacheJanitor.drain()
    SignatureIndex.remove(spark, root, Seq(2L))
    SignatureIndex.compact(spark, root) // clean commit: tombstones cleared
    CacheJanitor.drain()
    // Crash state: rename finished, tombstone clear + intent delete lost
    // (the dest fold already excludes id 2; the side table still lists it).
    Tombstones.append(root, Seq(2L).toDF("doc_id"), "doc_id")
    writeIntent(dest, s"$dest.__compact_tmp", root = Some(root))
    val ids = SignatureIndex.readIndex(spark, root).collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
    assert(graft.operators.Tombstones.bytesOnDisk(spark, root) == 0L,
      "recovery must re-run the recorded compaction's tombstone clear")
    assert(!Files.exists(Paths.get(s"$dest.__swap_intent")))
    CacheJanitor.drain()
  }

  test("a torn (empty) intent marker is dropped and a partial abandoned stage is NOT adopted") {
    val root = Files.createTempDirectory("graft_bk_intent4").toString
    val dest = s"$root/signatures"
    SignatureIndex.ingest(spark, root, docs(batchA: _*), batchKey = Some("b1"))
    CacheJanitor.drain()
    val want = SignatureIndex.readIndex(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    // Crash state: a writer died INSIDE the marker write (zero bytes
    // landed) — before any destructive step — with a PARTIAL abandoned
    // stage from an earlier unrelated crash also on disk. Recovery must
    // trust dest (no destructive step ran) and drop the partial stage,
    // never adopt it.
    val tmp = Paths.get(s"$dest.__compact_tmp")
    Files.createDirectories(tmp)
    Files.write(tmp.resolve("garbage.parquet"), "not parquet".getBytes("UTF-8"))
    Files.write(Paths.get(s"$dest.__swap_intent"), Array.empty[Byte])
    val got = SignatureIndex.readIndex(spark, root)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(got == want, "a torn marker must leave dest authoritative")
    assert(!Files.exists(tmp), "the partial abandoned stage must be dropped")
    assert(!Files.exists(Paths.get(s"$dest.__swap_intent")))
    CacheJanitor.drain()
  }
}
