package graft

import java.nio.file.{Files, Paths}

import graft.functions.TextSim
import graft.operators.{BatchLog, CosineDedupIndex, RefreezeProtocol}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The BatchLog × refreeze CROSS PRODUCT: each protocol's crash windows
  * are pinned separately (RefreezeSpec, IngestRecoverySpec, BatchLogSpec)
  * — these are the interactions between them, where an at-least-once
  * batch replay races a refreeze's stage/commit lifecycle. The failure
  * shapes guarded here: a replayed batch double-appending beside a fold
  * that already absorbed it (resurrecting removed rows and duplicating
  * live ones), and a fold commit swallowing a batch it never read. */
class RefreezeChaosSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def vecs: DataFrame =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")
  private def slice(lo: Long, hi: Long) =
    vecs.where(s"vec_id >= $lo AND vec_id < $hi")

  private def liveIds(root: String): Seq[Long] =
    CosineDedupIndex.readIndex(spark, root)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted

  test("a batch replayed WHILE a sealed refreeze stage is pending commits the fold first, then no-ops") {
    val root = Files.createTempDirectory("graft_chaos_replay").toString
    CosineDedupIndex.ingest(spark, root, slice(0, 200), batchKey = Some("b1"))
    CosineDedupIndex.ingest(spark, root, slice(200, 400), batchKey = Some("b2"))
    CosineDedupIndex.remove(spark, root, Seq(5L))
    CacheJanitor.drain()

    // The refreeze crashes between sealing its stage and committing —
    // staged via the REAL rewrite path (BatchLog.stageRewrite), so the
    // retirement ledger rides the stage exactly as refreeze leaves it.
    val live = CosineDedupIndex.readIndex(spark, root)
    val newMask = TextSim.lshMaskValue(live.count()).toLong
    val tmp = s"$root/codes.__refreeze_tmp"
    BatchLog.stageRewrite(CosineDedupIndex.encode(
      live.select(col("vec_id"), col("embedding")), newMask), s"$root/codes", tmp)
    RefreezeProtocol.sealStage(spark, tmp, newMask.toString)
    CacheJanitor.drain()

    // The at-least-once landing layer now REPLAYS batch b2 against this
    // root. Recovery must run first (committing the marked stage — which
    // absorbed b2's rows into the fold and retired its key), and only
    // then resolve the replay, which the ledger vetoes as a no-op. Any
    // other order double-appends b2 beside the fold and resurrects the
    // tombstoned id 5.
    CosineDedupIndex.ingest(spark, root, slice(200, 400), batchKey = Some("b2"))
    CacheJanitor.drain()

    assert(!Files.isDirectory(Paths.get(tmp)), "the sealed stage must have committed")
    assert(CosineDedupIndex.frozenMask(spark, root).contains(newMask),
      "recovery inside the replayed ingest must install the refrozen mask")
    val ids = liveIds(root)
    assert(ids.size == ids.distinct.size,
      "the replayed batch must not double-append beside the fold")
    assert(ids == (0L until 400L).filterNot(_ == 5L),
      s"fold content must survive the replay (got ${ids.size} rows; " +
        s"id 5 present: ${ids.contains(5L)})")
    assert(BatchLog.retiredKeys(spark, s"$root/codes").contains(BatchLog.sanitize("b2")),
      "the fold must retire the absorbed batch key")

    // A genuinely NEW batch after the dust settles still lands normally.
    CosineDedupIndex.ingest(spark, root, slice(400, 450), batchKey = Some("b3"))
    CacheJanitor.drain()
    assert(liveIds(root).size == 449)
  }

  test("refreeze recovery over a root whose last batch was a replayed (overwritten) key") {
    val root = Files.createTempDirectory("graft_chaos_overwrite").toString
    CosineDedupIndex.ingest(spark, root, slice(0, 200), batchKey = Some("b1"))
    CosineDedupIndex.ingest(spark, root, slice(200, 400), batchKey = Some("b2"))
    // b2 replays once BEFORE any refreeze — mode(overwrite) rewrote its
    // directory with fresh files (new names/mtimes), the state BatchLog's
    // replay idempotence leaves behind.
    CosineDedupIndex.ingest(spark, root, slice(200, 400), batchKey = Some("b2"))
    CosineDedupIndex.remove(spark, root, Seq(5L))
    CacheJanitor.drain()
    assert(liveIds(root).size == 399, "overwrite replay itself must not duplicate")

    // Refreeze stages over those REWRITTEN files, seals, then crashes
    // before commit. The fold's retirement set comes from the files its
    // plan actually read — the overwritten directory's current files.
    val live = CosineDedupIndex.readIndex(spark, root)
    val newMask = TextSim.lshMaskValue(live.count()).toLong
    val tmp = s"$root/codes.__refreeze_tmp"
    BatchLog.stageRewrite(CosineDedupIndex.encode(
      live.select(col("vec_id"), col("embedding")), newMask), s"$root/codes", tmp)
    RefreezeProtocol.sealStage(spark, tmp, newMask.toString)
    CacheJanitor.drain()

    // Recovery fires from an ops POLL (health), not a mutation — the
    // weakest entry point must complete the commit identically.
    val h = CosineDedupIndex.health(spark, root)
    assert(h.live == 399 && h.tombstoned == 0,
      s"health must adopt the sealed refreeze (tombstone folded): $h")
    assert(h.frozenCells == newMask, h)
    assert(!Files.isDirectory(Paths.get(tmp)))

    // b2's SECOND replay, arriving after the recovery: the ledger must
    // veto it even though the key's directory was overwritten (not
    // original) when the fold read it. A resurrection of id 5 here is
    // the tombstone-loss shape this spec exists to catch.
    CosineDedupIndex.ingest(spark, root, slice(200, 400), batchKey = Some("b2"))
    CacheJanitor.drain()
    val ids = liveIds(root)
    assert(ids.size == 399 && !ids.contains(5L),
      s"post-recovery replay must be a no-op (got ${ids.size} rows; " +
        s"id 5 resurrected: ${ids.contains(5L)})")
  }
}
