package graft

import java.nio.file.Files

import graft.functions.TextSim
import graft.operators.{AnnIndex, CosineDedupIndex, IndexHealth, PqIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One ops-snapshot shape across the persisted index family: fields
  * pinned through the ingest → remove → refreeze lifecycle for all
  * three vector operators, so a scheduler can poll any index kind
  * through the same struct ([[IndexHealth]]). */
class IndexHealthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def vecs: DataFrame =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")

  test("virgin roots report zeros, never throw") {
    val r = Files.createTempDirectory("graft_ih_virgin").toString
    val want = IndexHealth(0, 0, 0, 0, 0.0, needsRefreeze = false)
    assert(CosineDedupIndex.health(spark, r) == want)
    assert(AnnIndex.health(spark, s"$r/ann") == want)
    assert(PqIndex.health(spark, s"$r/pq") == want)
  }

  test("cosine index: fields track the lifecycle; occupancy agrees with the operator") {
    val root = Files.createTempDirectory("graft_ih_cos").toString
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") < 100),
      batchKey = Some("b1"))
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") >= 100),
      batchKey = Some("b2"))
    CosineDedupIndex.remove(spark, root, Seq(3L, 7L, 11L))
    CacheJanitor.drain()

    val h = CosineDedupIndex.health(spark, root)
    assert(h.live == 497 && h.tombstoned == 3, h)
    assert(h.frozenCells == TextSim.lshMaskValue(100L).toLong, h)
    assert(h.occupiedCells > 0 && h.occupiedCells <= h.frozenCells, h)
    assert(math.abs(h.occupancy - CosineDedupIndex.occupancy(spark, root)) < 1e-9, h)
    assert(h.occupancy == h.live.toDouble / h.occupiedCells, h)
    // Drift predicate agrees with the operator's own (497 is two ladder
    // steps past the 100-row freeze).
    assert(h.needsRefreeze && CosineDedupIndex.needsRefreeze(spark, root), h)

    CosineDedupIndex.refreeze(spark, root)
    CacheJanitor.drain()
    val h2 = CosineDedupIndex.health(spark, root)
    assert(h2.live == 497 && h2.tombstoned == 0, s"refreeze folds tombstones: $h2")
    assert(h2.frozenCells == TextSim.lshMaskValue(497L).toLong, h2)
    assert(!h2.needsRefreeze, h2)
    assert(h2.occupancy < h.occupancy,
      s"the wider mask must relieve occupancy: ${h.occupancy} -> ${h2.occupancy}")
  }

  test("IVF-SQ8 and IVF-PQ: same shape, frozen-cell counts from the quantizer") {
    val aroot = Files.createTempDirectory("graft_ih_ann").toString
    AnnIndex.ingest(spark, aroot, vecs.where(col("vec_id") < 100), batchKey = Some("b1"))
    AnnIndex.ingest(spark, aroot, vecs.where(col("vec_id") >= 100), batchKey = Some("b2"))
    AnnIndex.remove(spark, aroot, Seq(5L, 17L))
    CacheJanitor.drain()
    val ha = AnnIndex.health(spark, aroot)
    assert(ha.live == 498 && ha.tombstoned == 2, ha)
    assert(ha.frozenCells == TextSim.ivfCellsValue(100L).toLong, ha)
    assert(ha.occupiedCells > 0 && ha.occupiedCells <= ha.frozenCells, ha)
    assert(ha.occupancy == ha.live.toDouble / ha.occupiedCells, ha)
    assert(ha.needsRefreeze && AnnIndex.needsRefreeze(spark, aroot), ha)
    AnnIndex.refreeze(spark, aroot, vecs)
    CacheJanitor.drain()
    val ha2 = AnnIndex.health(spark, aroot)
    assert(ha2.live == 498 && ha2.tombstoned == 0 && !ha2.needsRefreeze, ha2)
    assert(ha2.frozenCells == TextSim.ivfCellsValue(498L).toLong, ha2)

    val proot = Files.createTempDirectory("graft_ih_pq").toString
    PqIndex.ingest(spark, proot, vecs.where(col("vec_id") < 100), batchKey = Some("b1"))
    PqIndex.remove(spark, proot, Seq(9L))
    CacheJanitor.drain()
    val hp = PqIndex.health(spark, proot)
    assert(hp.live == 99 && hp.tombstoned == 1, hp)
    assert(hp.frozenCells == TextSim.ivfCellsValue(100L).toLong, hp)
    assert(!hp.needsRefreeze && hp.occupancy == hp.live.toDouble / hp.occupiedCells, hp)
  }

  test("health recovers a crashed compaction swap before probing (no false live=0)") {
    import java.nio.file.Paths
    import graft.operators.BatchLog
    val root = Files.createTempDirectory("graft_ih_swap").toString
    CosineDedupIndex.ingest(spark, root, vecs.where(col("vec_id") < 100),
      batchKey = Some("b1"))
    CacheJanitor.drain()
    val dest = s"$root/codes"
    val tmp = s"$dest.__compact_tmp"
    BatchLog.stageRewrite(CosineDedupIndex.readIndex(spark, root), dest, tmp)
    CacheJanitor.drain()
    // Crash window: dest deleted, rename never ran.
    org.apache.commons.io.FileUtils.deleteDirectory(Paths.get(dest).toFile)
    val h = CosineDedupIndex.health(spark, root)
    assert(h.live == 100, s"health must adopt the staged compaction, got $h")
    assert(!java.nio.file.Files.exists(Paths.get(tmp)),
      "recovery must complete the swap, not leave the stage behind")
  }
}
