package graft

import java.nio.file.Files

import graft.operators.{BatchLog, CosineDedupIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The bucket-group fold layout + pruned probe read (round-14: the r13
  * verdict's "last corpus-linear term"). Pins, on a synthetic root big
  * enough for a real ladder step (5000 vectors → mask 512, fold groups
  * 512/16 = 32, SIGNED embeddings so buckets spread and every group is
  * occupied):
  *
  *  1. compaction writes the fold under `pgrp=` directories with the
  *     group-count sidecar, and every read path (readIndex, counts)
  *     stays correct over the MIXED fold+flat layout;
  *  2. a small increment's probe view reads EXACTLY the probed groups'
  *     fold files — asserted from the executed scan's `numFiles` metric
  *     (partition-filter pruning is invisible to the analyzed plan's
  *     FileIndex listing, unlike SignatureIndexSpec's dir-list pruning);
  *  3. the pruned pair answer is EXACTLY the full-frame answer — same
  *     pairs, same cosines — including a planted exact duplicate whose
  *     pair must survive pruning;
  *  4. a second compaction over the mixed layout folds everything back
  *     into one partitioned directory without losing rows;
  *  5. saturated shapes (tiny group count) gate back to the full read.
  */
class CosinePruneSpec extends SparkSpec {

  private def vecs(ids: Seq[Long], of: Long => Long = identity): DataFrame = {
    import spark.implicits._
    // Deterministic SIGNED pseudo-random 8-dim embeddings (an LCG-ish
    // per-(id, dim) hash, mixed signs — diverse sign codes so the
    // bucket space is well covered); `of` lets an increment id carry a
    // CLONE of a corpus id's embedding (guaranteed cosine-1 pair).
    ids.map(i => (i, of(i))).toDF("vec_id", "src")
      .selectExpr("vec_id",
        "transform(sequence(0, 7), i -> " +
          "CAST((((src * 2654435761 + (i + 1) * (src + 40503) * 69069) % 1024) - 512) / 512.0 AS FLOAT)) AS embedding")
      .drop("src")
  }

  /** Files actually READ by the frame's scans over `substr`-rooted
    * relations, from the executed plan's numFiles metric — partition
    * filters prune at physical planning, so this (not the logical
    * FileIndex listing) is where `pgrp=` pruning is observable. */
  private def scannedFiles(df: DataFrame, substr: String): Long = {
    // Execute THIS Dataset's own plan (df.count() would build a fresh
    // QueryExecution and leave these scan nodes' metrics untouched).
    df.queryExecution.toRdd.count()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(substr)))
      .map(_.metrics("numFiles").value).sum
  }

  private def pairMap(df: DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("fold layout: pruned probe reads only probed pgrp files; answer == full frame") {
    val root = Files.createTempDirectory("graft_cosprune").toString
    CosineDedupIndex.ingest(spark, root, vecs(0L until 5000L), batchKey = Some("b1"))
    CacheJanitor.drain()
    val mask = CosineDedupIndex.frozenMask(spark, root).get
    assert(mask == 512L, s"ladder step moved? mask=$mask")
    val g = CosineDedupIndex.pgrpGroupsFor(mask)
    assert(g == 32)

    CosineDedupIndex.compact(spark, root)
    val codes = s"$root/codes"
    val foldKeys = BatchLog.partitionedKeys(spark, codes, CosineDedupIndex.pgrpCol)
    assert(foldKeys.size == 1, s"one partitioned fold expected, got $foldKeys")
    // Signed embeddings spread the code: every group occupied, one file
    // each (the fold's repartition lands each group whole in one task).
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val foldDir = new org.apache.hadoop.fs.Path(
      BatchLog.dirOfResolved(spark, codes, foldKeys.head))
    val occupiedGroups = fs.listStatus(foldDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("pgrp="))
      .map(_.getPath.getName.stripPrefix("pgrp=").toInt).toSet
    assert(occupiedGroups.size >= g - 4,
      s"diverse corpus should occupy ~all $g groups: $occupiedGroups")
    // Mixed-safe reads stay correct over the partitioned fold.
    assert(CosineDedupIndex.readIndex(spark, root).count() == 5000L)
    assert(!CosineDedupIndex.readIndex(spark, root).columns.contains("pgrp"),
      "pgrp is a layout artifact, never a row column")

    // Tiny increment: vec 9001 clones corpus vec 7's embedding (cosine
    // 1.0 — the pair MUST survive pruning), vec 9002 is novel content.
    val b2 = CosineDedupIndex.ingest(spark, root,
      vecs(Seq(9001L, 9002L), of = id => if (id == 9001L) 7L else id),
      batchKey = Some("b2"))
    val prunedPairs = pairMap(b2.deltaPairs)
    val full = CosineDedupIndex.deltaPairs(
      CosineDedupIndex.readIndex(spark, root), b2.newCodes, Some(mask))
    assert(prunedPairs == pairMap(full),
      "pruned probe must equal the full-frame answer exactly")
    assert(prunedPairs.contains((7L, 9001L)),
      s"the planted clone pair must survive pruning: ${prunedPairs.keySet}")

    // Scan-file pin: the pruned live view reads EXACTLY the probed
    // groups' fold files (1 file/group) — the full view reads all g.
    val probedGroups = b2.newCodes.select("bucket").collect().map(_.getLong(0))
      .flatMap(b => b +: (0 until graft.functions.TextSim.lshPlanes).map(j => b ^ (1L << j)))
      .filter(_ < mask).map(p => (p % g).toInt).distinct.toSet
    assert(probedGroups.size < g, s"spec shape broken: probes saturate the $g groups")
    val prunedView = CosineDedupIndex.prunedLive(spark, root, b2.newCodes, mask,
      BatchLog.sanitize("b2")).get
    val foldFilesPruned = scannedFiles(
      prunedView.where(col("vec_id") < 9000L), s"batch_key=${foldKeys.head}")
    assert(foldFilesPruned == (probedGroups & occupiedGroups).size.toLong,
      s"pruned view must read exactly the probed occupied groups' files " +
        s"(${(probedGroups & occupiedGroups).size}), read $foldFilesPruned")
    val foldFilesFull = scannedFiles(
      CosineDedupIndex.readIndex(spark, root).where(col("vec_id") < 9000L),
      s"batch_key=${foldKeys.head}")
    assert(foldFilesFull == occupiedGroups.size.toLong,
      s"full view must read all ${occupiedGroups.size} fold files, read $foldFilesFull")
    assert(foldFilesPruned < foldFilesFull,
      "the pruning must actually bind at this shape")

    // Second compaction over the MIXED layout: one fold again, no rows
    // lost, pruning re-engages for the next increment.
    CosineDedupIndex.compact(spark, root)
    assert(CosineDedupIndex.readIndex(spark, root).count() == 5002L)
    assert(BatchLog.partitionedKeys(spark, codes, CosineDedupIndex.pgrpCol).size == 1)
    val b3 = CosineDedupIndex.ingest(spark, root,
      vecs(Seq(9003L), of = _ => 7L), batchKey = Some("b3"))
    val p3 = pairMap(b3.deltaPairs)
    assert(p3 == pairMap(CosineDedupIndex.deltaPairs(
      CosineDedupIndex.readIndex(spark, root), b3.newCodes, Some(mask))))
    assert(p3.contains((7L, 9003L)) && p3.contains((9001L, 9003L)),
      s"clone pairs through the re-fold must survive: ${p3.keySet}")
    CacheJanitor.drain()
  }

  test("saturated or sidecar-less folds take the full read — never a wrong prune") {
    val root = Files.createTempDirectory("graft_cosprune_gate").toString
    // 300 vectors → mask 32, groups 32/16 = 2: ANY increment's probe
    // set saturates 2 groups, so the gate must keep the full read.
    CosineDedupIndex.ingest(spark, root, vecs(0L until 300L), batchKey = Some("b1"))
    CosineDedupIndex.compact(spark, root)
    val mask = CosineDedupIndex.frozenMask(spark, root).get
    val b2 = CosineDedupIndex.ingest(spark, root,
      vecs(Seq(901L), of = _ => 7L), batchKey = Some("b2"))
    assert(CosineDedupIndex.prunedLive(spark, root, b2.newCodes, mask,
      BatchLog.sanitize("b2")).isEmpty,
      "a saturating probe set must gate back to the full read")
    assert(pairMap(b2.deltaPairs) == pairMap(CosineDedupIndex.deltaPairs(
      CosineDedupIndex.readIndex(spark, root), b2.newCodes, Some(mask))))
    assert(pairMap(b2.deltaPairs).contains((7L, 901L)))
    CacheJanitor.drain()
  }
}
