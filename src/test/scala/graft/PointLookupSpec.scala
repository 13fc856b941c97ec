package graft

import java.nio.file.Files

import graft.operators.{BatchLog, CosineDedupIndex, SignatureIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The point-lookup fold layout, ADOPTED in the production fold writes
  * (r19; priced r18 — SCALEBENCH_r18_pointlookup: id-sorted rows +
  * ~1 MB row groups turn a pushed `In(id)` into a row-group-pruned
  * read, ×0.08 bytes at k=1), and the `fetch` road that consumes it:
  *
  *  1. `SignatureIndex.fetch` answers EXACTLY `readIndex` filtered to
  *     the probe ids, on the flat layout AND through the lifecycle
  *     (ingest → tombstone → compact) — removed ids never resurface;
  *  2. on a `dgrp=` fold, fetch's executed scan reads ONLY the files
  *     of the groups the probe ids hash into, with the id set PUSHED
  *     to parquet (the literal-In precondition the r18 pricing
  *     measured — session `inFilterThreshold` = 1024);
  *  3. compaction writes each group's rows id-SORTED (the min/max
  *     window precondition for row-group pruning);
  *  4. `CosineDedupIndex.fetch` matches its `readIndex` filter through
  *     the same lifecycle (bucket-grouped folds: no partition filter,
  *     row-group pruning only — the documented shape).
  */
class PointLookupSpec extends SparkSpec {
  import spark.implicits._

  private def withFoldProps[T](rowsFloor: Long, groupBytes: Long)(body: => T): T = {
    val keys = Seq("graft.fold.min.rows" -> rowsFloor.toString,
      "graft.fold.group.bytes" -> groupBytes.toString)
    val prev = keys.map { case (k, _) => k -> sys.props.get(k) }
    keys.foreach { case (k, v) => sys.props(k) = v }
    try body
    finally prev.foreach {
      case (k, Some(v)) => sys.props(k) = v
      case (k, None) => sys.props -= k
    }
  }

  /** Executed-plan scans over relations rooted under `substr`. */
  private def scansOf(df: DataFrame, substr: String): Seq[FileSourceScanExec] = {
    df.queryExecution.toRdd.count()
    collectScans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(substr)))
  }

  private def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
    case q: QueryStageExec => collectScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case o => o.children.flatMap(collectScans)
  }

  private def rowsOf(df: DataFrame): Set[(Long, Seq[Long])] =
    df.select(col("doc_id"), col("shs")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet

  test("SignatureIndex.fetch == readIndex filter through ingest → tombstone → compact (flat layout)") {
    val root = Files.createTempDirectory("graft_plkflat").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    SignatureIndex.ingest(spark, root, docs, batchKey = Some("b1"))
    CacheJanitor.drain()
    val probe = Seq(5L, 16L, 27L, 38L, 49L, 60L)
    SignatureIndex.remove(spark, root, probe.filter(_ % 2 == 0))
    // Pre-compact: tombstones must already mask the fetch.
    val preFetch = rowsOf(SignatureIndex.fetch(spark, root, probe))
    assert(preFetch.forall(r => r._1 % 2 == 1), "tombstoned ids masked before compact")
    SignatureIndex.compact(spark, root)
    CacheJanitor.drain()
    val expected = rowsOf(
      SignatureIndex.readIndex(spark, root).where(col("doc_id").isin(probe.map(Long.box): _*)))
    val got = rowsOf(SignatureIndex.fetch(spark, root, probe))
    assert(got == expected && got == preFetch, "fetch == filtered readIndex, pre == post compact")
    assert(got.map(_._1) == probe.filter(_ % 2 == 1).toSet, "odd probes survive, evens folded out")
  }

  test("dgrp fold fetch: only hit groups' files scanned, id set pushed, rows id-sorted in each group file") { withFoldProps(1024L, 2048L) {
    val root = Files.createTempDirectory("graft_plkfold").toString
    val n = 8192L
    val docs = (0L until n).map(i => (i, (0 until 9).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    SignatureIndex.ingest(spark, root, docs, batchKey = Some("b1"))
    CacheJanitor.drain()
    SignatureIndex.compact(spark, root)
    CacheJanitor.drain()
    val log = s"$root/signatures"
    val parted = BatchLog.partitionedKeys(spark, log, SignatureIndex.dgrpCol)
    assert(parted.size == 1, s"compaction folded to one partitioned key: $parted")
    val fk = parted.head
    val g = BatchLog.readGroupsSidecar(spark,
      BatchLog.dirOfResolved(spark, log, fk), SignatureIndex.dgrpSidecarName)
      .getOrElse(fail("missing dgrp sidecar"))
    assert(g >= 4, s"byte sizing should give a real group count, got $g")

    val probe = Seq(7L, 1003L, 2048L, 4095L, 8000L)
    val hit = probe.map(i => java.lang.Math.floorMod(i, g.toLong).toInt).distinct.toSet
    val fetched = SignatureIndex.fetch(spark, root, probe)
    val scans = scansOf(fetched, "signatures")
    assert(scans.nonEmpty)
    val files = scans.map(_.metrics("numFiles").value).sum
    assert(files <= hit.size,
      s"fetch must scan only the ${hit.size} hit groups' files, scanned $files")
    // Per-group legs push exactly their own ids (a 1-id leg folds to
    // EqualTo) — either shape row-group-prunes via min/max.
    assert(scans.exists(s => s.metadata("PushedFilters").contains("In(doc_id") ||
      s.metadata("PushedFilters").contains("EqualTo(doc_id")),
      "the probe id set must be pushed to parquet (row-group pruning precondition)")
    assert(rowsOf(fetched) == rowsOf(SignatureIndex.readIndex(spark, root)
      .where(col("doc_id").isin(probe.map(Long.box): _*))))

    // The adopted write layout: each group file's rows are id-ascending
    // (the min/max row-group windows the pushed In prunes against).
    val fs = new org.apache.hadoop.fs.Path(log)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gdir = new org.apache.hadoop.fs.Path(
      BatchLog.dirOfResolved(spark, log, fk), s"${SignatureIndex.dgrpCol}=${hit.head}")
    val dataFiles = fs.listStatus(gdir).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    assert(dataFiles.nonEmpty)
    val ids = spark.read.parquet(dataFiles.head.getPath.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "fold rows are id-sorted within the group file")
  } }

  test("CosineDedupIndex.fetch == readIndex filter through ingest → tombstone → compact") {
    val root = Files.createTempDirectory("graft_plkcos").toString
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    CosineDedupIndex.ingest(spark, root, vecs, batchKey = Some("b1"))
    CacheJanitor.drain()
    val probe = Seq(2L, 33L, 150L, 301L, 444L)
    CosineDedupIndex.remove(spark, root, probe.filter(_ % 3 == 0))
    CosineDedupIndex.compact(spark, root)
    CacheJanitor.drain()
    def key(df: DataFrame): Set[(Long, Long)] =
      df.select(col("vec_id"), col("bucket")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = key(CosineDedupIndex.fetch(spark, root, probe))
    val expected = key(CosineDedupIndex.readIndex(spark, root)
      .where(col("vec_id").isin(probe.map(Long.box): _*)))
    assert(got == expected)
    assert(got.map(_._1) == probe.filterNot(_ % 3 == 0).toSet, "removed ids folded out")
  }
}
