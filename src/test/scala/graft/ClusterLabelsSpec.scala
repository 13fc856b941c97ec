package graft

import java.nio.file.Files

import graft.operators.{ClusterLabels, Relational}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental cluster resolution: after ANY sequence of merge batches,
  * the persisted labels must equal a from-scratch connectedComponents
  * over all accumulated pairs (plus self-labels for pairless docs) — the
  * contract that lets the dedup layer never rerun CC over the full
  * accumulated graph. Also pins the O(changed) append shape: a batch
  * appends no rows for components it doesn't touch.
  */
class ClusterLabelsSpec extends SparkSpec {
  import spark.implicits._

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.select(col("doc_id").cast("long"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The oracle: one CC over ALL accumulated pairs, singletons = self. */
  private def fromScratch(pairs: Seq[(Long, Long)], docs: Seq[Long]): Map[Long, Long] = {
    val cc =
      if (pairs.isEmpty) Map.empty[Long, Long]
      else Relational.connectedComponents(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.map(d => d -> cc.getOrElse(d, d)).toMap
  }

  test("merged labels == from-scratch CC after every batch, including a component merge") {
    val root = Files.createTempDirectory("graft_labels").toString

    // Batch 1: one 3-chain + a singleton.
    val p1 = Seq((2L, 1L), (2L, 3L)); val d1 = Seq(1L, 2L, 3L, 4L)
    val l1 = ClusterLabels.merge(spark, root, p1.toDF("doc_a", "doc_b"), d1.toDF("doc_id"))
    assert(labelMap(l1) === fromScratch(p1, d1))
    assert(labelMap(l1) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))

    // Batch 2: a disjoint component + a new singleton — nothing old moves.
    val p2 = Seq((6L, 5L)); val d2 = Seq(5L, 6L, 7L)
    val l2 = ClusterLabels.merge(spark, root, p2.toDF("doc_a", "doc_b"), d2.toDF("doc_id"))
    assert(labelMap(l2) === fromScratch(p1 ++ p2, d1 ++ d2))
    assert(labelMap(l2) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))

    // Batch 3: a bridge pair MERGES the two components (the relabel case:
    // every member of the absorbed component must adopt the min label),
    // and an old singleton pairs with a new doc.
    val p3 = Seq((3L, 5L), (8L, 4L)); val d3 = Seq(8L)
    val l3 = ClusterLabels.merge(spark, root, p3.toDF("doc_a", "doc_b"), d3.toDF("doc_id"))
    assert(labelMap(l3) === fromScratch(p1 ++ p2 ++ p3, d1 ++ d2 ++ d3))
    assert(labelMap(l3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 1L, 6L -> 1L, 7L -> 7L, 8L -> 4L))

    // Keeper-manifest delta of the merge batch: doc 5 LOST keeper status
    // when its component merged into label 1 — the demotion event a
    // downstream manifest consumer applies without a corpus rescan.
    assert(ClusterLabels.latestBatch(spark, root) === 3L)
    val kd = ClusterLabels.keeperDelta(spark, root, 3L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kd(5L) === false && kd(1L) === true && kd(4L) === true && kd(8L) === false)
    assert(!kd.contains(7L), "untouched singleton must not appear in the delta")
  }

  test("re-touching a component with stale retired-label rows resolves correctly") {
    // The adversarial case for the pruned-fold merge: batch 1 labels
    // {5,6} as 5; batch 2 merges them into {1,...} (label 5 RETIRED —
    // stale rows (5→5), (6→5) remain in the log); batch 3 touches the
    // merged component via doc 6. The label-filtered fold must resolve
    // membership from current labels only — stale label-5 rows must
    // neither resurface nor confuse the merge.
    val root = Files.createTempDirectory("graft_labels").toString
    ClusterLabels.merge(spark, root,
      Seq((5L, 6L)).toDF("doc_a", "doc_b"), Seq(5L, 6L).toDF("doc_id"))
    ClusterLabels.merge(spark, root,
      Seq((1L, 5L)).toDF("doc_a", "doc_b"), Seq(1L).toDF("doc_id"))
    val l3 = ClusterLabels.merge(spark, root,
      Seq((2L, 6L)).toDF("doc_a", "doc_b"), Seq(2L).toDF("doc_id"))
    assert(labelMap(l3) === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L))
    assert(labelMap(l3) === fromScratch(
      Seq((5L, 6L), (1L, 5L), (2L, 6L)), Seq(1L, 2L, 5L, 6L)))
  }

  test("a batch appends no rows for components it does not touch") {
    val root = Files.createTempDirectory("graft_labels").toString
    ClusterLabels.merge(spark, root,
      Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b"), Seq(1L, 2L, 3L, 4L).toDF("doc_id"))
    ClusterLabels.merge(spark, root,
      Seq((5L, 6L)).toDF("doc_a", "doc_b"), Seq(5L, 6L).toDF("doc_id"))
    val batch2 = spark.read.parquet(ClusterLabels.dir(root))
      .where(col("batch") === 2L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(batch2 === Set(5L, 6L),
      s"batch 2 must only append its own component's rows, got $batch2")
  }

  test("keeper manifest keeps exactly the min-id member per cluster") {
    val root = Files.createTempDirectory("graft_labels").toString
    val l = ClusterLabels.merge(spark, root,
      Seq((9L, 2L), (2L, 5L)).toDF("doc_a", "doc_b"), Seq(2L, 5L, 9L, 11L).toDF("doc_id"))
    val keep = ClusterLabels.keeperManifest(l)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep === Map(2L -> true, 5L -> false, 9L -> false, 11L -> true))
  }

  test("a compaction killed mid-swap recovers on the next read — never silent-empty") {
    val root = Files.createTempDirectory("graft_labels").toString
    ClusterLabels.merge(spark, root,
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), Seq(1L, 2L, 3L).toDF("doc_id"))
    val before = labelMap(ClusterLabels.read(spark, root))
    // Crash between compact's delete and rename: dest gone, tmp complete.
    // Without recovery, read() would see "no labels yet" — SILENT loss.
    val dest = java.nio.file.Paths.get(ClusterLabels.dir(root))
    val tmp = java.nio.file.Paths.get(ClusterLabels.dir(root) + ".__compact_tmp")
    Files.move(dest, tmp)
    assert(labelMap(ClusterLabels.read(spark, root)) === before,
      "read must complete the crashed swap and return the full state")
    assert(Files.isDirectory(dest) && !Files.exists(tmp))
    // Crash mid-tmp-write (both present): tmp is an abandoned stage.
    Files.createDirectories(tmp)
    Files.write(tmp.resolve("part-junk.parquet"), Array[Byte](1))
    assert(labelMap(ClusterLabels.read(spark, root)) === before)
    assert(!Files.exists(tmp), "abandoned stage must be cleared")
  }

  test("compact folds the log to one row per doc with identical state") {
    val root = Files.createTempDirectory("graft_labels").toString
    ClusterLabels.merge(spark, root,
      Seq((1L, 2L)).toDF("doc_a", "doc_b"), Seq(1L, 2L, 3L).toDF("doc_id"))
    ClusterLabels.merge(spark, root,
      Seq((3L, 1L)).toDF("doc_a", "doc_b"), Seq.empty[Long].toDF("doc_id"))
    val before = labelMap(ClusterLabels.read(spark, root))
    ClusterLabels.compact(spark, root)
    assert(labelMap(ClusterLabels.read(spark, root)) === before)
    val log = spark.read.parquet(
      graft.operators.BatchLog.resolve(spark, ClusterLabels.dir(root)))
    assert(log.count() === log.select("doc_id").distinct().count(),
      "compacted log holds exactly one row per doc")
  }
}
