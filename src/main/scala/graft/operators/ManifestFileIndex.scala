package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] served entirely from [[BatchLog]]'s fold-file
  * manifests — ZERO filesystem listings (and zero footer reads) at scan
  * planning time.
  *
  * Why this exists: a compacted fold lays the corpus out under up to
  * 65536 `hgrp=`/`dgrp=`/`pgrp=` group directories, and every probe
  * that reads the fold through `spark.read.parquet` pays a recursive
  * directory listing to rediscover files the fold's writer already knew
  * — measured at +~4 s/batch for saturated post-compaction probes in
  * SCALEBENCH_r14_x100loop_part2 (~280 fold files listed per log, with
  * Spark launching a parallel-listing JOB past 32 paths), and the cost
  * center outright on object stores, where LIST is the expensive call.
  * The fold is written once and immutable afterwards, so its file list
  * is a fact known at commit time: [[BatchLog.writeFoldManifest]] stows
  * it (with sizes, mtimes, and both schemas) in the same directory
  * transaction, and this index serves `listFiles` straight from it.
  *
  * Partition-filter pruning is implemented exactly as Spark's own
  * `PartitioningAwareFileIndex.prunePartitions` does it — bind the
  * pushed predicates to the partition schema by NAME and evaluate per
  * partition row — so `col("hgrp").isin(...)` prunes identically to
  * the listing-backed read and `numFiles` metrics stay pinnable.
  *
  * Used only behind [[BatchLog]]'s read helpers, which fall back to
  * plain listing reads whenever any requested directory lacks a
  * readable manifest (and under the `graft.fold.manifest.disable`
  * contrast switch) — unreadable means slower, never wrong.
  */
private[graft] class ManifestFileIndex(
    roots: Seq[HPath],
    override val partitionSchema: StructType,
    parts: Seq[(InternalRow, Seq[FileStatus])]) extends FileIndex {

  /** The batch directories, mirroring what the listing-backed read
    * reports (plan-metric harvesters filter scans by these paths). */
  override def rootPaths: Seq[HPath] = roots

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // Bind by NAME, and treat a filter referencing any attribute the
    // partition schema can't resolve (a name-case mismatch under some
    // future caller, a misrouted data filter) as NON-PRUNABLE — all
    // partitions pass — mirroring Spark's own defensive behavior
    // instead of an IndexOutOfBounds at planning time.
    val usable = partitionFilters.filter(_.references.forall(a =>
      partitionSchema.exists(_.name == a.name)))
    val selected =
      if (usable.isEmpty) parts
      else {
        val predicate = Predicate.createInterpreted(
          usable.reduce(And).transform {
            case a: AttributeReference =>
              val i = partitionSchema.indexWhere(_.name == a.name)
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
        predicate.initialize(0)
        parts.filter(p => predicate.eval(p._1))
      }
    selected.map { case (values, files) => PartitionDirectory(values, files.toArray) }
  }

  /** Exact file set — [[BatchLog.stageRewrite]]'s absorbed-key
    * detection walks the analyzed plan's relations through this, so a
    * fold READ via the manifest still retires exactly the keys its
    * files came from. */
  override def inputFiles: Array[String] =
    parts.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = parts.flatMap(_._2).map(_.getLen).sum
}

private[graft] object ManifestFileIndex {

  /** The DataFrame over the given batch directories' manifests:
    * column layout identical to the listing-backed
    * `spark.read.option("basePath", logPath).parquet(batchDirs)` read —
    * data columns in file order, then `batch_key` (STRING) and the
    * fold's own partition columns (INT, validated at manifest write) —
    * so callers filter/drop partition columns exactly as before.
    * Callers guarantee all entries share one layout and one schema
    * ([[BatchLog]] falls back to listings otherwise). */
  def frame(spark: SparkSession, logPath: String,
      entries: Seq[(String, BatchLog.FoldManifest)]): DataFrame = {
    val fs = new HPath(logPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qRoot = fs.makeQualified(new HPath(logPath))
    val m0 = entries.head._2
    val partSchema = StructType(
      StructField("batch_key", StringType, nullable = true) +: m0.partSchema.fields.toSeq)
    val sorted = entries.sortBy(_._1)
    val roots = sorted.map { case (k, _) => new HPath(qRoot, s"batch_key=$k") }
    val parts: Seq[(InternalRow, Seq[FileStatus])] =
      sorted.flatMap { case (k, m) =>
        val batchDir = new HPath(qRoot, s"batch_key=$k")
        m.files.groupBy(f => partValues(f._1, m.partCols)).toSeq
          .sortBy(_._1.mkString("/"))
          .map { case (vals, fls) =>
            val row = InternalRow.fromSeq(
              UTF8String.fromString(k) +: vals.map(v => Int.box(v.toInt)))
            val sts = fls.map(f =>
              new FileStatus(f._2, false, 1, 134217728L, f._3, new HPath(batchDir, f._1)))
            (row, sts)
          }
      }
    val rel = HadoopFsRelation(
      new ManifestFileIndex(roots, partSchema, parts),
      partSchema, m0.dataSchema, None, new ParquetFileFormat, Map.empty[String, String])(spark)
    spark.baseRelationToDataFrame(rel)
  }

  /** The `<col>=<value>` values of a manifest rel-path's directory
    * segments, in `partCols` order (the manifest writer validated the
    * segments are uniform and int-valued). */
  private def partValues(relPath: String, partCols: Seq[String]): Seq[String] = {
    val dirs = relPath.split('/').init
      .map(seg => seg.takeWhile(_ != '=') -> seg.dropWhile(_ != '=').drop(1)).toMap
    partCols.map(dirs)
  }
}
