package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-keyed commit discipline for the append-only index logs
  * ([[SignatureIndex]], [[CosineDedupIndex]], [[ClusterLabels]],
  * [[AnnIndex]], [[PqIndex]]).
  *
  * A bare `mode("append")` is crash-atomic at the FILE level (Spark's
  * committer publishes part files only on task/job commit) but not at
  * the BATCH level: a driver that dies after a batch's append committed
  * and then REPLAYS the batch appends the same rows twice — duplicate
  * signature/code rows inflate candidates and stats, duplicate label
  * rows burn batch numbers. The star landing log solved exactly this
  * with deterministic batch-keyed file names
  * ([[graft.sources.LandingLog.writeIncrement]]); this gives the index
  * logs the same discipline: every append lands in its own
  * `batch_key=<key>/` partition directory, written with
  * `mode("overwrite")`, so a replay of the same key REPLACES its own
  * files instead of double-appending — idempotent by construction when
  * the caller supplies the landing batch id as the key. Without a
  * caller key a fresh auto-numbered key is minted (`a00001`, …): the
  * pre-change behavior, explicitly not replay-idempotent.
  *
  * The key directories double as partition discovery input: readers see
  * one extra `batch_key` string column (values are prefixed so type
  * inference can never produce a non-string) and drop it. Prior batch
  * directories stay byte-untouched on append — the O(increment)
  * fingerprint contract the index specs pin.
  *
  * A `_graft_batched_v1` marker file versions the layout: a root
  * holding data files but no marker predates this format (flat appends;
  * for [[SignatureIndex]] also pre-sorted-signature rows, whose unsorted
  * arrays would silently break the two-pointer intersect kernel) and is
  * REFUSED loudly — [[adoptLegacy]] migrates such a root in place with
  * the same stage-then-atomic-swap commit as compaction. All probes and
  * moves use the Hadoop FileSystem API so the same code runs on
  * HDFS/object-store roots, not just local disk.
  */
private[graft] object BatchLog {

  val markerName = "_graft_batched_v1"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Caller keys become directory-safe, always-string partition values:
    * a `b` prefix guarantees partition-type inference reads them back as
    * STRING whatever the key looks like (a bare `2026...` would infer
    * numeric and a mixed log would then conflict). Auto keys use the
    * disjoint `a` prefix. */
  def sanitize(key: String): String =
    "b" + key.replaceAll("[^0-9A-Za-z_.\\-]", "_")

  private def dirFor(path: String, key: String): String =
    s"$path/batch_key=$key"

  /** Existing batch keys (directory names after `batch_key=`). */
  def keys(spark: SparkSession, path: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val p = new HPath(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_key="))
      .map(_.stripPrefix("batch_key="))
      .sorted
  }

  /** True once at least one batch directory exists — the "log has ever
    * been written" probe (an only-marker root is still empty). */
  def hasData(spark: SparkSession, path: String): Boolean =
    keys(spark, path).nonEmpty

  private def nextAutoKey(spark: SparkSession, path: String): String = {
    val n = keys(spark, path)
      .filter(k => k.startsWith("a") && k.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong)
    f"a${(n.maxOption.getOrElse(0L)) + 1}%05d"
  }

  /** Refuse a legacy (pre-marker) root on any read/append path: data
    * files at the top level mean flat appends from an older build, which
    * this code would misread (and, for signature logs, silently corrupt
    * pair detection through the sorted-input intersect kernel). */
  def requireFormat(spark: SparkSession, path: String, op: String): Unit = {
    val fs = fsOf(spark, path)
    val p = new HPath(path)
    if (fs.exists(p) && !fs.exists(new HPath(p, markerName))) {
      val legacy = fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".") || n.startsWith("batch_key="))
      require(legacy.isEmpty,
        s"$op: $path holds a legacy (unversioned) index layout " +
          s"(${legacy.take(3).mkString(", ")}…). Its rows predate the " +
          "batch-keyed format (and build-time-sorted signatures); run " +
          "the operator's migrateLegacy(root) once, or rebuild from " +
          "scratch — reading it in place would silently corrupt results.")
    }
  }

  private def writeMarker(fs: FileSystem, dir: HPath): Unit = {
    fs.mkdirs(dir)
    val m = new HPath(dir, markerName)
    if (!fs.exists(m)) fs.create(m, true).close()
  }

  /** The sanitized on-disk key a caller key (or a fresh auto key) maps
    * to — split out so an operator that must know its key BEFORE the
    * append (to exclude its own prior rows on a replay) resolves once
    * and hands the result to [[appendResolved]]. */
  def resolveKey(spark: SparkSession, path: String, batchKey: Option[String]): String =
    batchKey.map(sanitize).getOrElse(nextAutoKey(spark, path))

  /** Append one batch: `df` lands under `path/batch_key=<key>/` with
    * `mode("overwrite")` — a replay of the same caller key replaces its
    * own directory (idempotent); `None` mints a fresh auto key. Returns
    * the sanitized key actually used. */
  def append(df: DataFrame, path: String, batchKey: Option[String],
      op: String, partitionBy: Seq[String] = Nil): String = {
    val key = resolveKey(df.sparkSession, path, batchKey)
    appendResolved(df, path, key, op, partitionBy)
    key
  }

  /** [[append]] with a key already put through [[resolveKey]]. */
  def appendResolved(df: DataFrame, path: String, key: String,
      op: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    requireFormat(spark, path, op)
    writeMarker(fsOf(spark, path), new HPath(path))
    val w = df.write.mode("overwrite")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .parquet(dirFor(path, key))
  }

  /** Read the whole log (all batches), `batch_key` dropped — the raw
    * row stream a keep-last fold or tombstone exclusion runs over. */
  def read(spark: SparkSession, path: String, op: String): DataFrame = {
    requireFormat(spark, path, op)
    spark.read.parquet(path).drop("batch_key")
  }

  /** Stage a full-log REWRITE (compaction, migration) into `tmpPath` in
    * this layout — single batch directory plus marker — ready for an
    * atomic swap onto the log root ([[Tombstones.commitCompaction]] or
    * the operator's own rename commit). */
  def stage(df: DataFrame, tmpPath: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val w = df.write.mode("overwrite")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .parquet(dirFor(tmpPath, "a00001"))
    writeMarker(fsOf(spark, tmpPath), new HPath(tmpPath))
  }

  /** Migrate a legacy flat-append root in place: read its rows, apply
    * `transform` (e.g. re-sorting signature arrays), rewrite into one
    * batch-keyed directory, and atomically swap. Tombstone state (a
    * SIBLING of the log dir) is untouched — this is a re-layout, not a
    * compaction. */
  def adoptLegacy(spark: SparkSession, path: String,
      transform: DataFrame => DataFrame = identity,
      partitionBy: Seq[String] = Nil): Unit = {
    val fs = fsOf(spark, path)
    val dest = new HPath(path)
    val tmpP = new HPath(s"$path.__migrate_tmp")
    // Re-run after a crash between the delete and the rename: the staged
    // tmp is complete by construction (it is only ever deleted or
    // renamed after its write finished) — adopt it and finish.
    if (!fs.exists(dest) && fs.exists(tmpP)) {
      require(fs.rename(tmpP, dest),
        s"legacy migration recovery failed: could not adopt $tmpP as $path")
      return
    }
    require(fs.exists(dest), s"no index at $path to migrate")
    if (fs.exists(new HPath(dest, markerName))) return // already current
    stage(transform(spark.read.parquet(path)), tmpP.toString, partitionBy)
    fs.delete(dest, true)
    require(fs.rename(tmpP, dest),
      s"legacy migration commit failed: could not move $tmpP into $path")
  }
}
