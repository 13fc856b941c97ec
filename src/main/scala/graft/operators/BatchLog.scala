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
    * disjoint `a` prefix. The escape is INJECTIVE — each unsafe char
    * (including `_`, the escape introducer) becomes `_` + its fixed
    * 4-hex-digit code point, so two distinct caller keys can never map
    * to one directory (a lossy replacement would let a later batch
    * silently OVERWRITE an earlier batch's rows through the
    * replay-idempotent `mode(overwrite)`). */
  def sanitize(key: String): String =
    "b" + key.flatMap { c =>
      if (c != '_' && (c.isDigit || (c >= 'A' && c <= 'Z') ||
        (c >= 'a' && c <= 'z') || c == '.' || c == '-')) c.toString
      else f"_${c.toInt}%04x"
    }

  /** The pre-injective mapping (kept `_` literal, collapsed every other
    * unsafe char to `_`) — consulted so batches WRITTEN by the older
    * release keep their replay idempotence across the upgrade: a replay
    * whose key resolves differently under the new escape must find (and
    * overwrite) its ORIGINAL directory, and a ledger entry recorded
    * under the old name must still veto the replay. */
  private def legacySanitize(key: String): String =
    "b" + key.replaceAll("[^0-9A-Za-z_.\\-]", "_")

  private def dirFor(path: String, key: String): String =
    s"$path/batch_key=$key"

  /** Existing batch keys (directory names after `batch_key=`), committed
    * or not — the namespace [[nextAutoKey]] must avoid. */
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

  /** True when `path` (pruned of hidden names) holds at least one
    * COMMITTED data file. A directory containing only `_temporary`
    * task-attempt state — a write that died before job commit — does
    * not count: parquet's FileIndex skips hidden names, so reading a
    * log whose only batch directory is such a partial throws
    * "unable to infer schema" instead of seeing an empty log. */
  def hasCommittedFiles(spark: SparkSession, path: String): Boolean = {
    val fs = fsOf(spark, path)
    def visit(p: HPath): Boolean = {
      val st = fs.listStatus(p)
      st.exists(s => s.isFile && !hidden(s.getPath.getName)) ||
        st.exists(s => s.isDirectory && !hidden(s.getPath.getName) && visit(s.getPath))
    }
    val p = new HPath(path)
    // A concurrent deletion between the exists probe and the walk (or
    // mid-walk) means the answer is simply "no committed files here".
    try fs.exists(p) && visit(p)
    catch { case _: java.io.FileNotFoundException => false }
  }

  private def hidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** True once at least one batch directory holds committed data — the
    * "log has ever been written" probe. An only-marker root, or one
    * whose only batch directory is an uncommitted partial (a crash
    * mid-first-append), is still empty: the replaying writer repairs
    * the partial via its own `mode(overwrite)`, and readers must not
    * trip over it meanwhile. */
  def hasData(spark: SparkSession, path: String): Boolean =
    keys(spark, path).exists(k => hasCommittedFiles(spark, dirFor(path, k)))

  private def nextAutoKey(spark: SparkSession, path: String): String = {
    // Consider RETIRED keys too: compaction folds auto-keyed batches
    // away and records them in the ledger — re-minting a retired number
    // would make the next auto append a silent no-op.
    val n = (keys(spark, path) ++ retiredKeys(spark, path))
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
    batchKey.map { k =>
      val neu = sanitize(k)
      val old = legacySanitize(k)
      // Upgrade compatibility: if this caller key already landed under
      // the old mapping (directory present, or folded away and
      // retired), keep addressing it by that name.
      if (old != neu && (keys(spark, path).contains(old) ||
        retiredKeys(spark, path).contains(old))) old
      else neu
    }.getOrElse(nextAutoKey(spark, path))

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

  /** [[append]] with a key already put through [[resolveKey]]. A key the
    * RETIRED-KEYS LEDGER lists is a no-op: its batch committed before a
    * compaction/refreeze folded it into the rewritten snapshot, so its
    * rows are already present — re-writing the batch directory would
    * DOUBLE-APPEND them beside the fold (the exact corruption the
    * batch-key mechanism exists to prevent, resurfacing across
    * maintenance). */
  def appendResolved(df: DataFrame, path: String, key: String,
      op: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    requireFormat(spark, path, op)
    if (retiredKeys(spark, path).contains(key)) return
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

  // ------------------------------------------------------- retired keys

  private val retiredName = "_graft_retired_keys"

  /** Keys folded away by a past rewrite ([[stageRewrite]]) — replays of
    * these must be no-ops, and [[nextAutoKey]] must never re-mint them.
    * Stored as one sanitized key per line in a hidden ledger file that
    * travels with the log directory through the atomic swap. */
  def retiredKeys(spark: SparkSession, path: String): Set[String] = {
    val fs = fsOf(spark, path)
    val f = new HPath(path, retiredName)
    if (!fs.exists(f)) Set.empty
    else {
      val in = fs.open(f)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split("\n").map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  private def writeRetired(spark: SparkSession, path: String, ks: Set[String]): Unit =
    if (ks.nonEmpty) {
      val fs = fsOf(spark, path)
      fs.mkdirs(new HPath(path))
      val out = fs.create(new HPath(path, retiredName), true)
      try out.write(ks.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }

  private def writeFold(df: DataFrame, tmpPath: String, key: String,
      partitionBy: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .parquet(dirFor(tmpPath, key))
    writeMarker(fsOf(df.sparkSession, tmpPath), new HPath(tmpPath))
  }

  /** Stage a layout-only rewrite (legacy migration) into `tmpPath`:
    * single batch directory plus marker, no keys retired. */
  def stage(df: DataFrame, tmpPath: String, partitionBy: Seq[String] = Nil): Unit =
    writeFold(df, tmpPath, "a00001", partitionBy)

  /** Stage a full-log REWRITE (compaction, refreeze) of the log at
    * `srcPath` into `tmpPath` — one FRESH-auto-keyed fold directory plus
    * marker plus the retirement ledger carrying every key the fold
    * absorbs (the prior ledger ∪ the keys being folded), ready for an
    * atomic swap onto the log root ([[Tombstones.commitCompaction]] or
    * the operator's own rename commit). */
  def stageRewrite(df: DataFrame, srcPath: String, tmpPath: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // Retire only keys whose rows the fold actually ABSORBED — i.e.
    // directories holding committed data files. An uncommitted partial
    // (a crashed append) contributes nothing to the fold; retiring its
    // key would turn the batch's at-least-once replay into a permanent
    // no-op and lose the data.
    val folded = retiredKeys(spark, srcPath) ++ keys(spark, srcPath)
      .filter(k => hasCommittedFiles(spark, dirFor(srcPath, k)))
    writeFold(df, tmpPath, nextAutoKey(spark, srcPath), partitionBy)
    writeRetired(spark, tmpPath, folded)
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
