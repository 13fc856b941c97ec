package graft.operators

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion/retraction for the incremental index snapshots
  * ([[SignatureIndex]], [[AnnIndex]]): the snapshots are append-only —
  * a removal must not rewrite them, or batch cost stops being
  * O(increment). The honest middle ground is the standard
  * tombstone-then-compact shape (Delta/Iceberg delete files, Lucene
  * deleted-docs bitmaps): [[append]] records removed ids in a small
  * parquet side table under the snapshot root; every read path
  * anti-joins it ([[exclude]]); a periodic [[SignatureIndex.compact]] /
  * [[AnnIndex.compact]] rewrites the snapshot minus tombstones and
  * clears the side table — after which the snapshot is byte-identical
  * in content to a from-scratch build over the surviving set (spec-
  * pinned).
  *
  * Scale: the tombstone table grows with the number of REMOVED ids,
  * not corpus size, and the anti-join is a plain equi-join that AQE
  * broadcasts while the set is small; compaction is the only full
  * rewrite and is explicitly operator-scheduled, never implicit. The
  * reference's only delete story is a full refresh
  * (`src/warehousing_lambda.py:64-71`, `mode="overwrite"`); this keeps
  * that end state (compaction == rebuild) without paying a rebuild per
  * takedown. */
private[graft] object Tombstones {

  def dir(root: String): String = s"$root/tombstones"

  /** Recorded tombstoned ids as a 1-column `(idCol)` BIGINT frame —
    * empty (but correctly typed) when nothing was ever removed. The
    * existence probe uses the Hadoop FileSystem API like every other
    * probe here — a java.nio probe would always fail on an HDFS/object
    * -store root, silently reading the side table as empty and
    * RESURFACING every removed id. */
  def read(spark: SparkSession, root: String, idCol: String): DataFrame = {
    val d = new HPath(dir(root))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) spark.range(0).select(col("id").as(idCol))
    else spark.read.parquet(dir(root)).select(col(idCol)).distinct()
  }

  /** Record ids as removed — appends a small file, never touches the
    * snapshot (the append-only contract is what the fingerprint specs
    * pin). Idempotent: re-removing an id is a no-op at read time
    * (distinct on read). */
  def append(root: String, ids: DataFrame, idCol: String): Unit =
    ids.select(col(idCol).cast("long").as(idCol)).distinct()
      .coalesce(1).write.mode("append").parquet(dir(root))

  /** Total on-disk bytes of the tombstone side table (0 when absent) —
    * the driver-side proxy read paths gate explicit broadcast() hints
    * on: steady-state removals keep the set tiny, but a BULK takedown
    * (the GDPR path) is bounded only by removed-doc count, and a forced
    * broadcast of millions of ids would blow the driver/broadcast
    * limits that AQE's planner-decided join would have avoided. */
  def bytesOnDisk(spark: SparkSession, root: String): Long = {
    val d = new HPath(dir(root))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) 0L
    else fs.getContentSummary(d).getLength
  }

  /** `df` minus tombstoned rows (anti-join on `idCol`). */
  def exclude(df: DataFrame, root: String, idCol: String): DataFrame = {
    val t = read(df.sparkSession, root, idCol)
    df.join(t, Seq(idCol), "left_anti")
  }

  /** Replace `dest` with the fully-written `tmp` directory and drop the
    * tombstone table — the commit step of a compaction. Hadoop
    * FileSystem API so the same code runs on HDFS/object-store roots,
    * not just local disk.
    *
    * The delete→rename pair has a crash window (dest briefly absent);
    * [[recoverCompaction]] closes it on the READ side, and the window
    * is unambiguous by construction: `tmp` is only ever deleted or
    * renamed AFTER its write fully completed, so `dest missing ∧ tmp
    * present` always means "crashed between delete and rename — adopt
    * tmp", and `dest present ∧ tmp present` always means "crashed
    * before the delete — tmp is an abandoned (possibly partial) stage,
    * drop it". */
  def commitCompaction(spark: SparkSession, root: String, tmp: String, dest: String): Unit =
    commitSwapImpl(spark, tmp, dest, clearTombstonesOf = Some(root))

  /** Sibling intent marker for [[commitSwap]] — present exactly while
    * a swap is IN FLIGHT. Round-15 (the hostile-FS drill's finding):
    * the pre-intent protocol disambiguated crash states by `dest
    * present?` alone, which is sound only when rename is atomic. On a
    * COPY+DELETE filesystem (object-store movers, the hostile test FS)
    * a crash mid-copy leaves a PARTIAL dest with tmp still present —
    * and "dest present ∧ tmp present ⇒ drop tmp as abandoned" would
    * have adopted the torn dest as the log. The intent marker removes
    * the ambiguity with small-file primitives that ARE atomic enough
    * everywhere (create/delete): intent present ⇒ dest is untrusted
    * whatever its state; tmp (complete by construction while it
    * exists — a copy deletes its source last) re-runs the swap.
    *
    * Round-16: the marker RECORDS the in-flight swap (`tmp` path, and
    * the tombstone root the commit clears, when it does). The r15
    * marker was an empty file keyed by dest alone, and SEVERAL
    * protocols swap into the same dest (`__compact_tmp`,
    * `__migrate_tmp`, `__refreeze_tmp`): a recoverer probing a
    * DIFFERENT protocol's tmp would find it absent, conclude "rename
    * finished", drop the intent, and — on the compaction path — clear
    * the tombstone side table while the crashed swap's own tmp still
    * dangled and the dest still held tombstoned rows (removed ids
    * silently resurfacing). With the swap recorded, ANY recoverer
    * completes exactly the swap that crashed: adopt the RECORDED tmp,
    * clear the RECORDED root's tombstones (or none), never its own
    * guess. */
  private def intentPath(dest: String) = new HPath(s"$dest.__swap_intent")

  private def writeIntent(fs: org.apache.hadoop.fs.FileSystem, tmp: String,
      dest: String, clearTombstonesOf: Option[String]): Unit = {
    val body = graft.sources.MiniJson.renderFlat(Map(
      "v" -> "2",
      "tmp" -> fs.makeQualified(new HPath(tmp)).toString) ++
      clearTombstonesOf.map(r => "root" -> fs.makeQualified(new HPath(r)).toString))
    val out = fs.create(intentPath(dest), true)
    try out.write((body + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** The recorded in-flight swap `(tmp, tombstoneRoot)`, or None when
    * the marker is torn/empty — which can only mean the writer died
    * INSIDE the marker write, i.e. before any destructive step, so
    * dest is exactly as trustworthy as with no marker at all. */
  private def readIntent(fs: org.apache.hadoop.fs.FileSystem,
      dest: String): Option[(String, Option[String])] =
    try {
      val in = fs.open(intentPath(dest))
      val s = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
      val m = graft.sources.MiniJson.parseFlat(s.trim)
      if (m.getOrElse("v", "") != "2") None
      else Some((m("tmp"), m.get("root")))
    } catch { case _: Exception => None }

  /** The swap alone — for operators with NO tombstone side table
    * ([[SketchLog]]): deleting `root/tombstones` here would belong to a
    * SIBLING operator sharing the root (the index logs the sketch log
    * is documented to live beside), silently resurrecting its removed
    * ids. Same crash window and recovery contract as
    * [[commitCompaction]]. */
  def commitSwap(spark: SparkSession, tmp: String, dest: String): Unit =
    commitSwapImpl(spark, tmp, dest, clearTombstonesOf = None)

  /** Create intent (recording the swap) → delete dest → rename tmp →
    * clear tombstones (compaction only) → delete intent. The tombstone
    * clear moved INSIDE the intent window in round 16: the r15 shape
    * cleared after the intent delete, so a crash between the two left
    * stale tombstones that recovery (no intent, no tmp) could never
    * see — a legitimately re-added id would have been suppressed
    * forever. Inside the window, recovery re-runs the clear. */
  private def commitSwapImpl(spark: SparkSession, tmp: String, dest: String,
      clearTombstonesOf: Option[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(dest).getFileSystem(conf)
    writeIntent(fs, tmp, dest, clearTombstonesOf)
    fs.delete(new HPath(dest), true)
    require(fs.rename(new HPath(tmp), new HPath(dest)),
      s"compaction commit failed: could not move $tmp into $dest")
    clearTombstonesOf.foreach(root => fs.delete(new HPath(dir(root)), true))
    fs.delete(intentPath(dest), false)
  }

  /** Read-side recovery for [[commitSwap]] — intent present means a
    * swap died in flight: re-run it from the (complete) tmp, or, when
    * tmp is already gone, the rename itself completed and only the
    * intent clear was lost. No intent = the pre-swap states: adopt a
    * tmp staged against a missing dest (legacy delete-to-rename window
    * of pre-intent writers), drop an abandoned stage otherwise. Never
    * touches the tombstone side table. */
  def recoverSwap(spark: SparkSession, tmp: String, dest: String): Unit =
    recoverSwapImpl(spark, tmp, dest, clearTombstonesOf = None)

  /** Crash recovery for [[commitCompaction]]'s swap window — call
    * before reading `dest`. Completes a commit that died in flight
    * (adopt tmp, clear the side table exactly as the commit would
    * have), and clears an abandoned stage left by a crash
    * mid-tmp-write. Idempotent and cheap (existence probes). */
  def recoverCompaction(spark: SparkSession, root: String, tmp: String, dest: String): Unit =
    recoverSwapImpl(spark, tmp, dest, clearTombstonesOf = Some(root))

  private def recoverSwapImpl(spark: SparkSession, tmp: String, dest: String,
      clearTombstonesOf: Option[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(dest).getFileSystem(conf)
    val destP = new HPath(dest)
    val intentP = intentPath(dest)
    if (fs.exists(intentP)) {
      readIntent(fs, dest) match {
        case Some((recTmp, recRoot)) =>
          // Swap in flight at the crash: dest may be absent, partial,
          // or complete — all untrusted. The marker RECORDS which tmp
          // was swapping (several protocols share one dest); complete
          // exactly that swap, never the recoverer's own guess. While
          // the recorded tmp exists it is complete by construction, so
          // re-running the swap from it is always sound; recorded tmp
          // absent means the rename finished (a copy deletes its
          // source only after completing) and dest IS the new state —
          // only the recorded post-rename steps were lost.
          val recTmpP = new HPath(recTmp)
          if (fs.exists(recTmpP)) {
            fs.delete(destP, true)
            require(fs.rename(recTmpP, destP),
              s"swap recovery failed: could not adopt $recTmp as $dest")
          }
          recRoot.foreach(root => fs.delete(new HPath(dir(root)), true))
          fs.delete(intentP, false)
        case None =>
          // Torn/empty marker: the writer died INSIDE the marker write,
          // strictly before any destructive step — dest is exactly as
          // trustworthy as with no marker. Drop it and fall through to
          // the no-intent states (which also correctly drop a PARTIAL
          // abandoned stage instead of adopting it).
          fs.delete(intentP, false)
          recoverNoIntent(fs, tmp, destP, clearTombstonesOf)
      }
    } else recoverNoIntent(fs, tmp, destP, clearTombstonesOf)
  }

  /** The pre-intent crash states: adopt a tmp staged against a missing
    * dest (the legacy delete-to-rename window), drop an abandoned
    * (possibly partial) stage otherwise. */
  private def recoverNoIntent(fs: org.apache.hadoop.fs.FileSystem, tmp: String,
      destP: HPath, clearTombstonesOf: Option[String]): Unit = {
    val tmpP = new HPath(tmp)
    if (fs.exists(tmpP)) {
      if (!fs.exists(destP)) {
        require(fs.rename(tmpP, destP),
          s"compaction recovery failed: could not adopt $tmp as $destP")
        clearTombstonesOf.foreach(root => fs.delete(new HPath(dir(root)), true))
      } else fs.delete(tmpP, true)
    }
  }
}
