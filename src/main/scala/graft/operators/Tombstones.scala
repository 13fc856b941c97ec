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
  def commitCompaction(spark: SparkSession, root: String, tmp: String, dest: String): Unit = {
    commitSwap(spark, tmp, dest)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(dest).getFileSystem(conf)
    fs.delete(new HPath(dir(root)), true)
  }

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
    * exists — a copy deletes its source last) re-runs the swap. */
  private def intentPath(dest: String) = new HPath(s"$dest.__swap_intent")

  /** The swap alone — for operators with NO tombstone side table
    * ([[SketchLog]]): deleting `root/tombstones` here would belong to a
    * SIBLING operator sharing the root (the index logs the sketch log
    * is documented to live beside), silently resurrecting its removed
    * ids. Same crash window and recovery contract as
    * [[commitCompaction]]. */
  def commitSwap(spark: SparkSession, tmp: String, dest: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(dest).getFileSystem(conf)
    fs.create(intentPath(dest), true).close()
    fs.delete(new HPath(dest), true)
    require(fs.rename(new HPath(tmp), new HPath(dest)),
      s"compaction commit failed: could not move $tmp into $dest")
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
    val destP = new HPath(dest); val tmpP = new HPath(tmp)
    val intentP = intentPath(dest)
    if (fs.exists(intentP)) {
      // Swap in flight at the crash: dest may be absent, partial, or
      // complete — all untrusted. While tmp exists it is complete by
      // construction, so re-running the swap from it is always sound;
      // tmp absent means the rename finished (a copy deletes its
      // source only after completing) and dest IS the new state.
      if (fs.exists(tmpP)) {
        fs.delete(destP, true)
        require(fs.rename(tmpP, destP),
          s"compaction recovery failed: could not adopt $tmp as $dest")
      }
      fs.delete(intentP, false)
      clearTombstonesOf.foreach(root => fs.delete(new HPath(dir(root)), true))
    } else if (fs.exists(tmpP)) {
      if (!fs.exists(destP)) {
        require(fs.rename(tmpP, destP),
          s"compaction recovery failed: could not adopt $tmp as $dest")
        clearTombstonesOf.foreach(root => fs.delete(new HPath(dir(root)), true))
      } else fs.delete(tmpP, true)
    }
  }
}
