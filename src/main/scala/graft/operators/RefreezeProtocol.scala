package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Shared plumbing for the index refreeze (ladder-step migration)
  * commits ([[CosineDedupIndex.refreeze]], [[AnnIndex.refreeze]],
  * [[PqIndex.refreeze]]): stage EVERYTHING, write a completion marker
  * LAST, then run the destructive commit — so recovery can always
  * classify a crash unambiguously (marker present = stage complete,
  * finish the commit idempotently; marker absent = partial stage, drop
  * it). Hadoop FileSystem API throughout, same as the compaction
  * commits. */
private[graft] object RefreezeProtocol {

  val markerName = "_refreeze_complete"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fsOf(spark, path).exists(new HPath(path))

  def deleteIfExists(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val p = new HPath(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The completion marker, holding a small state string (e.g. the new
    * mask) the deferred commit needs. Written last in the stage. */
  def writeMarker(spark: SparkSession, tmpDir: String, content: String): Unit = {
    val fs = fsOf(spark, tmpDir)
    val out = fs.create(new HPath(tmpDir, markerName), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** True when the staged directory holds at least one committed
    * (visible) data file — the guard every marked commit must pass:
    * `fs.create` on the marker path auto-creates missing parents, so a
    * stage deleted out from under an in-flight refreeze (e.g. by a
    * concurrent session's recovery) would otherwise resurrect as a
    * MARKER-ONLY directory that the commit then swaps over the live
    * data, destroying the index. */
  def hasStagedData(spark: SparkSession, tmpDir: String): Boolean =
    BatchLog.hasCommittedFiles(spark, tmpDir)

  /** [[writeMarker]] plus the staged-data invariant: refuses loudly
    * (leaving the old index state untouched) when the stage has no
    * committed data files to commit. */
  def sealStage(spark: SparkSession, tmpDir: String, content: String): Unit = {
    require(hasStagedData(spark, tmpDir),
      s"refreeze stage at $tmpDir holds no committed data files — " +
        "the stage was deleted or never wrote; aborting without commit " +
        "(old index state is intact; rerun the refreeze)")
    writeMarker(spark, tmpDir, content)
  }

  /** Marker content if the stage at `tmpDir` completed; None when the
    * tmp dir is absent or the marker never landed. */
  def readMarker(spark: SparkSession, tmpDir: String): Option[String] = {
    val fs = fsOf(spark, tmpDir)
    val m = new HPath(tmpDir, markerName)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Replace `dest` with `tmp` (delete-then-rename; the caller's
    * recovery owns the crash window). Skips when `tmp` is absent —
    * the idempotent-retry case where an earlier attempt already
    * renamed it. */
  def swapIfStaged(spark: SparkSession, tmp: String, dest: String): Unit = {
    val fs = fsOf(spark, tmp)
    val tmpP = new HPath(tmp)
    if (fs.exists(tmpP)) {
      val destP = new HPath(dest)
      if (fs.exists(destP)) fs.delete(destP, true)
      require(fs.rename(tmpP, destP),
        s"refreeze commit failed: could not move $tmp into $dest")
    }
  }
}
