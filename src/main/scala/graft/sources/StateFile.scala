package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Crash-safe SMALL state files (watermarks, policy markers) over the
  * Hadoop FileSystem API — the round-15 port of the java.nio
  * `ATOMIC_MOVE` pattern to an API that also runs on HDFS/object-store
  * roots (and under the hostile test FS, where rename is copy+delete).
  *
  * Protocol: [[write]] fully writes a sibling `.tmp`, drops the old
  * main file, renames the tmp into place. On a native-rename FS this
  * is the same atomic swap as before. On a COPY+DELETE FS the swap is
  * not atomic — but the ordering guarantees that from the moment the
  * old main is dropped until the new one is fully in place, a COMPLETE
  * `.tmp` exists (a copy deletes its source only after finishing), so
  * [[read]] recovers through it: a missing or torn main file with a
  * parseable tmp returns the tmp's content; torn with no readable tmp
  * still fails loudly — slower or louder, never silently wrong.
  * Single-writer contract (the callers already hold it); readers may
  * race the swap and land on the tmp fallback.
  */
private[graft] object StateFile {

  private def conf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def fs(path: String): FileSystem = new HPath(path).getFileSystem(conf)

  private def tmpOf(p: HPath): HPath = new HPath(p.getParent, p.getName + ".tmp")

  def write(path: String, content: String): Unit = {
    val f = fs(path)
    val p = new HPath(path)
    if (p.getParent != null) f.mkdirs(p.getParent)
    val tmp = tmpOf(p)
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    f.delete(p, false)
    require(f.rename(tmp, p),
      s"state-file publish failed: could not move $tmp into $path")
  }

  /** None = neither main nor (readable) tmp exists. `parse` MUST throw
    * on torn content — that is what routes a torn main to the tmp
    * fallback (and a torn main with no readable tmp to the loud
    * rethrow). */
  def read[T](path: String)(parse: String => T): Option[T] = {
    val f = fs(path)
    val p = new HPath(path)
    val tmp = tmpOf(p)
    def readAll(q: HPath): String = {
      val in = f.open(q)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    }
    def fromTmp: Option[T] =
      if (!f.exists(tmp)) None
      else scala.util.Try(parse(readAll(tmp))).toOption
    if (!f.exists(p)) fromTmp
    else
      try Some(parse(readAll(p)))
      catch {
        case e: Exception => fromTmp match {
          case Some(t) =>
            System.err.println(
              s"[graft] StateFile: torn state at $path ($e); recovered from complete .tmp")
            Some(t)
          case None => throw e
        }
      }
  }
}
