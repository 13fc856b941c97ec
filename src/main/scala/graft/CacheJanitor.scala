package graft

import org.apache.spark.sql.DataFrame

/** Session-lifetime registry for frames persisted inside operators.
  *
  * Several operators persist an intermediate across their own multi-pass
  * plans (the two-pass surrogate id; the t35–t37 signature frames, whose
  * persist is the load-bearing fix that keeps self-joins from recomputing
  * the scan per side). The persist must OUTLIVE the operator call — the
  * caller's action is what reads it — so the operator can't unpersist it
  * itself. Without a release point, a long-lived session (Verify/Bench
  * run the whole registry; an incremental driver runs every batch)
  * accumulates cached partitions until LRU pressure.
  *
  * Operators [[register]] what they persist; drivers call [[drain]] at
  * their natural barrier — after a query's result is materialized
  * (Verify/Bench loop) or at the end of a batch (star Runner).
  */
object CacheJanitor {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def register(df: DataFrame): DataFrame = { frames.add(df); df }

  /** Unpersist everything registered since the last drain (non-blocking). */
  def drain(): Unit = {
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = frames.poll()
    }
  }
}
