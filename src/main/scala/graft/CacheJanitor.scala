package graft

import org.apache.spark.SparkContext
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
  *
  * `localCheckpoint` blocks need their own registry ([[registerRdds]]):
  * `Dataset.unpersist` only consults the CacheManager, so a
  * checkpoint-backed frame's persisted RDD is untouched by it and — with
  * only the weak-ref ContextCleaner to retire it — accumulates for the
  * life of the session (the r19 bench measured the resulting GC thrash:
  * t72 35.4 s at an 8 GB heap vs 7.0 s at 16 GB, identical job counts).
  * Producers snapshot `sc.getPersistentRDDs.keySet` around the
  * `localCheckpoint` call and register the delta; [[drain]] unpersists
  * those RDDs directly.
  */
object CacheJanitor {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val rdds =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkContext, Int)]()

  def register(df: DataFrame): DataFrame = { frames.add(df); df }

  /** Register persisted RDD ids (localCheckpoint blocks) for release at
    * the next drain — see the class note. */
  def registerRdds(sc: SparkContext, ids: Iterable[Int]): Unit =
    ids.foreach(id => rdds.add((sc, id)))

  /** Unpersist everything registered since the last drain.
    *
    * `blocking = true` is the BARRIER form (r19 verdict item #5): the
    * default non-blocking unpersist is async, and a long session can
    * accumulate dead blocks faster than the executor-side removal and
    * the weak-ref ContextCleaner retire them — pure heap pressure with
    * identical job counts. Drivers with a natural barrier OUTSIDE any
    * timed region (Bench/Verify between queries, batch loops between
    * batches) pass true so each query/batch starts with a clean block
    * manager at any heap size. */
  def drain(blocking: Boolean = false): Unit = {
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = frames.poll()
    }
    var r = rdds.poll()
    while (r != null) {
      val (sc, id) = r
      if (!sc.isStopped) sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking))
      r = rdds.poll()
    }
  }
}
