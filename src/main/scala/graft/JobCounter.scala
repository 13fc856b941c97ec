package graft

/** Driver-job counter over a `SparkListener` — the adjudication
  * instrument that settled the last three wall-clock drift disputes
  * (t74 in round 14, t75/t68 in round 16: job counts flat ⇒ box load,
  * not regression), lifted out of the one-off probes into the STANDING
  * artifacts (round-16 verdict item #1): `Bench` records per-query
  * per-rep job counts beside the walls, `ScaleBench`'s maintenance
  * loops record per-batch counts beside `run_input_mb`. A future drift
  * question starts from the committed artifact instead of a dedicated
  * adjudication session.
  *
  * Job-start events post asynchronously on the listener bus, so a raw
  * read taken right after an action may miss stragglers; [[settled]]
  * polls until the count stops moving (bounded), which on this bus
  * drains in one or two 25 ms ticks. Call it OUTSIDE timed regions —
  * the settle wait must never land in a recorded wall.
  */
final class JobCounter(sc: org.apache.spark.SparkContext) {
  private val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
  sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
  })

  /** Times [[settled]] hit its 2 s bound and returned a possibly
    * mid-drain count — artifacts that promote job counts to a drift
    * adjudicator surface this so an approximate read is never presented
    * as exact (r17 advisory). */
  val boundHits = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The count once it has been stable for TWO consecutive 25 ms polls
    * (bounded at 2 s): one quiet poll can land inside a listener-bus
    * stall >25 ms and misattribute straggler jobs to the adjacent
    * rep/phase (r17 advisory). Hitting the bound still reports the
    * count but increments [[boundHits]]. */
  def settled(): Int = {
    var prev = jobs.get()
    var stable = 0
    var waited = 0
    while (waited < 2000) {
      Thread.sleep(25)
      val now = jobs.get()
      if (now == prev) { stable += 1; if (stable >= 2) return now }
      else stable = 0
      prev = now
      waited += 25
    }
    boundHits.incrementAndGet()
    prev
  }
}
