package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Per-JOB wall-time attribution for a registered query (optimization
  * round tooling, guide §1): runs the named queries once cold + once
  * timed, with a listener recording every Spark job's duration and
  * call site, so a 70-job lifecycle query's cost is attributable to
  * its operators instead of a single total. Output: one line per job
  * (start-ordered) plus a call-site rollup, on stdout.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.JobProfile t75_persisted_topk"
  */
object JobProfile {
  private final case class J(id: Int, desc: String, site: String,
      start: Long, var end: Long = -1L)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("t75_persisted_topk")
    val spark = graft.GraftSession.build("graft-jobprofile")
    graft.GraftSession.tuneShufflePartitions(spark, Seq(dir))
    val jobs = TrieMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        // First graft frame in the job's stage stack — the operator that
        // submitted the action (callSite.short is not set in local runs).
        val site = e.stageInfos.headOption.map(_.details).getOrElse("")
          .split('\n').find(l => l.contains("graft.") && !l.contains("JobProfile"))
          .getOrElse("").trim.take(90)
        jobs.put(e.jobId, J(e.jobId, desc, site, e.time))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
    }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // Warmup rep (JIT + codegen + FS caches drained after), then the
      // profiled rep — mirrors Bench's repetition discipline.
      fn(spark, dir).count(); graft.CacheJanitor.drain()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      graft.CacheJanitor.drain()
      val js = jobs.values.toSeq.sortBy(_.start)
      val acc = js.filter(_.end > 0).map(j => (j.end - j.start) / 1e3).sum
      println(f"==== $n wall=$wall%.2f s, jobs=${js.size}, job-time-sum=$acc%.2f s ====")
      var prevEnd = if (js.nonEmpty) js.head.start else 0L
      js.foreach { j =>
        val d = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gap = (j.start - prevEnd) / 1e3
        if (j.end > 0) prevEnd = math.max(prevEnd, j.end)
        println(f"[job] ${j.id}%4d ${d}%7.3f s  gap=$gap%7.3f s  site=${j.site}  desc=${j.desc.take(100)}")
      }
      println("---- rollup by call site ----")
      js.filter(_.end > 0).groupBy(_.site).toSeq
        .map { case (s, g) => (s, g.map(j => (j.end - j.start) / 1e3).sum, g.size) }
        .sortBy(-_._2)
        .foreach { case (s, t, c) => println(f"[site] $t%7.3f s  n=$c%3d  $s") }
    }
    spark.stop()
  }
}
