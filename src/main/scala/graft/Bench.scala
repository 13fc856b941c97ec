package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: run every registered query REPS times at the
  * target SF, emit ONE JSON line with the per-query MEDIAN plus the
  * observed spread and the machine's /proc/loadavg at start and end —
  * so a contended machine can neither fake a regression nor mask one
  * (round 2's recorded bench was 3-4x contention noise; the spread and
  * loadavg fields make that adjudicable from the artifact alone). A
  * query that throws is reported as `-1` in `queries` AND carries its
  * message in `errors` — a failure must never masquerade as a (fast)
  * timing.
  */
object Bench {
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  private final case class QRes(
      name: String, median: Double, min: Double, max: Double, err: Option[String],
      jobs: Seq[Int])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // Optional comma-separated subset for targeted profiling runs; the
    // round artifact is always a full (unfiltered) run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.build("graft-bench")
    // Data-proportional partitions (env override kept) — the knob the
    // x100 tier showed must scale with input, now derived per session.
    GraftSession.tuneShufflePartitions(spark, Seq(sfDir))
    val loadStart = loadavg()
    // Per-rep driver-JOB counts land beside the walls (round-16 verdict
    // item #1): job counts are the drift adjudicator — deterministic per
    // query shape where walls carry box noise. The settle waits run
    // OUTSIDE the timed region.
    val jobCounter = new JobCounter(spark.sparkContext)
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results: Seq[QRes] = selected.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      val jobs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var err: Option[String] = None
      var r = 0
      while (r < reps && err.isEmpty) { // an erroring query is not re-run
        val j0 = jobCounter.settled()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
        finally CacheJanitor.drain()
        jobs += jobCounter.settled() - j0
        r += 1
      }
      if (err.nonEmpty) QRes(name, -1, -1, -1, err, Seq.empty)
      else {
        val sorted = times.sorted
        QRes(name, sorted(sorted.size / 2), sorted.head, sorted.last, None, jobs.toSeq)
      }
    }
    val loadEnd = loadavg()
    def r3(d: Double): String = // 1 ms resolution keeps the stdout line compact
      if (d == -1) "-1" else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results
      .map(q => s"\"${esc(q.name)}\":" + (if (q.err.isEmpty) r3(q.median) else "-1"))
      .mkString("{", ",", "}")
    val spread = results.filter(_.err.isEmpty)
      .map(q => s"\"${esc(q.name)}\":[${q.min},${q.max}]")
      .mkString("{", ",", "}")
    val errs = results.collect { case QRes(k, _, _, _, Some(e), _) => s"\"${esc(k)}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val jobsJson = results.filter(_.err.isEmpty)
      .map(q => s"\"${esc(q.name)}\":[${q.jobs.mkString(",")}]")
      .mkString("{", ",", "}")
    val total = results.collect { case QRes(_, m, _, _, None, _) => m }.sum
    val nErr = results.count(_.err.nonEmpty)
    val common = s""""unit":"sec","reps":$reps,"loadavg_start":"${esc(loadStart)}","loadavg_end":"${esc(loadEnd)}","n_errors":$nErr,"jobs_settle_bound_hits":${jobCounter.boundHits.get()},"sf":"$sfDir""""
    // STDOUT gets the COMPACT line (medians only, 3 dp): the driver's
    // capture clips long lines and then records an unparsed tail
    // (r17 "What's wrong" #2 — BENCH_r17.json arrived with parsed:null).
    // ~3 KB for 108 queries fits any sane buffer.
    println(s"""{"metric":"total","value":${r3(total)},$common,"queries":$qs}""")
    // The FULL record (exact medians, per-rep spread + job counts, error
    // detail) always lands in a file — committed as BENCH_raw_r{N}.json.
    val full = s"""{"metric":"total","value":$total,$common,"queries":${results
      .map(q => s"\"${esc(q.name)}\":" + (if (q.err.isEmpty) q.median else -1))
      .mkString("{", ",", "}")},"spread":$spread,"jobs":$jobsJson,"errors":$errs}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_raw_HEAD.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    spark.stop()
  }
}
