package graft.tools

import graft.{CacheJanitor, GraftSession}
import graft.star.{MergeRunner, Runner, StarBench}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The star loop's scale evidence (round-12 verdict item #1): per-batch
  * latency of the landing→star pipeline over a GROWING landing log,
  * replay vs merge.
  *
  *  - **replay loop** ([[Runner.runOnce]], the reference semantics):
  *    every batch re-reads the whole landing history, so batch cost
  *    grows with history — the r11 STREAMBENCH measured 8.6 → 10.4 s
  *    over just ten batches at sf0.01. A bounded number of batches
  *    (they get slower) establishes the slope.
  *  - **merge loop** ([[MergeRunner.runOnce]], stable id policies):
  *    each batch folds only its own increments; the p50 must stay FLAT
  *    across the full run — first-half vs second-half p50 is the
  *    headline pair.
  *
  * After the loops, ONE full-log replay ([[Runner.processBatch]],
  * stable ids) runs over the merge loop's landing into a fresh root
  * and every star snapshot is compared row-for-row — the bench
  * re-proves at scale what `MergeStarSpec` pins at unit size.
  *
  * Env knobs: `SPARK_GRAFT_STARLOOP_SF_DIR` (default sf0.01),
  * `SPARK_GRAFT_STARLOOP_BATCHES` (merge loop length, default 100),
  * `SPARK_GRAFT_STARLOOP_REPLAY_BATCHES` (replay loop length, default
  * 20 — enough for the slope; the point of the artifact is the merge
  * loop), `SPARK_GRAFT_STARLOOP_DIR`, `SPARK_GRAFT_STARLOOP_OUT_JSON`.
  */
object StarLoopBench {

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")

  private def p50(xs: Seq[Double]): Double = {
    val s = xs.sorted; if (s.isEmpty) 0.0 else s(s.size / 2)
  }

  /** Fact-source slice cutoffs — N last_updated quantiles, as in
    * StreamBench: even row volume per batch, dims constant. */
  private[tools] def cutoffs(srcs: Map[String, DataFrame], n: Int): Seq[Any] = {
    val factTs = Seq("sales_order", "purchase_order", "payment", "transaction")
      .map(t => srcs(t).select(col("last_updated").as("ts")))
      .reduce(_ unionAll _)
    val qs = (1 to n).map(_.toDouble / n)
    factTs.selectExpr(
      s"percentile_approx(ts, array(${qs.mkString(",")}), 10000) AS c")
      .collect()(0).getSeq[Any](0).toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_STARLOOP_SF_DIR", "/root/testdata/sf0.01")
    val nMerge = sys.env.getOrElse("SPARK_GRAFT_STARLOOP_BATCHES", "100").toInt.max(4)
    val nReplay = sys.env.getOrElse("SPARK_GRAFT_STARLOOP_REPLAY_BATCHES", "20").toInt.max(0)
    val workDir = sys.env.getOrElse("SPARK_GRAFT_STARLOOP_DIR", "target/starloop")
    val spark = GraftSession.build("graft-star-loop")
    val loadStart = loadavg()
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(workDir), true)

    val srcs = StarBench.sources(spark, sfDir)
    val constantTs = srcs.keys.filter { t =>
      val mm = srcs(t).agg(min("last_updated"), max("last_updated")).collect()(0)
      mm.get(0) == mm.get(1)
    }.toSet

    def runLoop(n: Int, tag: String)(
        batch: (Map[String, DataFrame], String, Int) => Unit): Seq[Double] = {
      val cuts = cutoffs(srcs, n)
      (0 until n).map { b =>
        val sliced = srcs.map { case (t, df) =>
          t -> (if (constantTs(t)) df else df.where(col("last_updated") <= lit(cuts(b))))
        }
        val t0 = System.nanoTime()
        batch(sliced, f"2025-09-02 10:00:00.${b}%03d", b)
        val dt = (System.nanoTime() - t0) / 1e9
        CacheJanitor.drain()
        println(s"# $tag batch $b  ${f(dt)}s")
        dt
      }
    }

    // --- merge loop (the headline): N batches, flat p50 --------------
    val mergeTrace = runLoop(nMerge, "merge") { (sliced, id, _) =>
      MergeRunner.runOnce(spark, sliced,
        s"$workDir/m_landing", s"$workDir/m_processed", s"$workDir/m_state.json", id)
    }

    // --- replay loop (the reference semantics): bounded, for the slope
    val replayTrace = runLoop(nReplay, "replay") { (sliced, id, _) =>
      Runner.runOnce(spark, sliced,
        s"$workDir/r_landing", s"$workDir/r_processed", s"$workDir/r_warehouse",
        s"$workDir/r_state.json", id)
    }

    // --- equality proof at loop scale ---------------------------------
    val truthRoot = s"$workDir/m_replay_truth"
    Runner.processBatch(spark, s"$workDir/m_landing", truthRoot,
      graft.model.Schemas.sources.keySet,
      stableDateIds = true, stableRecordIds = true)
    val equal = graft.sources.LandingLog.listSnapshots(truthRoot).forall { key =>
      val a = graft.sources.LandingLog.readSnapshot(spark, s"$workDir/m_processed", key)
      val b = graft.sources.LandingLog.readSnapshot(spark, truthRoot, key)
      val cols = b.columns.toSeq
      a.count() == b.count() &&
        a.select(cols.map(col): _*).exceptAll(b.select(cols.map(col): _*)).isEmpty
    }
    val loadEnd = loadavg()

    val mh = mergeTrace.drop(1) // batch 0 pays dims + warmup
    val (m1, m2) = mh.splitAt(mh.size / 2)
    val rh = replayTrace.drop(1)
    val (r1, r2) = rh.splitAt(rh.size / 2)
    val json =
      s"""{"metric":"star_loop","sf":"$sfDir","merge_batches":$nMerge,""" +
        s""""replay_batches":$nReplay,"snapshots_equal":$equal,""" +
        s""""merge_batch_sec":[${mergeTrace.map(f).mkString(",")}],""" +
        s""""merge_p50_first_half":${f(p50(m1))},"merge_p50_second_half":${f(p50(m2))},""" +
        s""""replay_batch_sec":[${replayTrace.map(f).mkString(",")}],""" +
        s""""replay_p50_first_half":${f(p50(r1))},"replay_p50_second_half":${f(p50(r2))},""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_STARLOOP_OUT_JSON").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
