package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Evidence run for the cosine code log's bucket-group pruned probe
  * (round-14; the r13 verdict's "last corpus-linear term"): a 200k-
  * vector corpus is bulk-ingested, compacted into the `pgrp=` fold
  * layout, and then SMALL increments stream in — the regime the
  * pruning serves. Per batch it records the bytes the REAL ingest read
  * (pruned path) next to a contrast pass running the identical pair
  * detection over the unpruned full view, so the artifact carries the
  * curve bend in-file: pruned bytes ≈ expected-hit-fraction × full
  * bytes (+ increment overhead), while the unpruned control stays
  * corpus-linear.
  *
  * Increment sizes are deliberately SMALL (default 20 and 5 vectors):
  * the committed hit-count arithmetic (CosineDedupIndex's fold-layout
  * note) says K = |inc|·(log2 mask + 1) probe keys over G groups hit
  * ~G·(1-e^(-K/G)) of them — at 200k vectors (mask 16384, G 1024) a
  * 20-vector batch probes ~25% of groups, a 2000-vector vecloop batch
  * saturates them (and is gated to the full read, which is then
  * output-bound, not waste). This bench exists to measure the regime
  * where the layout binds; SCALEBENCH's vecloop keeps measuring the
  * saturated one.
  *
  * Env: `SPARK_GRAFT_SF_DIR` (seed, default sf0.1),
  * `SPARK_GRAFT_VECPRUNE_DIR` (work dir), `SPARK_GRAFT_VECPRUNE_FACTOR`
  * (corpus replicas, default 100 ≈ 200k vectors),
  * `SPARK_GRAFT_VECPRUNE_BATCHES` (default 10),
  * `SPARK_GRAFT_VECPRUNE_SIZES` (default "20,5"),
  * `SPARK_GRAFT_VECPRUNE_OUT_JSON` (artifact file).
  */
object VecPruneBench {

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")

  def main(args: Array[String]): Unit = {
    val seedDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = sys.env.getOrElse("SPARK_GRAFT_VECPRUNE_DIR", "target/vecprune")
    val factor = sys.env.getOrElse("SPARK_GRAFT_VECPRUNE_FACTOR", "100").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_VECPRUNE_BATCHES", "10").toInt
    val sizes = sys.env.getOrElse("SPARK_GRAFT_VECPRUNE_SIZES", "20,5")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.build("graft-vecprune-bench")
    graft.functions.GraftFunctions.registerAll(spark)
    val loadStart = loadavg()

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { bytesRead.addAndGet(m.inputMetrics.bytesRead); () }
      }
    })
    def measured[T](fn: => T): (T, Double) = {
      val b0 = bytesRead.get(); val r = fn; (r, (bytesRead.get() - b0) / 1e6)
    }
    // Deterministic post-pruning scan accounting: execute the frame's
    // OWN plan and sum the leaf scans' numFiles/filesSize for relations
    // under `substr` — partition-filter pruning lands exactly here
    // (selected files), with none of the listener's async smearing or
    // tiny-file IO overhead in the way. Returns (rows, files, sizeMb).
    def scanAccounted(df: org.apache.spark.sql.DataFrame, substr: String): (Long, Long, Double) = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val rows = df.queryExecution.toRdd.count()
      // The pair pipeline persists its corpus-side frames (candRaw/cv),
      // so the REAL file scans live inside the caches' materialization
      // plans — descend through InMemoryTableScanExec too.
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scans(c.relation.cachedPlan)
        case s: FileSourceScanExec => Seq(s)
        case o => o.children.flatMap(scans)
      }
      val ss = scans(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.exists(_.toString.contains(substr)))
      (rows, ss.map(_.metrics("numFiles").value).sum,
        ss.map(_.metrics("filesSize").value).sum / 1e6)
    }

    val seedEmb = spark.read.parquet(s"$seedDir/embeddings.parquet")
    val corpus = (0 until factor).map(ScaleBench.rotatedEmbeddings(seedEmb, _))
      .reduce(_ unionAll _).select("vec_id", "embedding")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

    val runs = sizes.map { incSize =>
      val root = s"$workDir/root_inc$incSize"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      // Bulk bootstrap: one batch freezes the mask at the full-corpus
      // ladder step; compaction lays the fold out under pgrp=.
      val t0 = System.nanoTime()
      graft.operators.CosineDedupIndex.ingest(spark, root, corpus,
        batchKey = Some("bulk")).deltaPairs // lazy - bootstrap pairs not the subject
      graft.CacheJanitor.drain()
      graft.operators.CosineDedupIndex.compact(spark, root)
      val bootSec = (System.nanoTime() - t0) / 1e9
      val mask = graft.operators.CosineDedupIndex.frozenMask(spark, root).get
      val g = graft.operators.CosineDedupIndex.pgrpGroupsFor(mask)
      val liveProbes = java.lang.Long.numberOfTrailingZeros(mask) + 1
      val hitEst = 1.0 - math.pow(1.0 - 1.0 / g, (incSize * liveProbes).toDouble)
      println(s"# inc=$incSize boot=${f(bootSec)}s mask=$mask g=$g hit_est=${f(hitEst)}")

      val rows = (0 until batches).map { b =>
        // Fresh ids beyond the corpus replicas, rotated like the tier.
        val inc = ScaleBench.rotatedEmbeddings(seedEmb, factor + b + incSize * 1000)
          .select("vec_id", "embedding")
          .orderBy("vec_id").limit(incSize)
        val (bt, ingestMb) = measured {
          graft.operators.CosineDedupIndex.ingest(spark, root, inc,
            batchKey = Some(s"vp_${incSize}_$b"))
        }
        // The REAL batch path's pair frame (built on the pruned live
        // view) vs the unpruned contrast — same answer (required), scan
        // accounting from the executed plans' selected files.
        val (prunedPairs, prunedFiles, prunedSizeMb) = scanAccounted(bt.deltaPairs, root)
        val full = graft.operators.CosineDedupIndex.deltaPairs(
          graft.operators.CosineDedupIndex.readIndex(spark, root),
          bt.newCodes, Some(mask))
        val (fullPairs, fullFiles, fullSizeMb) = scanAccounted(full, root)
        require(fullPairs == prunedPairs,
          s"pruned/full pair counts diverged: $prunedPairs vs $fullPairs")
        graft.CacheJanitor.drain()
        println(s"#   batch $b pairs=$prunedPairs " +
          s"pruned_files=$prunedFiles/${f(prunedSizeMb)}MB " +
          s"full_files=$fullFiles/${f(fullSizeMb)}MB ingest_read=${f(ingestMb)}MB")
        (b, prunedPairs, prunedFiles, prunedSizeMb, fullFiles, fullSizeMb, ingestMb)
      }
      val ratios = rows.map(r => r._4 / math.max(r._6, 0.001)).sorted
      (incSize, mask, g, hitEst, rows, ratios(ratios.size / 2))
    }

    val loadEnd = loadavg()
    val json = runs.map { case (incSize, mask, g, hitEst, rows, medRatio) =>
      val batchJson = rows.map { case (b, pairs, pf, pm, ff, fm, im) =>
        s"""{"batch":$b,"pairs":$pairs,"pruned_files":$pf,"pruned_scan_mb":${f(pm)},""" +
          s""""full_files":$ff,"full_scan_mb":${f(fm)},"ingest_wall_read_mb":${f(im)}}"""
      }.mkString("[", ",", "]")
      s""""inc$incSize":{"increment":$incSize,"mask":$mask,"groups":$g,""" +
        s""""expected_hit_fraction":${f(hitEst)},"median_pruned_over_full":${f(medRatio)},""" +
        s""""batches":$batchJson}"""
    }.mkString(
      s"""{"metric":"vecprune","seed":"$seedDir","factor":$factor,""" +
        s""""cpus":${GraftSession.cpus},""",
      ",",
      s""","loadavg_start":"$loadStart","loadavg_end":"$loadEnd"}""")
    println(json)
    sys.env.get("SPARK_GRAFT_VECPRUNE_OUT_JSON").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
