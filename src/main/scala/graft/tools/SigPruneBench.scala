package graft.tools

import graft.GraftSession
import graft.operators.SignatureIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence run for the signature index's shingle-group (`hgrp=`) and
  * doc-group (`dgrp=`) fold layouts (round-14: the r13 scale ledger's
  * "residual corpus term" — the df-log scan — plus the posting and
  * signature fold reads a matched increment used to pay in full): a
  * 500k-doc corpus (the x100loop tier) is bulk-ingested and compacted
  * into the partitioned fold layout, then SMALL increments of
  * near-dup mutations stream in — each one matching the fold, the
  * worst case matched-batch pruning alone cannot help. Per batch the
  * artifact records, for each of the three logs, the files/bytes the
  * REAL ingest's pair frame scanned next to a contrast pass running
  * the identical `deltaPairsIndexed` with pruning force-disabled
  * (`graft.fold.pruning.disable`) — identical pair counts required.
  *
  * Regimes, by the committed arithmetic (K ≈ |inc|·~48 shingles over
  * G = 1953 groups): 1-doc probes hit ~2% of groups, 20-doc ~39%,
  * 100-doc batches cross the 0.7 saturation gate and take the full
  * df/posting read BY DESIGN — while the `dgrp` verify prune binds at
  * every size (candidates stay increment-bounded). The default
  * x100loop shape (5000-doc batches) saturates everything and stays
  * measured by ScaleBench; this bench measures the point-probe regime
  * the layouts serve.
  *
  * Env: `SPARK_GRAFT_SF_DIR` (seed, default sf0.1),
  * `SPARK_GRAFT_SIGPRUNE_DIR` (work dir),
  * `SPARK_GRAFT_SIGPRUNE_FACTOR` (corpus replicas, default 100),
  * `SPARK_GRAFT_SIGPRUNE_BATCHES` (default 5),
  * `SPARK_GRAFT_SIGPRUNE_SIZES` (default "100,20,5,1"),
  * `SPARK_GRAFT_SIGPRUNE_OUT_JSON` (artifact file).
  */
object SigPruneBench {

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")

  /** Deterministic post-pruning scan accounting from the executed
    * plan's selected files (partition-filter pruning is invisible to
    * wall-clock byte listeners and logical FileIndex listings alike),
    * summed per log substring. Persisted frames are SHARED — the same
    * InMemoryRelation hangs under several InMemoryTableScanExec nodes
    * while its scans executed once — so relations and scan nodes
    * dedupe by reference identity. Returns rows, a CONTENT digest
    * (order-insensitive sum of per-row xxhash64 over the full
    * `(doc_a, doc_b, jaccard)` row — pair SETS and values must match
    * between arms, not just counts: compensating errors where one pair
    * is dropped and another gained would pass a bare count), and, per
    * substring, (files, MB). */
  private def scanAccounted(df: DataFrame,
      substrs: Seq[String]): (Long, Long, Map[String, (Long, Double)]) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // One action computes count + digest; its executed plan carries the
    // pair frame's scans (the agg sits above them, scan shapes
    // untouched), so the metrics walk below sees the same numbers the
    // previous toRdd.count() form recorded.
    // bit_xor, not sum: ANSI mode (Spark 4 default) overflows a sum of
    // full-range xxhash64 longs; xor is order-insensitive and total.
    val probe = df.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(doc_a, doc_b, jaccard))"), lit(0L)).as("dig"))
    val r = probe.collect()(0)
    val (rows, digest) = (r.getLong(0), r.getLong(1))
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        if (seen.add(c.relation.cachedPlan)) scans(c.relation.cachedPlan) else Nil
      case s: FileSourceScanExec => if (seen.add(s)) Seq(s) else Nil
      case o => o.children.flatMap(scans)
    }
    val ss = scans(probe.queryExecution.executedPlan)
    val acc = substrs.map { sub =>
      val hit = ss.filter(_.relation.location.rootPaths.exists(_.toString.contains(sub)))
      sub -> (hit.map(_.metrics("numFiles").value).sum,
        hit.map(_.metrics("filesSize").value).sum / 1e6)
    }.toMap
    (rows, digest, acc)
  }

  def main(args: Array[String]): Unit = {
    val seedDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = sys.env.getOrElse("SPARK_GRAFT_SIGPRUNE_DIR", "target/sigprune")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SIGPRUNE_FACTOR", "100").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_SIGPRUNE_BATCHES", "5").toInt
    val sizes = sys.env.getOrElse("SPARK_GRAFT_SIGPRUNE_SIZES", "100,20,5,1")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.build("graft-sigprune-bench")
    graft.functions.GraftFunctions.registerAll(spark)
    val loadStart = loadavg()
    val logs = Seq("signatures_dfcounts", "signatures_postings", "signatures/batch_key=")

    val seedDocs = spark.read.parquet(s"$seedDir/documents.parquet")
    val corpus = (0 until factor).map(ScaleBench.saltedDocs(seedDocs, _))
      .reduce(_ unionAll _).select("doc_id", "text")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val root = s"$workDir/root"
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    // Bulk bootstrap (pair detection lazy — not the subject), then
    // compaction lays all three logs out under their fold groups.
    val t0 = System.nanoTime()
    SignatureIndex.ingest(spark, root, corpus, batchKey = Some("bulk"))
    graft.CacheJanitor.drain()
    SignatureIndex.compact(spark, root)
    val bootSec = (System.nanoTime() - t0) / 1e9
    val corpusRows = graft.operators.BatchLog
      .committedRowCount(spark, s"$root/signatures").getOrElse(-1L)
    // Per-log byte-derived fold group counts, from the sidecars the
    // probes themselves consult.
    val foldKey = graft.operators.BatchLog.committedKeys(spark, s"$root/signatures").head
    def gOf(log: String, sidecar: String): Int =
      graft.operators.BatchLog.readGroupsSidecar(spark,
        graft.operators.BatchLog.dirOfResolved(spark, log, foldKey), sidecar).getOrElse(1)
    val gDf = gOf(SignatureIndex.dfDir(root), SignatureIndex.hgrpSidecarName)
    val gPost = gOf(SignatureIndex.postingsDir(root), SignatureIndex.hgrpSidecarName)
    val gSig = gOf(s"$root/signatures", SignatureIndex.dgrpSidecarName)
    println(s"# boot=${f(bootSec)}s corpus_sig_rows=$corpusRows groups df=$gDf post=$gPost sig=$gSig")

    val runs = sizes.map { incSize =>
      val rows = (0 until batches).map { b =>
        // Near-dup mutations of seed docs (one appended token): every
        // increment doc pairs with its corpus original, so the fold IS
        // matched — the regime matched-batch pruning alone cannot prune.
        val inc = seedDocs
          .where(pmod(col("doc_id"), lit(101)) === lit((b + incSize) % 101))
          .orderBy("doc_id").limit(incSize)
          .select(
            (col("doc_id") + lit((2000L + b + incSize * 10L) * ScaleBench.idStride)).as("doc_id"),
            concat(col("text"), lit(s" zzmut${incSize}x$b")).as("text"))
        val key = s"sp_${incSize}_$b"
        val tIn0 = System.nanoTime()
        val bt = SignatureIndex.ingest(spark, root, inc, batchKey = Some(key))
        val prunedSec = (System.nanoTime() - tIn0) / 1e9
        // Scan accounting on FRESH deltaPairsIndexed calls: ingest's own
        // internal actions (the matched collect) already materialized
        // the probe caches, so re-executing ITS frame would read cache
        // and report zero file scans. Drain between arms — the cache
        // manager would otherwise serve the second arm from the first's
        // persisted (plan-identical) probe frames.
        graft.CacheJanitor.drain()
        val sKey = Some(graft.operators.BatchLog.sanitize(key))
        val (pairs, digest, acc) = scanAccounted(
          SignatureIndex.deltaPairsIndexed(spark, root, "signatures",
            bt.newSigs, sKey), logs)
        graft.CacheJanitor.drain()
        // Contrast arm: identical probe, pruning force-disabled.
        System.setProperty("graft.fold.pruning.disable", "true")
        val (fullPairs, fullDigest, accF) =
          try scanAccounted(SignatureIndex.deltaPairsIndexed(spark, root,
            "signatures", bt.newSigs, sKey), logs)
          finally System.clearProperty("graft.fold.pruning.disable")
        require(fullPairs == pairs && fullDigest == digest,
          s"pruned/full answers diverged: $pairs/$digest vs $fullPairs/$fullDigest " +
            "(count AND row-content digest must both match)")
        graft.CacheJanitor.drain()
        val show = logs.map(l => s"$l ${acc(l)._1}f/${f(acc(l)._2)}MB " +
          s"vs ${accF(l)._1}f/${f(accF(l)._2)}MB").mkString("  ")
        println(s"#   inc=$incSize batch=$b pairs=$pairs wall=${f(prunedSec)}s  $show")
        (b, pairs, prunedSec, acc, accF)
      }
      val ratio = logs.map { l =>
        val rs = rows.map(r => r._4(l)._2 / math.max(r._5(l)._2, 0.001)).sorted
        l -> rs(rs.size / 2)
      }.toMap
      (incSize, rows, ratio)
    }

    val loadEnd = loadavg()
    val json = runs.map { case (incSize, rows, ratio) =>
      val batchJson = rows.map { case (b, pairs, sec, acc, accF) =>
        val per = logs.map(l =>
          s""""${l.replace("/batch_key=", "")}":{"pruned_files":${acc(l)._1},""" +
            s""""pruned_mb":${f(acc(l)._2)},"full_files":${accF(l)._1},""" +
            s""""full_mb":${f(accF(l)._2)}}""").mkString(",")
        s"""{"batch":$b,"pairs":$pairs,"ingest_sec":${f(sec)},$per}"""
      }.mkString("[", ",", "]")
      val med = logs.map(l =>
        s""""${l.replace("/batch_key=", "")}":${f(ratio(l))}""").mkString(",")
      s""""inc$incSize":{"increment":$incSize,"median_pruned_over_full":{$med},""" +
        s""""batches":$batchJson}"""
    }.mkString(
      s"""{"metric":"sigprune","seed":"$seedDir","factor":$factor,""" +
        s""""corpus_sig_rows":$corpusRows,"groups_df":$gDf,"groups_post":$gPost,""" +
        s""""groups_sig":$gSig,"boot_sec":${f(bootSec)},""" +
        s""""cpus":${GraftSession.cpus},""",
      ",",
      s""","loadavg_start":"$loadStart","loadavg_end":"$loadEnd"}""")
    println(json)
    sys.env.get("SPARK_GRAFT_SIGPRUNE_OUT_JSON").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
