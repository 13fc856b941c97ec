package graft.tools

import org.apache.spark.sql.functions._

/** Round-16 adjudication of the r15 verdict's watch item: t75 (5.01 →
  * 5.68 → 6.42 s) and t68 (4.16 → 5.09 → 6.38 s) drifted monotonically
  * across BENCH_raw_r14 → r15 → r15_part2. The house rule (earned
  * twice) says gate-scale constants are JOB counts, not wall-clock —
  * this decomposes both queries' exact shapes into legs and counts
  * Spark jobs per leg per rep, with t75 run in BOTH arms (manifest
  * reader live vs `graft.fold.manifest.disable=true`, the
  * pre-manifest read path d1db38d replaced), so a job-count or
  * leg-wall delta attributable to the manifest reader is isolated
  * from box noise. t68 never touches a persisted BatchLog root (its
  * legs are frame-level deltaPairs/mergeFrames) — if its job counts
  * match across reps and arms, its drift is adjudicated as load,
  * not regression.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_DRIFT_REPS
  * (default 5), SPARK_GRAFT_DRIFT_OUT_JSON (artifact file).
  */
object DriftProbe {

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    catch { case _: Throwable => "unavailable" }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_DRIFT_REPS", "5").toInt
    val spark = graft.GraftSession.build("graft-drift-probe")
    graft.GraftSession.tuneShufflePartitions(spark, Seq(dir))
    graft.functions.GraftFunctions.registerAll(spark)
    val loadStart = loadavg()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    // legs(tag) = (seconds, jobCount) per recorded call
    val legs = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Int, Double, Int)] // (query, leg, rep, sec, jobs)
    def time[T](query: String, leg: String, rep: Int)(body: => T): T = {
      val t0 = System.nanoTime(); val j0 = jobs.get()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      legs += ((query, leg, rep, sec, jobs.get() - j0))
      println(f"[drift] $query/$leg rep=$rep ${sec}%.2f s jobs=${jobs.get() - j0}")
      r
    }

    // ---- t75 exact shape (TrainingData.t75), split into legs --------
    def t75(rep: Int, arm: String): Unit = {
      val qn = s"t75_$arm"
      val root = java.nio.file.Files.createTempDirectory("graft_drift75").toString
      val emb = graft.Tables.embeddings(spark, dir)
      val vecs = emb.selectExpr("vec_id", "embedding")
      time(qn, "ingest_h1", rep)(graft.operators.AnnIndex.ingest(spark, root,
        vecs.where("vec_id % 2 = 0"), batchKey = Some("h1")))
      time(qn, "ingest_h2", rep)(graft.operators.AnnIndex.ingest(spark, root,
        vecs.where("vec_id % 2 = 1"), batchKey = Some("h2")))
      time(qn, "refreeze", rep)(graft.operators.AnnIndex.refreeze(spark, root, vecs))
      val qs = emb.where("vec_id % 100 = 0 AND vec_id < 2500")
        .selectExpr("vec_id AS query_id", "embedding")
      time(qn, "topk_count", rep)(
        graft.operators.AnnIndex.topK(spark, root, qs, 3, rerank = Some(vecs))
          .orderBy(col("query_id"), col("rnk")).count())
      graft.CacheJanitor.drain()
    }

    // ---- t76 exact shape (PqIndex lifecycle), split into legs -------
    // (r17 verdict item 2: t75 AND t76 are the bench's two most
    // expensive queries; both are two-halved-ingest + refreeze + topK
    // lifecycles, so the same leg decomposition applies.)
    def t76(rep: Int): Unit = {
      val qn = "t76"
      val root = java.nio.file.Files.createTempDirectory("graft_drift76").toString
      val emb = graft.Tables.embeddings(spark, dir)
      val vecs = emb.selectExpr("vec_id", "embedding")
      time(qn, "ingest_h1", rep)(graft.operators.PqIndex.ingest(spark, root,
        vecs.where("vec_id % 2 = 0"), batchKey = Some("h1")))
      time(qn, "ingest_h2", rep)(graft.operators.PqIndex.ingest(spark, root,
        vecs.where("vec_id % 2 = 1"), batchKey = Some("h2")))
      time(qn, "refreeze", rep)(graft.operators.PqIndex.refreeze(spark, root, vecs))
      val qs = emb.where("vec_id % 100 = 0 AND vec_id < 2500")
        .selectExpr("vec_id AS query_id", "embedding")
      time(qn, "topk_count", rep)(
        graft.operators.PqIndex.topK(spark, root, qs, 3, rerank = Some(vecs))
          .orderBy(col("query_id"), col("rnk")).count())
      graft.CacheJanitor.drain()
    }

    // ---- t68 exact shape (TrainingData.t68), split into legs --------
    def t68(rep: Int): Unit = {
      val qn = "t68"
      val sigs = graft.CacheJanitor.register(
        graft.operators.SignatureIndex.signatures(
          graft.Tables.documents(spark, dir)).persist())
      val even = sigs.where("doc_id % 2 = 0")
      val odd = sigs.where("doc_id % 2 = 1")
      val none = spark.range(0).select(col("id").as("doc_id"), col("id").as("label"))
      val pairs1 = graft.operators.SignatureIndex.deltaPairs(even, even)
        .select("doc_a", "doc_b")
      val labels1 = time(qn, "merge1", rep)(graft.CacheJanitor.register(
        graft.operators.ClusterLabels.mergeFrames(none, pairs1, even.select("doc_id"))
          .persist()))
      val pairs2 = graft.operators.SignatureIndex.deltaPairs(sigs, odd)
        .select("doc_a", "doc_b")
      val labels2 = time(qn, "merge2", rep)(graft.operators.ClusterLabels
        .mergeFrames(labels1, pairs2, odd.select("doc_id")))
      time(qn, "agg_count", rep)(
        labels2.groupBy(col("label").as("cluster_id"))
          .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_member"))
          .orderBy("cluster_id").count())
      graft.CacheJanitor.drain()
    }

    for (rep <- 0 until reps) {
      println(s"[drift] === rep $rep ===")
      t75(rep, "manifest")
      sys.props("graft.fold.manifest.disable") = "true"
      try t75(rep, "listing")
      finally sys.props -= "graft.fold.manifest.disable"
      t76(rep)
      t68(rep)
    }

    val loadEnd = loadavg()
    // JSON: per (query, leg): all rep walls + job counts.
    val byLeg = legs.groupBy(l => (l._1, l._2)).toSeq.sortBy(_._1)
    val legJson = byLeg.map { case ((q, leg), rs) =>
      val sorted = rs.sortBy(_._3)
      s""""${q}__$leg":{"walls":[${sorted.map(r => f(r._4)).mkString(",")}],""" +
        s""""jobs":[${sorted.map(_._5).mkString(",")}]}"""
    }.mkString(",")
    val totals = legs.groupBy(_._1).toSeq.sortBy(_._1).map { case (q, rs) =>
      val perRep = rs.groupBy(_._3).map(_._2.map(_._4).sum).toSeq.sorted
      s""""$q":{"wall_min":${f(perRep.min)},"wall_med":${f(perRep(perRep.size / 2))}}"""
    }.mkString(",")
    // Round-agnostic label (the r18 artifact shipped with a stale
    // "_r16" suffix baked in — round identity belongs to the FILE
    // name, not the metric key round tooling joins on).
    val json =
      s"""{"metric":"drift_adjudicate","sf_dir":"$dir","reps":$reps,""" +
        s""""cpus":${graft.GraftSession.cpus},"legs":{$legJson},""" +
        s""""totals":{$totals},""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd"}"""
    println(json)
    sys.env.get("SPARK_GRAFT_DRIFT_OUT_JSON").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
    }
    spark.stop()
  }
}
