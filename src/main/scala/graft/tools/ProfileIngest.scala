package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing of one DedupPipeline.runOnce batch — attributes
  * the per-batch wall-time to signature build / log appends / derived
  * maintenance / pair detection / label merge / stats counts, so a
  * batch-path regression is a phase, not a total.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfileIngest"
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("profile-ingest")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_PROFILE_BATCHES", "4").toInt
    val root = java.nio.file.Files.createTempDirectory("graft_profile_ingest").toString
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile]   $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
    })
    def counters(tag: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val s0 = stages.get(); f
      println(s"[profile]     $tag: jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val per = n / batches
    for (b <- 0 until batches) {
      println(s"[profile] batch $b (~$per docs, doc_id % $batches == $b; " +
        s"accumulated corpus ${b * per} -> ${(b + 1) * per})")
      val inc = docs.where(col("doc_id") % batches === b)
        .select("doc_id", "text")
      graft.operators.WriterLease.withLease(spark, root) {
        val path = s"$root/signatures"
        val newCached = time("signatures+persist") {
          val s = graft.CacheJanitor.register(
            graft.operators.SignatureIndex.signatures(inc).persist())
          s.count(); s
        }
        val key = time("resolveKey")(
          graft.operators.BatchLog.resolveKey(spark, path, Some(s"p$b")))
        val covered = time("coverage probe")(
          graft.operators.SignatureIndex.derivedCovered(spark, root))
        time("sig append")(
          graft.operators.BatchLog.appendResolved(newCached, path, key, "profile"))
        time("derived maintain")(
          graft.operators.SignatureIndex.maintainDerived(
            spark, root, "signatures", key, newCached, covered))
        var pairs: org.apache.spark.sql.DataFrame = null
        counters("indexed") { time("deltaPairsIndexed count") {
          val p = graft.CacheJanitor.register(
            graft.operators.SignatureIndex
              .deltaPairsIndexed(spark, root, "signatures", newCached)
              .select(col("doc_a"), col("doc_b")).persist())
          println(s"[profile]     pairs=${p.count()}"); pairs = p
        } }
        counters("frame") { time("frame deltaPairs count (old path, for contrast)") {
          val all = graft.operators.SignatureIndex.readIndex(spark, root)
          println("[profile]     old pairs=" + graft.operators.SignatureIndex
            .deltaPairs(all, newCached).count())
        } }
        val labels = time("label merge (incl. fold count)") {
          val l = time("merge call")(graft.CacheJanitor.register(
            graft.operators.ClusterLabels.merge(spark, root, pairs,
              inc.select(col("doc_id")), Some(s"p$b")).persist()))
          time("fold count")(l.count()); l
        }
        time("stats counts") {
          labels.select("label").distinct().count()
          labels.where(col("doc_id") === col("label")).count()
        }
        graft.CacheJanitor.drain()
      }
    }
    spark.stop()
  }
}
