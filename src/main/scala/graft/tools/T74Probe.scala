package graft.tools

import org.apache.spark.sql.functions.col

/** Scratch decomposition of t74_indexed_dedup's exact shape (two
  * persisted ingests + one explicit indexed probe), for the round-14
  * bench adjudication — times each leg per rep so the regressed
  * constant is a leg, not a total. */
object T74Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("t74-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.GraftSession.tuneShufflePartitions(spark, Seq(dir))
    graft.functions.GraftFunctions.registerAll(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val r = f
      println(f"[t74] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get() - j0}")
      r
    }
    for (rep <- 0 until 4) {
      println(s"[t74] === rep $rep ===")
      val root = java.nio.file.Files.createTempDirectory("graft_t74p").toString
      val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
      time("ingest b1")(graft.operators.SignatureIndex.ingest(spark, root,
        docs.where("doc_id % 2 = 0"), batchKey = Some("b1")))
      val b2 = time("ingest b2")(graft.operators.SignatureIndex.ingest(spark, root,
        docs.where("doc_id % 2 = 1"), batchKey = Some("b2")))
      time("indexed count")(graft.operators.SignatureIndex
        .deltaPairsIndexed(spark, root, "signatures", b2.newSigs)
        .orderBy(col("doc_a"), col("doc_b")).count())
      graft.CacheJanitor.drain()
    }
    spark.stop()
  }
}
