package graft.tools

import graft.star.{Runner, StarBench, StarSchema}
import graft.sources.LandingLog
import graft.model.Schemas
import org.apache.spark.sql.functions._

/** Phase-level timing of one star `processBatch` — attributes the
  * process-stage wall-time (20.8 of the 31.4 s judge star rebuild at
  * sf0.1) to log replay + dedup / dim builds / dim_date / fact builds
  * / snapshot writes, with job/stage counts per phase, so the
  * incremental-maintenance work targets the measured cost instead of
  * the advertised one (the index loop's profiler found file-count
  * overhead where "df rescan" was blamed).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfileStar"
  *
  * The decomposition mirrors Runner.processBatch exactly (same
  * builders, same persist levels, same writes into a throwaway root);
  * it is a measurement harness, not a second implementation.
  */
object ProfileStar {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("profile-star")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = java.nio.file.Files.createTempDirectory("graft_profile_star").toString
    val landing = s"$root/landing"
    val processed = s"$root/processed"

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
    })
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val s0 = stages.get()
      val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(jobs=${jobs.get() - j0} stages=${stages.get() - s0})")
      r
    }

    // Land one full batch (the judge star rebuild's shape).
    val srcs = StarBench.sources(spark, dir)
    val store = new graft.sources.WatermarkStore(s"$root/state.json")
    time("ingest (landing CSVs)") {
      Runner.ingestOnce(srcs, landing, store, "2025-09-01 10:00:00.000")
    }

    def log(table: String) =
      LandingLog.readLog(spark, landing, table, Schemas.sources(table)._1)
    def put(key: String, df: org.apache.spark.sql.DataFrame,
        partitionBy: Seq[String] = Nil): Unit =
      LandingLog.writeSnapshot(df, processed, key, partitionBy)

    // --- the 7 non-date dims: replay + build + write each -----------
    time("dim-location") { put("dim-location", StarSchema.dimLocation(log("address"))) }
    time("dim-counterparty") {
      put("dim-counterparty", StarSchema.dimCounterparty(log("counterparty"), log("address")))
    }
    time("dim-currency") { put("dim-currency", StarSchema.dimCurrency(log("currency"))) }
    time("dim-design") { put("dim-design", StarSchema.dimDesign(log("design"))) }
    time("dim-payment_type") {
      put("dim-payment_type", StarSchema.dimPaymentType(log("payment_type")))
    }
    time("dim-staff") { put("dim-staff", StarSchema.dimStaff(log("staff"), log("department"))) }
    time("dim-transaction") {
      put("dim-transaction", StarSchema.dimTransaction(log("transaction")))
    }

    // --- fact inputs: replay + keep-last dedup, persisted & counted --
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pay = time("payment log replay + dedup (materialize)") {
      val d = StarSchema.currentSnapshot("payment")(log("payment")).persist(level)
      d.count(); d
    }
    val po = time("purchase_order log replay + dedup (materialize)") {
      val d = StarSchema.currentSnapshot("purchase_order")(log("purchase_order")).persist(level)
      d.count(); d
    }
    val so = time("sales_order log replay + dedup (materialize)") {
      val d = StarSchema.currentSnapshot("sales_order")(log("sales_order")).persist(level)
      d.count(); d
    }
    val dates = time("dim-date build + write") {
      val d = StarSchema.dimDate(pay, po, so, stableIds = true).cache()
      put("dim-date", d); d
    }
    time("fact-payment build + write") {
      put("fact-payment", StarSchema.factPayment(pay, dates), Seq("created_date"))
    }
    time("fact-purchase_order build + write") {
      put("fact-purchase_order", StarSchema.factPurchaseOrder(po, dates), Seq("created_date"))
    }
    time("fact-sales_order build + write") {
      put("fact-sales_order", StarSchema.factSalesOrder(so, dates), Seq("created_date"))
    }
    Seq(dates, pay, po, so).foreach(_.unpersist())
    graft.CacheJanitor.drain()

    // Contrast: the UNDECOMPOSED processBatch (fresh root) for the
    // end-to-end number the phases must add up to.
    val processed2 = s"$root/processed2"
    time("processBatch end-to-end (contrast)") {
      Runner.processBatch(spark, landing, processed2, srcs.keySet)
    }
    spark.stop()
  }
}
