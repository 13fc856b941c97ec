package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import graft.operators.{ConcurrentWriterException, WriterLease}
import graft.star.Runner
import org.apache.spark.sql.DataFrame

/** Single-writer discipline on the star pipeline's processed root —
  * the same second-writer class the index roots close with
  * [[WriterLease]]: snapshot commits are atomic against readers, but
  * two concurrent pipeline drivers could stage the same `_versions/<n>`
  * directory or interleave watermark-state merges. One batch proceeds;
  * a second driver refuses loudly BEFORE touching landing files or
  * state (the refusal asserts double as the mutation check: removing
  * the lease from runOnce/processBatch/fullReload fails them). */
class StarLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def addressSrc: DataFrame = Seq(
    (15, "1 Alpha Way", null, "West", "Leeds", "LS1", "UK", "111", ts("2025-09-01 08:00:00")),
    (23, "9 Beta Rd", "Unit 4", null, "York", "YO1", "UK", "222", ts("2025-09-01 08:00:00")))
    .toDF("address_id", "address_line_1", "address_line_2", "district",
      "city", "postal_code", "country", "phone", "last_updated")

  private def counterpartySrc: DataFrame = Seq(
    (23, "Acme Ltd", 23, ts("2025-09-01 08:00:00")))
    .toDF("counterparty_id", "counterparty_legal_name", "legal_address_id", "last_updated")

  private def emptyFactSrc(name: String): DataFrame = {
    val schema = graft.model.Schemas.sources(name)._1
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def sources: Map[String, DataFrame] = Map(
    "address" -> addressSrc,
    "counterparty" -> counterpartySrc,
    "sales_order" -> emptyFactSrc("sales_order"),
    "payment" -> emptyFactSrc("payment"),
    "purchase_order" -> emptyFactSrc("purchase_order"))

  private def roots(): (String, String, String, String, String) = {
    val root = Files.createTempDirectory("graft_star_lease").toString
    (root, s"$root/landing", s"$root/processed", s"$root/warehouse",
      s"$root/state/update_tracking.json")
  }

  private def plantForeignLease(processed: String): java.nio.file.Path = {
    val p = Paths.get(processed, WriterLease.fileName)
    Files.createDirectories(Paths.get(processed))
    Files.write(p, "pid999@elsewhere/deadbeef\n".getBytes("UTF-8"))
    p
  }

  test("a foreign lease on the processed root refuses runOnce before ANY stage runs") {
    val (_, landing, processed, warehouse, state) = roots()
    val lease = plantForeignLease(processed)
    val e = intercept[ConcurrentWriterException] {
      Runner.runOnce(spark, sources, landing, processed, warehouse,
        state, "2025-09-01 10:00:00.000")
    }
    assert(e.getMessage.contains("pid999@elsewhere"), e.getMessage)
    // The refusal happened before ingest: no landing increment, no
    // watermark state, no snapshots — a refused second driver leaves
    // zero trace, so the holder's in-flight stages see nothing new.
    assert(!Files.exists(Paths.get(landing)), "no landing files may be written")
    assert(!Files.exists(Paths.get(state)), "no watermark state may be written")
    assert(graft.sources.LandingLog.listSnapshots(processed).isEmpty)

    // Holder releases → the identical batch proceeds and the lease
    // does not outlive it.
    Files.delete(lease)
    val written = Runner.runOnce(spark, sources, landing, processed, warehouse,
      state, "2025-09-01 10:00:00.000")
    assert(written.toSet == Set("location", "counterparty"), written)
    assert(!Files.exists(lease), "the lease must be released after the batch")
  }

  test("processBatch and fullReload refuse under a foreign lease; reads never lease") {
    val (_, landing, processed, warehouse, state) = roots()
    Runner.runOnce(spark, sources, landing, processed, warehouse,
      state, "2025-09-01 10:00:00.000")
    val before = spark.read.parquet(s"$warehouse/location").collect().toSet

    plantForeignLease(processed)
    intercept[ConcurrentWriterException] {
      Runner.processBatch(spark, landing, processed, Set("address"))
    }
    intercept[ConcurrentWriterException] {
      Runner.fullReload(spark, processed, warehouse)
    }
    // Reading the already-loaded warehouse needs no lease and the
    // refused writers changed nothing.
    assert(spark.read.parquet(s"$warehouse/location").collect().toSet == before)
  }

  test("two drivers, one root: the second refuses while the first holds, then proceeds") {
    val (_, landing, processed, warehouse, state) = roots()
    val acquired = new CountDownLatch(1)
    val releaseIt = new CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLease.withLease(spark, processed) {
        acquired.countDown()
        releaseIt.await()
      })
    holder.start()
    acquired.await()
    try {
      intercept[ConcurrentWriterException] {
        Runner.runOnce(spark, sources, landing, processed, warehouse,
          state, "2025-09-01 10:00:00.000")
      }
      assert(!Files.exists(Paths.get(state)), "the loser leaves no state behind")
    } finally {
      releaseIt.countDown()
      holder.join()
    }
    val written = Runner.runOnce(spark, sources, landing, processed, warehouse,
      state, "2025-09-01 10:00:00.000")
    assert(written.toSet == Set("location", "counterparty"), written)
  }

  test("distinct processed roots stay fully concurrent (no cross-root serialization)") {
    val (_, l1, p1, w1, s1) = roots()
    val (_, l2, p2, w2, s2) = roots()
    // Hold root 1's lease for the whole of root 2's batch: pipelines are
    // leased per processed root, so an unrelated pipeline never blocks.
    WriterLease.withLease(spark, p1) {
      val written = Runner.runOnce(spark, sources, l2, p2, w2,
        s2, "2025-09-01 10:00:00.000")
      assert(written.nonEmpty)
    }
    val written1 = Runner.runOnce(spark, sources, l1, p1, w1,
      s1, "2025-09-01 10:00:00.000")
    assert(written1.nonEmpty)
  }
}
