package graft

import graft.sources.WatermarkStore
import graft.star.Runner
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The stable-date-id scale policy (the Runner default): date_id is a
  * pure function of the date value, so a rebuild that discovers a NEW
  * EARLIER date extends dim_date without renumbering — and the
  * selective rebuild may skip facts whose inputs didn't change. This
  * spec pins the payoff (an unchanged fact's files are never rewritten,
  * byte-for-byte untouched on disk) and the contrast (the reference's
  * dense 1..n parity mode must rewrite every non-empty fact, because
  * renumbering would strand their FKs). */
class StableIdRebuildSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)

  private def paymentSrc: DataFrame = Seq(
    (1, ts("2025-09-02 09:00:00"), ts("2025-09-02 09:00:00"), 11, 23,
      BigDecimal("10.00"), 1, 1, true, dt("2025-09-05")))
    .toDF("payment_id", "created_at", "last_updated", "transaction_id",
      "counterparty_id", "payment_amount", "currency_id", "payment_type_id",
      "paid", "payment_date")
    .withColumn("payment_amount", $"payment_amount".cast("decimal(10,2)"))

  private def salesSrc(v2: Boolean): DataFrame = {
    val base = Seq(
      (201, ts("2025-09-02 10:00:00"), ts("2025-09-02 10:00:00"), 7, 12, 23, 10,
        BigDecimal("1.00"), 1, dt("2025-09-10"), dt("2025-09-12"), 15))
    // The v2 row carries a NEW EARLIER calendar date (created 2025-08-15):
    // under dense ids this renumbers every date_id; under stable ids it
    // just adds 20250815.
    val extra = if (v2) Seq(
      (202, ts("2025-08-15 08:00:00"), ts("2025-09-02 11:00:00"), 7, 12, 23, 20,
        BigDecimal("2.00"), 1, dt("2025-09-10"), dt("2025-09-12"), 15)) else Nil
    (base ++ extra).toDF("sales_order_id", "created_at", "last_updated", "design_id",
      "staff_id", "counterparty_id", "units_sold", "unit_price", "currency_id",
      "agreed_delivery_date", "agreed_payment_date", "agreed_delivery_location_id")
      .withColumn("unit_price", $"unit_price".cast("decimal(10,2)"))
  }

  private def runBatch(root: String, v2: Boolean, batchId: String, stable: Boolean): Seq[String] = {
    val store = new WatermarkStore(s"$root/state.json")
    val src = Map("payment" -> paymentSrc, "sales_order" -> salesSrc(v2))
    val updated = Runner.ingestOnce(src, s"$root/landing", store, batchId)
    if (updated.isEmpty) Seq.empty
    else Runner.processBatch(spark, s"$root/landing", s"$root/processed", updated.toSet, stable)
  }

  private def fileStamps(dir: Path): Map[String, Long] =
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("."))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap

  test("stable ids (default): a fact whose input didn't change is never rewritten") {
    val root = Files.createTempDirectory("graft_stable").toString
    val w1 = runBatch(root, v2 = false, "2025-09-02 10:30:00.000", stable = true)
    assert(w1.toSet == Set("dim-date", "fact-payment", "fact-sales_order"))
    val payDir = java.nio.file.Paths.get(s"$root/processed/fact-payment")
    val before = fileStamps(payDir)
    assert(before.nonEmpty)

    // Only sales_order changes (and brings an earlier date): dim_date is
    // rebuilt, fact-payment must not be — not even an identical rewrite.
    val w2 = runBatch(root, v2 = true, "2025-09-02 11:30:00.000", stable = true)
    assert(w2.toSet == Set("dim-date", "fact-sales_order"),
      s"unchanged fact must be skipped under stable ids: $w2")
    assert(fileStamps(payDir) == before, "fact-payment files must be byte-untouched")

    // The skipped fact's FKs still resolve: ids are value-determined.
    val dates = graft.sources.LandingLog.readSnapshot(spark, s"$root/processed", "dim-date")
      .select("date_id").collect().map(_.getLong(0)).toSet
    val payFk = graft.sources.LandingLog.readSnapshot(spark, s"$root/processed", "fact-payment")
      .select("created_date").collect().map(_.getLong(0)).toSet
    assert(payFk == Set(20250902L) && payFk.subsetOf(dates))
    assert(dates.contains(20250815L), "the new earlier date joined dim_date")
  }

  test("id-policy flip over an existing snapshot forces one full fact rebuild, then skipping resumes") {
    val root = Files.createTempDirectory("graft_migrate").toString
    // Batch 1 under the reference's dense ids: facts hold dense FKs.
    val w1 = runBatch(root, v2 = false, "2025-09-02 10:30:00.000", stable = false)
    assert(w1.toSet == Set("dim-date", "fact-payment", "fact-sales_order"))

    // Batch 2 flips to the stable default with only sales_order changed:
    // the stored dim_date is detected as dense, so the UNCHANGED
    // fact-payment must be rebuilt too — its stored FKs were minted
    // under the old policy and would dangle otherwise.
    val w2 = runBatch(root, v2 = true, "2025-09-02 11:30:00.000", stable = true)
    assert(w2.toSet == Set("dim-date", "fact-payment", "fact-sales_order"),
      s"policy flip must force a one-time full fact rebuild: $w2")
    val dates = graft.sources.LandingLog.readSnapshot(spark, s"$root/processed", "dim-date")
      .select("date_id").collect().map(_.getLong(0)).toSet
    val payFk = graft.sources.LandingLog.readSnapshot(spark, s"$root/processed", "fact-payment")
      .select("created_date").collect().map(_.getLong(0)).toSet
    assert(payFk.subsetOf(dates), s"migrated FKs must resolve: $payFk vs $dates")
    assert(payFk == Set(20250902L), "post-flip FKs are stable yyyymmdd ids")

    // Batch 3 (still stable, another sales_order change): the snapshot is
    // now self-consistent, so selective skipping resumes.
    val store = new WatermarkStore(s"$root/state.json")
    val src3 = Map("payment" -> paymentSrc, "sales_order" -> salesSrc(v2 = true)
      .withColumn("last_updated", org.apache.spark.sql.functions.lit(ts("2025-09-02 12:00:00"))))
    val updated3 = Runner.ingestOnce(src3, s"$root/landing", store, "2025-09-02 12:30:00.000")
    val w3 = Runner.processBatch(spark, s"$root/landing", s"$root/processed", updated3.toSet, stableDateIds = true)
    assert(w3.toSet == Set("dim-date", "fact-sales_order"),
      s"after the one-time migration, unchanged facts are skipped again: $w3")
  }

  test("dense ids (parity mode): a dim_date rebuild rewrites every non-empty fact") {
    val root = Files.createTempDirectory("graft_dense").toString
    val w1 = runBatch(root, v2 = false, "2025-09-02 10:30:00.000", stable = false)
    assert(w1.toSet == Set("dim-date", "fact-payment", "fact-sales_order"))
    val w2 = runBatch(root, v2 = true, "2025-09-02 11:30:00.000", stable = false)
    assert(w2.toSet == Set("dim-date", "fact-payment", "fact-sales_order"),
      s"dense renumbering must rebuild all non-empty facts: $w2")
  }
}
