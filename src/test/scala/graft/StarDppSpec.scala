package graft

import graft.sources.{LandingLog, WatermarkStore}
import graft.star.Runner
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dynamic partition pruning over the date-partitioned fact layout: a
  * selective dim_date predicate, joined through
  * `readSnapshotRangeJoined`, must reach the fact scan as a runtime
  * partition filter — the read-side payoff of the range-granular
  * snapshot layout. */
class StarDppSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)

  private val root = Files.createTempDirectory("graft_dpp").toString

  private def build(): Unit = {
    // Two orders in different months -> two partition ranges (202509,
    // 202512) under stable yyyymmdd ids.
    val sales = Seq(
      (201, ts("2025-09-02 10:00:00"), ts("2025-09-02 10:00:00"), 7, 12, 23, 10,
        BigDecimal("1.00"), 1, dt("2025-09-10"), dt("2025-09-12"), 15),
      (202, ts("2025-12-15 08:00:00"), ts("2025-12-15 08:00:00"), 8, 14, 23, 20,
        BigDecimal("2.00"), 1, dt("2025-12-20"), dt("2025-12-22"), 16))
      .toDF("sales_order_id", "created_at", "last_updated", "design_id",
        "staff_id", "counterparty_id", "units_sold", "unit_price", "currency_id",
        "agreed_delivery_date", "agreed_payment_date", "agreed_delivery_location_id")
      .withColumn("unit_price", $"unit_price".cast("decimal(10,2)"))
    val store = new WatermarkStore(s"$root/state.json")
    val updated = Runner.ingestOnce(Map("sales_order" -> sales),
      s"$root/landing", store, "2025-12-15 09:00:00.000")
    Runner.processBatch(spark, s"$root/landing", s"$root/processed", updated.toSet)
  }

  test("a selective dim_date predicate dynamically prunes fact partitions") {
    build()
    val september = LandingLog.readSnapshot(spark, s"$root/processed", "dim-date")
      .filter($"year" === 2025 && $"month" === 9)
    val joined = LandingLog.readSnapshotRangeJoined(
      spark, s"$root/processed", "fact-sales_order",
      "created_date", september, "date_id")

    val rows = joined.collect().map(_.getAs[Int]("sales_order_id"))
    assert(rows.toSeq == Seq(201), "only the September order joins a September date")

    // AQE nests the finalized plan inside query stages; walk them all to
    // reach the materialized fact scan (the collect() above forced
    // execution, so stage plans are final).
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
      }.flatten
    val factScans = allScans(joined.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("fact-sales_order")))
    val plan = joined.queryExecution.executedPlan.toString
    assert(factScans.nonEmpty, s"no fact scan found:\n$plan")
    assert(factScans.head.toString.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic pruning partition filter:\n${factScans.head}")

    // Post-execution, the runtime filter must have pruned to the single
    // September range directory (of the two written).
    val scans = factScans
    assert(scans.nonEmpty, s"no fact scan found:\n$plan")
    // `selectedPartitions` is the statically-pruned set; the runtime
    // effect of the dynamic filter shows in the scan's metrics.
    assert(scans.head.metrics("numPartitions").value == 1,
      s"exactly one date-range directory survives dynamic pruning " +
        s"(static=${scans.head.selectedPartitions.partitionCount})")
  }
}
