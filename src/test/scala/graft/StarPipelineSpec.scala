package graft

import graft.star.Runner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end star-schema pipeline test against the FIXTURES.md semantics:
  * two incremental batches with an overlapping PK (keep-last must win),
  * non-dense lookup ids (key-join semantics, not the reference's
  * positional accident), dim_date invariants, fact FK correctness.
  */
class StarPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)

  private val root = Files.createTempDirectory("graft_star").toString
  private val landing = s"$root/landing"
  private val processed = s"$root/processed"
  private val warehouse = s"$root/warehouse"
  private val state = s"$root/state/update_tracking.json"

  // Source relations (the "Postgres" side): non-dense ids on purpose.
  private def addressSrc(v2: Boolean): DataFrame = {
    val rows = Seq(
      (15, "1 Alpha Way", null, "West", "Leeds", "LS1", "UK", "111", ts("2025-09-01 08:00:00")),
      (23, "9 Beta Rd", "Unit 4", null, "York", "YO1", "UK", "222", ts("2025-09-01 08:00:00"))) ++
      (if (v2) Seq((15, "1 Alpha Way", "Floor 2", "West", "Leeds", "LS1", "UK", "111",
        ts("2025-09-01 11:00:00"))) else Nil)
    rows.toDF("address_id", "address_line_1", "address_line_2", "district",
      "city", "postal_code", "country", "phone", "last_updated")
  }

  private def counterpartySrc: DataFrame = Seq(
    (23, "Acme Ltd", 23, ts("2025-09-01 08:00:00")),
    (31, "Orphan Co", 99, ts("2025-09-01 08:00:00"))) // 99: no such address
    .toDF("counterparty_id", "counterparty_legal_name", "legal_address_id", "last_updated")

  private def salesOrderSrc(v2: Boolean): DataFrame = {
    val base = Seq(
      (101, ts("2025-09-01 09:15:00"), ts("2025-09-01 09:15:00"), 7, 12, 23, 100,
        BigDecimal("3.25"), 1, dt("2025-09-10"), dt("2025-09-12"), 15))
    val extra = if (v2) Seq(
      (101, ts("2025-09-01 09:15:00"), ts("2025-09-01 10:11:00"), 7, 12, 23, 120,
        BigDecimal("3.25"), 1, dt("2025-09-10"), dt("2025-09-12"), 15),
      (102, ts("2025-09-01 10:05:00"), ts("2025-09-01 10:05:00"), 8, 14, 23, 40,
        BigDecimal("9.99"), 2, dt("2025-09-11"), dt("2025-09-13"), 16)) else Nil
    (base ++ extra).toDF("sales_order_id", "created_at", "last_updated", "design_id",
      "staff_id", "counterparty_id", "units_sold", "unit_price", "currency_id",
      "agreed_delivery_date", "agreed_payment_date", "agreed_delivery_location_id")
  }

  private def emptyFactSrc(name: String): DataFrame = {
    val schema = graft.model.Schemas.sources(name)._1
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def sources(v2: Boolean): Map[String, DataFrame] = Map(
    "address" -> addressSrc(v2),
    "counterparty" -> counterpartySrc,
    "sales_order" -> salesOrderSrc(v2),
    "payment" -> emptyFactSrc("payment"),
    "purchase_order" -> emptyFactSrc("purchase_order"))

  test("two incremental batches: keep-last dedup, key joins, dim_date, fact FKs") {
    val w1 = Runner.runOnce(spark, sources(v2 = false), landing, processed, warehouse,
      state, "2025-09-01 10:00:00.000")
    assert(w1.toSet == Set("location", "counterparty", "date", "sales_order"),
      s"first batch writes all non-empty tables: $w1")

    // Batch 2: only address + sales_order have newer rows; currency etc. gated out.
    val w2 = Runner.runOnce(spark, sources(v2 = true), landing, processed, warehouse,
      state, "2025-09-01 11:30:00.000")
    assert(w2.toSet == Set("location", "counterparty", "date", "sales_order"),
      s"second batch rebuilds only affected tables: $w2")

    // dim_location: keep-last won (address 15 now has Floor 2), ids intact.
    val loc = spark.read.parquet(s"$warehouse/location").orderBy("location_id").collect()
    assert(loc.map(_.getInt(0)).toSeq == Seq(15, 23))
    assert(loc(0).getString(2) == "Floor 2", "latest address version wins")

    // dim_counterparty: KEY join — id 23 enriched via address_id 23 (not
    // positional), id 31 → NULLs (legal_address_id 99 unmatched).
    val cp = spark.read.parquet(s"$warehouse/counterparty").orderBy("counterparty_id").collect()
    assert(cp(0).getInt(0) == 23 && cp(0).getString(5) == "York")
    assert(cp(1).getInt(0) == 31 && cp(1).isNullAt(5), "unmatched lookup yields NULL enrichment")

    // fact_sales_order: keep-last (units_sold 120), dense surrogate ids,
    // µs time strings, date FKs resolve through dim_date.
    val fact = spark.read.parquet(s"$warehouse/sales_order").orderBy("sales_record_id").collect()
    assert(fact.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(fact(0).getInt(1) == 101 && fact(0).getInt(8) == 120, "keep-last row feeds the fact")
    assert(fact(0).getString(3) == "09:15:00.000000", "µs-precision created_time")

    val dates = spark.read.parquet(s"$warehouse/date")
    val byId = dates.orderBy("date_id").collect()
    // Default policy is stable yyyymmdd ids (a pure function of the date);
    // the reference's dense 1..n policy stays available via
    // stableDateIds=false and is pinned by q08's oracle + RelationalSpec.
    assert(byId.map(_.getLong(0)).toSeq ==
      byId.map(_.getDate(1).toString.replace("-", "").toLong).toSeq,
      "stable yyyymmdd date ids")
    val idFor = byId.map(r => r.getDate(1).toString -> r.getLong(0)).toMap
    assert(fact(0).getLong(2) == idFor("2025-09-01"), "created_date FK")
    assert(fact(1).getLong(12) == idFor("2025-09-13"), "agreed_payment_date FK")
    // Monday=0 convention: 2025-09-01 is a Monday.
    assert(byId.find(_.getDate(1).toString == "2025-09-01").get.getLong(5) == 0L)

    // Typed facades: the warehouse tables round-trip through Dataset[T].
    import graft.model.StarRows._
    val typedFacts = spark.read.parquet(s"$warehouse/sales_order")
      .as[FactSalesOrder].collect().sortBy(_.sales_record_id)
    assert(typedFacts.map(_.units_sold).toSeq == Seq(120, 40))
    assert(typedFacts.head.unit_price == BigDecimal("3.25"))
    val typedDates = spark.read.parquet(s"$warehouse/date").as[DimDate].collect()
    assert(typedDates.forall(d => d.day_of_week >= 0 && d.day_of_week <= 6))

    // Idempotent third run with no source changes: nothing written.
    val w3 = Runner.runOnce(spark, sources(v2 = true), landing, processed, warehouse,
      state, "2025-09-01 12:00:00.000")
    assert(w3.isEmpty, "change gate skips unchanged tables")
  }

  test("warehouse tables are registered in the Spark catalog (S11) and preview reads through it") {
    // Runs after the pipeline test above populated the warehouse.
    val tables = Runner.listWarehouseTables(spark)
    assert(Set("location", "counterparty", "date", "sales_order").subsetOf(tables.toSet),
      s"catalog must list the loaded star tables: $tables")
    val prev = Runner.previewTable(spark, "sales_order").collect()
    assert(prev.nonEmpty && prev.length <= 10, "LIMIT-10 preview via named catalog table")
    // The catalog table is external over the warehouse parquet path: SQL
    // over the NAME sees the same rows as the path read.
    assert(spark.sql(s"SELECT count(*) FROM ${Runner.warehouseDb}.sales_order").collect()(0).getLong(0)
      == spark.read.parquet(s"$warehouse/sales_order").count())
  }

  test("fact snapshots are date-partitioned and a partition filter prunes the scan") {
    // Pruning readers resolve the committed version dir explicitly (a
    // naive read of the table dir fails loudly by design — the
    // bookkeeping dirs are underscore-hidden).
    val dataDir = graft.sources.LandingLog.snapshotDataDir(processed, "fact-sales_order").get
    val raw = spark.read.parquet(dataDir)
    assert(raw.columns.contains("__p_created_date"), "fact snapshot carries the partition mirror key")
    // Snapshot read-back drops the mirror key -> schema identical to the builder output.
    val snap = graft.sources.LandingLog.readSnapshot(spark, processed, "fact-sales_order")
    assert(!snap.columns.exists(_.startsWith("__p_")))

    val pruned = raw.filter($"__p_created_date" === raw.select("__p_created_date")
      .orderBy("__p_created_date").first().get(0))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__p_created_date"),
      s"partition filter must reach the scan as a PartitionFilter:\n$plan")
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.selectedPartitions.partitionCount == 1,
      "exactly one date directory survives pruning")
  }

  test("preview mode exports a readable CSV extract (directory contract)") {
    // Re-load with preview on: the extract is a CSV DIRECTORY (single
    // part file only under the measured dimension-size bound — never a
    // forced one-task funnel for fact-sized tables).
    Runner.loadWarehouse(spark, processed, warehouse, Seq("fact-sales_order"), preview = true)
    val extracted = spark.read.option("header", "true").csv(s"$warehouse/extracts/sales_order")
    assert(extracted.count() == spark.read.parquet(s"$warehouse/sales_order").count(),
      "CSV extract directory round-trips the full table")
  }

  test("fact caches are size-gated: DISK_ONLY above the bound, same results") {
    // Force the gate both ways over the same landing log: a 1-byte bound
    // → DISK_ONLY; the default bound → MEMORY_AND_DISK. Both must produce
    // the identical snapshot (the gate changes persistence, not the plan).
    val out1 = Files.createTempDirectory("graft_gate_lo").toString
    val out2 = Files.createTempDirectory("graft_gate_hi").toString
    Runner.processBatch(spark, landing, out1, Set("sales_order"), cacheMemoryBound = 1L)
    Runner.processBatch(spark, landing, out2, Set("sales_order"))
    val lo = graft.sources.LandingLog.readSnapshot(spark, out1, "fact-sales_order")
      .orderBy("sales_record_id").collect().map(_.toString).toSeq
    val hi = graft.sources.LandingLog.readSnapshot(spark, out2, "fact-sales_order")
      .orderBy("sales_record_id").collect().map(_.toString).toSeq
    assert(lo.nonEmpty && lo == hi, "gated persistence level must not change results")
  }

  test("multi-file backfill increments replay identically to single-file increments") {
    import graft.sources.LandingLog
    val r = Files.createTempDirectory("graft_backfill").toString
    val schema = graft.model.Schemas.sources("currency")._1
    def df(rows: Seq[(Int, String, java.sql.Timestamp)]) =
      rows.toDF("currency_id", "currency_code", "last_updated")

    // Batch 1: the reference's one-CSV contract.
    LandingLog.writeIncrement(df(Seq((1, "GBP", ts("2025-09-01 08:00:00")))),
      r, "currency", "2025-09-01 10:00:00.000")
    // Batch 2: a parallel backfill directory (multiple part files).
    LandingLog.writeIncrementDir(
      df(Seq((1, "GBX", ts("2025-09-01 11:00:00")),
        (2, "EUR", ts("2025-09-01 11:00:00")))).repartition(3),
      r, "currency", "2025-09-01 11:00:00.000")

    val log = LandingLog.readLog(spark, r, "currency", schema)
    assert(log.count() == 3)
    // Both forms carry the batch id as _ingest_ts (chronological).
    val tsByBatch = log.select("_ingest_ts").distinct().collect().map(_.getString(0)).sorted
    assert(tsByBatch.toSeq ==
      Seq("2025-09-01_10.00.00.000", "2025-09-01_11.00.00.000"), tsByBatch.toSeq)
    // Keep-last semantics across the mixed log: the backfill wins for id 1.
    val snap = graft.star.StarSchema.currentSnapshot("currency")(log)
      .orderBy("currency_id").collect()
    assert(snap.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq(1 -> "GBX", 2 -> "EUR"))
  }

  test("change gate compares timestamp VALUES at sub-second / sentinel precision") {
    val root2 = Files.createTempDirectory("graft_gate").toString
    val state2 = s"$root2/update_tracking.json"
    def src(maxTs: java.sql.Timestamp): Map[String, DataFrame] = Map(
      "currency" -> Seq((1, "GBP", maxTs)).toDF("currency_id", "currency_code", "last_updated"))
    val store = new graft.sources.WatermarkStore(state2)

    // Epoch-exact max == the bootstrap sentinel value: strictly-newer gate
    // must SKIP (equal, not greater) even though the sentinel string has
    // more fractional digits than Timestamp.toString emits ("…00.0").
    val atSentinel = Runner.ingestOnce(src(ts("1970-01-01 00:00:00")),
      s"$root2/landing", store, "1970-01-01 00:00:01.000")
    assert(atSentinel.isEmpty, "max == sentinel value must not ingest")

    // One millisecond past the sentinel: must ingest, and the bumped
    // watermark round-trips through the store at full precision.
    val ms = java.sql.Timestamp.valueOf("1970-01-01 00:00:00.001")
    assert(Runner.ingestOnce(src(ms), s"$root2/landing", store,
      "1970-01-01 00:00:02.000") == Seq("currency"))
    assert(java.sql.Timestamp.valueOf(store.watermark("currency")) == ms)

    // Same max again: value-equal to the stored watermark → skipped,
    // regardless of how many fractional digits either side printed.
    assert(Runner.ingestOnce(src(ms), s"$root2/landing", store,
      "1970-01-01 00:00:03.000").isEmpty, "re-run at same max is idempotent")

    // 100 µs further: strictly newer by value (a difference below
    // millisecond string length) → ingested exactly once.
    val us = java.sql.Timestamp.valueOf("1970-01-01 00:00:00.0011")
    assert(Runner.ingestOnce(src(us), s"$root2/landing", store,
      "1970-01-01 00:00:04.000") == Seq("currency"))
    assert(Runner.ingestOnce(src(us), s"$root2/landing", store,
      "1970-01-01 00:00:05.000").isEmpty)

    // Format drift: an external writer padded the stored watermark to µs
    // ("…. 000000"); the value gate still parses and skips an equal max.
    store.update(Map("currency" -> "1970-01-01 00:00:00.001100"))
    assert(Runner.ingestOnce(src(us), s"$root2/landing", store,
      "1970-01-01 00:00:06.000").isEmpty, "padded watermark format still gates by value")
  }
}
