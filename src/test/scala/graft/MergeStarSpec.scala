package graft

import java.nio.file.{Files, Paths}

import graft.model.Schemas
import graft.sources.LandingLog
import graft.star.{MergeRunner, Runner}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The incremental star path's contract: [[MergeRunner.processMerge]]
  * folds only new landing increments, yet every snapshot it maintains is
  * BIT-FOR-BIT the one a full-log replay ([[Runner.processBatch]])
  * produces — across inserts, updates, month-moving updates (partition
  * swap + vacate), date-vacating updates (dim_date refcounts), and
  * two-source dimension dependencies — under both id-policy pairs
  * (stable/stable merges incrementally; any dense policy delegates to
  * replay), through crash replays (the intent flag), and across
  * out-of-order landings (loud full rebuild, never a silent skip). */
class MergeStarSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)

  // ---- landing increments, hand-built in Schemas column order -------

  private def land(landing: String, table: String, batchId: String, df: DataFrame): Unit =
    LandingLog.writeIncrement(df, landing, table, batchId)

  private def addresses(rows: (Int, String)*): DataFrame =
    rows.map { case (id, l2) => (id, s"No.$id", l2, "West", "Leeds", "LS1", "UK", "111") }
      .toDF("address_id", "address_line_1", "address_line_2", "district",
        "city", "postal_code", "country", "phone")

  private def counterparties(rows: (Int, String, Int)*): DataFrame =
    rows.toDF("counterparty_id", "counterparty_legal_name", "legal_address_id")

  /** (pk, created_at, last_updated, payment_date) */
  private def payments(rows: (Int, String, String, String)*): DataFrame =
    rows.map { case (id, c, lu, pd) =>
      (id, ts(c), ts(lu), id * 10, 23, BigDecimal("12.50"), 1, 1, true, dt(pd))
    }.toDF("payment_id", "created_at", "last_updated", "transaction_id",
      "counterparty_id", "payment_amount", "currency_id", "payment_type_id",
      "paid", "payment_date")

  /** (pk, created_at, last_updated, delivery, payment, units) */
  private def salesOrders(rows: (Int, String, String, String, String, Int)*): DataFrame =
    rows.map { case (id, c, lu, del, pay, units) =>
      (id, ts(c), ts(lu), 7, 8, 23, units, BigDecimal("3.25"), 1, dt(del), dt(pay), 15)
    }.toDF("sales_order_id", "created_at", "last_updated", "design_id", "staff_id",
      "counterparty_id", "units_sold", "unit_price", "currency_id",
      "agreed_delivery_date", "agreed_payment_date", "agreed_delivery_location_id")

  /** Three batches covering every mutation class the merge must honor. */
  private def landAll(landing: String): Unit = {
    val b1 = "2025-09-01 10:00:00.000"
    land(landing, "address", b1, addresses(15 -> "F1", 23 -> "F9"))
    land(landing, "counterparty", b1, counterparties((23, "Acme Ltd", 23), (31, "Orphan Co", 15)))
    land(landing, "payment", b1, payments(
      (1, "2020-01-05 10:00:00", "2020-01-05 10:00:00", "2020-01-10"),
      (2, "2020-02-10 09:00:00", "2020-02-10 09:00:00", "2020-02-15"),
      (3, "2020-03-20 08:00:00", "2020-03-20 08:00:00", "2020-03-25")))
    land(landing, "sales_order", b1, salesOrders(
      (8, "2020-01-07 11:00:00", "2020-01-07 11:00:00", "2020-04-01", "2020-04-15", 100),
      (16, "2020-02-20 12:00:00", "2020-02-20 12:00:00", "2020-04-02", "2020-04-16", 40)))

    val b2 = "2025-09-01 10:10:00.000"
    // p4: new pk, new month; p2 UPDATE: payment_date 02-15 -> 02-16
    // (2020-02-15 is referenced by nothing else — dim_date must drop it).
    land(landing, "payment", b2, payments(
      (4, "2020-05-05 10:00:00", "2025-09-01 10:09:00", "2020-05-09"),
      (2, "2020-02-10 09:00:00", "2025-09-01 10:09:00", "2020-02-16")))
    // a15 UPDATE: c31 references it — dim-counterparty must reflect the
    // new address without counterparty itself landing.
    land(landing, "address", b2, addresses(15 -> "F2"))

    val b3 = "2025-09-01 10:20:00.000"
    // p3 UPDATE moves created_at 2020-03 -> 2020-07: month 202003's only
    // row leaves (partition vacated), month 202007 appears.
    land(landing, "payment", b3, payments(
      (3, "2020-07-20 08:00:00", "2025-09-01 10:19:00", "2020-03-25")))
    // s5: NEW pk BELOW the existing ones (out-of-order natural key —
    // exactly what dense record ids cannot absorb); s8 UPDATE in place.
    land(landing, "sales_order", b3, salesOrders(
      (5, "2020-01-02 09:00:00", "2025-09-01 10:19:00", "2020-04-03", "2020-04-17", 7),
      (8, "2020-01-07 11:00:00", "2025-09-01 10:19:30", "2020-04-01", "2020-04-15", 120)))
  }

  private val landedTables = Set("address", "counterparty", "payment", "sales_order")
  private val starKeys = Seq("dim-location", "dim-counterparty", "dim-date",
    "fact-payment", "fact-sales_order")

  private def dump(root: String, key: String): (Seq[String], Seq[Row]) = {
    val df = LandingLog.readSnapshot(spark, root, key)
    (df.schema.map(f => s"${f.name}:${f.dataType.sql}"),
      df.collect().toSeq.sortBy(_.toString))
  }

  private def assertEqualStar(mergeRoot: String, replayRoot: String): Unit =
    starKeys.foreach { key =>
      val (ms, mr) = dump(mergeRoot, key)
      val (rs, rr) = dump(replayRoot, key)
      assert(ms == rs, s"$key schema: merge $ms != replay $rs")
      assert(mr == rr, s"$key rows: merge\n${mr.mkString("\n")}\n!= replay\n${rr.mkString("\n")}")
    }

  test("merge == full replay bit-for-bit under stable ids (inserts, updates, moves, vacations)") {
    val root = Files.createTempDirectory("graft_mergestar").toString
    val landing = s"$root/landing"
    landAll(landing)

    // Merge folds batch by batch: re-running processMerge between
    // landings is the production cadence. (Re-land each batch's files
    // into a STAGED landing so the merge sees them arrive one at a time.)
    val staged = s"$root/staged_landing"
    val mergeRoot = s"$root/merged"
    def copyBatch(suffix: String): Unit =
      landedTables.foreach { t =>
        val dir = Paths.get(s"$landing/$t")
        if (Files.isDirectory(dir)) {
          val it = Files.list(dir)
          try it.forEach { p =>
            if (p.getFileName.toString.contains(suffix)) {
              Files.createDirectories(Paths.get(s"$staged/$t"))
              Files.copy(p, Paths.get(s"$staged/$t/${p.getFileName}"))
            }
          } finally it.close()
        }
      }
    copyBatch("2025-09-01_10.00.00")
    assert(MergeRunner.processMerge(spark, staged, mergeRoot).nonEmpty)
    copyBatch("2025-09-01_10.10.00")
    val w2 = MergeRunner.processMerge(spark, staged, mergeRoot)
    assert(w2.contains("dim-counterparty"),
      s"an address update must rebuild the dependent two-source dim: $w2")
    copyBatch("2025-09-01_10.20.00")
    MergeRunner.processMerge(spark, staged, mergeRoot)

    // Replay truth: one full-log processBatch over everything.
    val replayRoot = s"$root/replayed"
    Runner.processBatch(spark, landing, replayRoot, landedTables,
      stableDateIds = true, stableRecordIds = true)
    assertEqualStar(mergeRoot, replayRoot)

    // The semantic spot-checks the equality could mask if BOTH paths
    // were wrong the same way:
    val dates = LandingLog.readSnapshot(spark, mergeRoot, "dim-date")
      .select("date").collect().map(_.getDate(0).toString).toSet
    assert(!dates.contains("2020-02-15"), "the vacated payment_date must drop out of dim_date")
    assert(dates.contains("2020-02-16") && dates.contains("2020-07-20"), dates)
    val months = {
      val dir = Paths.get(s"$mergeRoot/fact-payment")
      val it = Files.list(dir)
      try {
        val names = new scala.collection.mutable.ArrayBuffer[String]
        it.forEach(p => names += p.getFileName.toString)
        names.filter(_.startsWith("__p_")).toSet
      } finally it.close()
    }
    assert(!months.contains("__p_created_date=202003"),
      s"p3's vacated month directory must be deleted: $months")
    assert(months.contains("__p_created_date=202007"), months)
    // An update must not grow the fact (upsert, not append).
    assert(LandingLog.readSnapshot(spark, mergeRoot, "fact-payment").count() == 4L)
  }

  test("a crash replay (intent flag set, watermark not advanced) heals to the same snapshots") {
    val root = Files.createTempDirectory("graft_mergestar_crash").toString
    val landing = s"$root/landing"
    landAll(landing)
    val mergeRoot = s"$root/merged"
    // Fold b1+b2 in one merge, keep the pre-b3 state.
    // (processMerge folds every unfolded key at once — multi-batch folds
    // are the same code path as one-batch folds.)
    val preState = {
      val tmp = Paths.get(s"$root/landing_b12")
      landedTables.foreach { t =>
        val dir = Paths.get(s"$landing/$t")
        if (Files.isDirectory(dir)) {
          Files.createDirectories(tmp.resolve(t))
          val it = Files.list(dir)
          try it.forEach { p =>
            if (!p.getFileName.toString.contains("10.20.00"))
              Files.copy(p, tmp.resolve(t).resolve(p.getFileName.toString))
          } finally it.close()
        }
      }
      MergeRunner.processMerge(spark, tmp.toString, mergeRoot)
      Files.readAllBytes(Paths.get(s"$mergeRoot/_merge_state.json"))
    }
    // Fold b3 fully, then simulate the worst crash: every write of the
    // b3 batch landed but the state never advanced (intent still set).
    MergeRunner.processMerge(spark, landing, mergeRoot)
    val crashed = new String(preState, "UTF-8")
      .replaceFirst("\\{", """{"intent": "1", """)
    // Publish the simulated crash state through the store's own writer
    // (a bare java.nio overwrite would leave the Hadoop-FS checksum
    // stale since the round-15 port, and the read would fail on the
    // mismatch instead of seeing the intent flag).
    graft.sources.StateFile.write(s"$mergeRoot/_merge_state.json", crashed)
    // The replay must rebuild the refcounts from the merged facts and
    // land on identical snapshots.
    assert(MergeRunner.processMerge(spark, landing, mergeRoot).nonEmpty)

    val replayRoot = s"$root/replayed"
    Runner.processBatch(spark, landing, replayRoot, landedTables,
      stableDateIds = true, stableRecordIds = true)
    assertEqualStar(mergeRoot, replayRoot)
  }

  test("dense record ids delegate to full replay and stay bit-for-bit equal") {
    val root = Files.createTempDirectory("graft_mergestar_dense").toString
    val landing = s"$root/landing"
    landAll(landing)
    val mergeRoot = s"$root/merged"
    MergeRunner.processMerge(spark, landing, mergeRoot,
      stableDateIds = true, stableRecordIds = false)
    val replayRoot = s"$root/replayed"
    Runner.processBatch(spark, landing, replayRoot, landedTables,
      stableDateIds = true, stableRecordIds = false)
    assertEqualStar(mergeRoot, replayRoot)
  }

  test("an id-policy flip forces one full rebuild under the new policy") {
    val root = Files.createTempDirectory("graft_mergestar_flip").toString
    val landing = s"$root/landing"
    landAll(landing)
    val mergeRoot = s"$root/merged"
    MergeRunner.processMerge(spark, landing, mergeRoot,
      stableDateIds = true, stableRecordIds = false)
    // Flip to the stable pair: the dense-minted record ids are
    // incompatible — the runner must rebuild, not mix.
    MergeRunner.processMerge(spark, landing, mergeRoot)
    val replayRoot = s"$root/replayed"
    Runner.processBatch(spark, landing, replayRoot, landedTables,
      stableDateIds = true, stableRecordIds = true)
    assertEqualStar(mergeRoot, replayRoot)
  }

  test("a landing key below the folded watermark triggers a loud full rebuild") {
    val root = Files.createTempDirectory("graft_mergestar_ooo").toString
    val landing = s"$root/landing"
    // b1 and b3 land and fold; then a backfill lands BETWEEN them.
    land(landing, "payment", "2025-09-01 10:00:00.000", payments(
      (1, "2020-01-05 10:00:00", "2020-01-05 10:00:00", "2020-01-10")))
    land(landing, "payment", "2025-09-01 10:20:00.000", payments(
      (3, "2020-03-20 08:00:00", "2025-09-01 10:19:00", "2020-03-25")))
    val mergeRoot = s"$root/merged"
    MergeRunner.processMerge(spark, landing, mergeRoot)
    land(landing, "payment", "2025-09-01 10:10:00.000", payments(
      (2, "2020-02-10 09:00:00", "2020-02-10 09:00:00", "2020-02-15")))
    MergeRunner.processMerge(spark, landing, mergeRoot)
    val got = LandingLog.readSnapshot(spark, mergeRoot, "fact-payment")
      .select("payment_id").collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 2, 3), s"the out-of-order batch must be absorbed: $got")
    val replayRoot = s"$root/replayed"
    Runner.processBatch(spark, landing, replayRoot, Set("payment"),
      stableDateIds = true, stableRecordIds = true)
    starKeys.filter(Set("dim-date", "fact-payment")).foreach { key =>
      assert(dump(mergeRoot, key) == dump(replayRoot, key), key)
    }
  }

  test("zero-copy warehouse views serve the merged snapshots through the catalog") {
    val root = Files.createTempDirectory("graft_mergestar_views").toString
    val landing = s"$root/landing"
    landAll(landing)
    val mergeRoot = s"$root/merged"
    val written = MergeRunner.processMerge(spark, landing, mergeRoot)
    val tables = MergeRunner.loadWarehouseViews(spark, mergeRoot, written)
    assert(tables.contains("payment"))
    val viaView = spark.sql(s"SELECT count(*) FROM ${Runner.warehouseDb}.payment")
      .collect()(0).getLong(0)
    assert(viaView == LandingLog.readSnapshot(spark, mergeRoot, "fact-payment").count())
    assert(!spark.sql(s"SELECT * FROM ${Runner.warehouseDb}.payment LIMIT 1")
      .columns.exists(_.startsWith("__p_")), "mirror keys must not leak into the warehouse surface")
  }
}
