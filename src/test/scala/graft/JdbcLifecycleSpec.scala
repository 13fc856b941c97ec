package graft

import graft.star.Runner
import graft.sources.Extract
import java.nio.file.Files
import java.util.Properties

/** The reference lifecycle §3.1–3.3 end-to-end over JDBC: Derby is BOTH
  * the operational source and the warehouse sink, with the landing log +
  * processed snapshots in between — ingest (gated incremental extract
  * from JDBC) → process (star rebuild) → load (batched JDBC overwrite).
  * Two batches assert the full loop: keep-last semantics survive the trip
  * and the warehouse is replaced, never appended
  * (src/warehousing_lambda.py:48-77). */
class JdbcLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftlifecycle;create=true"
  private val props = new Properties()
  props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

  private val root = Files.createTempDirectory("graft_jdbc_lc").toString
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def seedSource(rows: Seq[(Int, String, java.sql.Timestamp)]): Unit =
    Extract.jdbcOverwrite(
      rows.toDF("currency_id", "currency_code", "last_updated"),
      url, "src_currency", props)

  private def runBatch(batchId: String): Seq[String] =
    Runner.runOnce(spark,
      Map("currency" -> Extract.jdbc(spark, url, "src_currency", props)),
      s"$root/landing", s"$root/processed", s"$root/warehouse",
      s"$root/state/update_tracking.json", batchId,
      jdbcWarehouse = Some((url, props)))

  test("ingest from JDBC -> star rebuild -> JDBC warehouse overwrite, two batches") {
    // Batch 1: two currencies flow source -> landing -> dim -> warehouse.
    seedSource(Seq(
      (1, "GBP", ts("2025-09-01 08:00:00")),
      (2, "EUR", ts("2025-09-01 08:30:00"))))
    assert(runBatch("2025-09-01 09:00:00.000") == Seq("currency"))
    val wh1 = Extract.jdbc(spark, url, "currency", props).orderBy("currency_id").collect()
    assert(wh1.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq(1 -> "GBP", 2 -> "EUR"))

    // Batch 2: one row UPDATED at the source (newer last_updated). The
    // incremental extract lands only that row; keep-last replay resolves
    // it; the warehouse is REPLACED — still 2 rows, updated value, no
    // append duplicates.
    seedSource(Seq(
      (1, "GBP", ts("2025-09-01 08:00:00")),
      (2, "USD", ts("2025-09-01 10:00:00"))))
    assert(runBatch("2025-09-01 10:30:00.000") == Seq("currency"))
    val wh2 = Extract.jdbc(spark, url, "currency", props).orderBy("currency_id").collect()
    assert(wh2.length == 2, "warehouse load is overwrite, not append")
    assert(wh2.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq(1 -> "GBP", 2 -> "USD"))

    // Gate: a third run with an unchanged source ingests nothing.
    assert(runBatch("2025-09-01 11:00:00.000").isEmpty)

    // The landing log kept both immutable increments (batch 2 carried
    // only the strict increment — one row).
    val log = graft.sources.LandingLog.readLog(spark, s"$root/landing", "currency",
      graft.model.Schemas.sources("currency")._1)
    assert(log.count() == 3, "full first extract (2 rows) + one-row increment")
  }

  test("warehouse load is crash-atomic: old table serves until commit; retry completes") {
    // The reference's to_sql(mode="overwrite") truncates the LIVE table
    // before inserting (src/warehousing_lambda.py:64-71) — a crash
    // mid-load leaves it truncated/partial. The engine diverges: the
    // refresh lands in <table>__stage and a single DROP+RENAME
    // transaction publishes it, so every crash point leaves the old
    // table fully readable.
    val urlA = "jdbc:derby:memory:graftatomic;create=true"
    def readCur() =
      Extract.jdbc(spark, urlA, "currency", props)
        .orderBy("currency_id").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq

    // First-ever load: no live table yet; publish is pure rename.
    Extract.jdbcOverwrite(
      Seq((1, "GBP"), (2, "EUR")).toDF("currency_id", "currency_code"),
      urlA, "currency", props)
    assert(readCur() == Seq(1 -> "GBP", 2 -> "EUR"))

    // CRASH mid-load: the v2 stage is fully written (the worst observable
    // point — any partial write is strictly less visible) but the commit
    // transaction never ran. The live table still serves v1 in full.
    Extract.writeJdbcStage(
      Seq((1, "GBP"), (2, "USD"), (3, "JPY")).toDF("currency_id", "currency_code"),
      urlA, "currency", props)
    assert(readCur() == Seq(1 -> "GBP", 2 -> "EUR"),
      "old table must stay fully readable while a stage is pending")

    // Retry from the top: the stale stage is overwritten, then published.
    Extract.jdbcOverwrite(
      Seq((1, "GBP"), (2, "USD"), (3, "JPY")).toDF("currency_id", "currency_code"),
      urlA, "currency", props)
    assert(readCur() == Seq(1 -> "GBP", 2 -> "USD", 3 -> "JPY"))

    // The stage does not outlive its publish.
    intercept[Exception] {
      Extract.jdbc(spark, urlA, "currency__stage", props).collect()
    }

    // Publishing with nothing staged refuses loudly instead of dropping
    // the live table on the floor.
    val e = intercept[RuntimeException] {
      Extract.publishJdbcStage(urlA, "currency", props)
    }
    assert(e.getMessage.contains("no stage table"), e.getMessage)
    assert(readCur() == Seq(1 -> "GBP", 2 -> "USD", 3 -> "JPY"),
      "a refused publish must leave the live table untouched")
  }
}
