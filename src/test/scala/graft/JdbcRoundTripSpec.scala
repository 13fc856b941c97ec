package graft

import graft.sources.Extract
import org.apache.spark.sql.functions._
import java.util.Properties

/** JDBC source/sink round-trip (reference S1/S2/S10) against embedded
  * Derby — the only §2 operators otherwise untestable in this
  * zero-egress environment. Covers: full-refresh batched overwrite sink,
  * projected + watermark-predicated incremental read (pushed to the
  * remote SQL), and the max-watermark probe. */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new Properties()
  props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

  test("jdbc overwrite sink + incremental predicated read + watermark probe") {
    val rows = Seq(
      (1, "alpha", java.sql.Timestamp.valueOf("2025-09-01 08:00:00")),
      (2, "beta", java.sql.Timestamp.valueOf("2025-09-01 09:00:00")),
      (3, "gamma", java.sql.Timestamp.valueOf("2025-09-01 10:00:00")))
      .toDF("id", "name", "last_updated")

    // S10: full-refresh overwrite with batched writes
    Extract.jdbcOverwrite(rows, url, "src_table", props)

    // S1: projected incremental read — only rows newer than the watermark
    val src = Extract.jdbc(spark, url, "src_table", props)
    val inc = Extract.increment(src, Seq("id", "name", "last_updated"), "2025-09-01 08:30:00")
      .orderBy("id").collect()
    assert(inc.map(_.getInt(0)).toSeq == Seq(2, 3), "watermark predicate filters old rows")

    // S2: max-watermark probe
    assert(Extract.maxLastUpdated(src).map(_.toString).contains("2025-09-01 10:00:00.0"))

    // overwrite really replaces (not appends)
    Extract.jdbcOverwrite(rows.filter(col("id") === 1), url, "src_table", props)
    assert(Extract.jdbc(spark, url, "src_table", props).count() == 1)
  }
}
