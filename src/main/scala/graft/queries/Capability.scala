package graft.queries

import graft.{GQuery, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Capability queries with no exact SQL oracle (sketches and module
  * pipelines) — the driver records a rows-only check for these. They put
  * the approximate-aggregate surface and the multimodal decode pipeline
  * through the same Verify/Bench harness as everything else.
  */
object Capability {

  /** c01 — HyperLogLog approximate distinct counts (the sketch aggregate
    * for 100 TB cardinality estimation; partial-mergeable, one pass).
    * No oracle: DuckDB's approx_count_distinct uses a different sketch. */
  private val c01 = GQuery(
    fn = (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
    oracle = None)

  /** c02 — multimodal decode pipeline end-to-end: documents → binary
    * payloads → batched per-partition stub decode → feature aggregation.
    * Exercises the mapPartitions batch contract through the driver
    * harness (no oracle — the stub codec is engine-internal). */
  private val c02 = GQuery(
    fn = (s, dir) => {
      val media = Multimodal.documentsAsMedia(Tables.documents(s, dir))
      Multimodal.decodeAll(media, new Multimodal.StubDecoder(8))
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("n_frames").cast("long")).as("total_frames"),
          max(col("checksum")).as("max_checksum"))
        .orderBy(col("media_type"))
    },
    oracle = None)

  /** c03 — sampled quantile sketch: approx percentiles via Spark's
    * Greenwald-Khanna sketch (mergeable; the scale path when exact
    * percentiles would need a full sort). */
  private val c03 = GQuery(
    fn = (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50_approx"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
    oracle = None)

  val all: Map[String, GQuery] = Map(
    "c01_hll_distinct" -> c01,
    "c02_multimodal_decode" -> c02,
    "c03_approx_percentile" -> c03)
}
