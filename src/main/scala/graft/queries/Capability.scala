package graft.queries

import graft.{GQuery, Tables}
import graft.functions.TextSim
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Capability queries for the approximate-aggregate surface and the
  * multimodal decode pipeline. The sketches (c01/c03) cannot hash-match
  * an oracle on their RAW estimates (engine-specific sketch internals),
  * so each emits exact companions plus a published-bound check the
  * oracle pins as having held — a real red/green driver signal instead
  * of `no_oracle`. c02's decode runs the stub codec, but the stub is a
  * DETERMINISTIC byte-fold the oracle replays symbolically (the same
  * replay t51's oracle already hash-matches), so its per-media_type
  * aggregates get a full rows+schema+hash oracle too — no registry row
  * is `no_oracle` anymore.
  */
object Capability {

  /** c01 — HyperLogLog approximate distinct counts (the sketch aggregate
    * for 100 TB cardinality estimation; partial-mergeable, one pass).
    * DuckDB's approx_count_distinct uses a different sketch, so the raw
    * estimate can never hash-match an oracle — instead the query emits
    * the EXACT distinct count (oracle-matchable) plus `hll_ok`, the
    * published-bound check (|approx − exact| ≤ 3·rsd·exact, the same
    * 99.7% band SketchAccuracySpec pins): the oracle asserts the bound
    * HELD, so a drifting sketch turns the row red in the driver
    * artifact instead of hiding behind `no_oracle`. */
  private val c01 = GQuery(
    fn = (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx") - col("exact_users")).cast("double")
            <= lit(3 * 0.02) * col("exact_users").cast("double")).as("hll_ok"))
        .orderBy(col("event_type")),
    oracle = Some(
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(count(*) AS BIGINT) AS n, true AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** c02 — multimodal decode pipeline end-to-end: documents → binary
    * payloads → batched per-partition stub decode → feature aggregation.
    * Exercises the mapPartitions batch contract through the driver
    * harness. The oracle replays the stub decoder's byte-fold
    * symbolically: the checksum is the same `h = (h*31 + byte) % P`
    * fold as `graft_poly_hash` over the whole text (UTF-8 bytes ==
    * code points on the ASCII corpus — the identity t51's oracle
    * already hash-matches end-to-end), `n_bytes` is the text length,
    * and `n_frames` its 64-byte frame count. A decoder drift now turns
    * this row red in the driver artifact instead of hiding behind
    * `no_oracle`; `MultimodalSpec` still pins the batching contract. */
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
    oracle = Some(
      s"""SELECT 'image/stub' AS media_type,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(length(text)) AS BIGINT) AS total_bytes,
         |  CAST(sum(length(text) // 64) AS BIGINT) AS total_frames,
         |  CAST(max(${TextSim.wordHash(TextSim.duck, "text")}) AS BIGINT) AS max_checksum
         |FROM documents ORDER BY media_type""".stripMargin))

  /** c03 — sampled quantile sketch: approx percentiles via Spark's
    * Greenwald-Khanna sketch (mergeable; the scale path when exact
    * percentiles would need a full sort). Like c01, the raw estimate is
    * engine-specific, so the query emits the GK rank-tolerance check
    * instead: the returned p50's rank window [count(<p50), count(≤p50)]
    * must cover the true median rank within n/accuracy (+1 for
    * duplicate-value mass — l_quantity is discrete). The oracle pins
    * group counts exactly and that the bound HELD. */
  private val c03 = GQuery(
    fn = (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sketch = li.groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
          count(lit(1)).as("n"))
      val tol = col("n").cast("double") / 10000.0 + 1.0
      li.join(broadcast(sketch), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(
          max(col("n")).as("n"),
          sum(when(col("l_quantity") < col("p50"), 1L).otherwise(0L)).as("below"),
          sum(when(col("l_quantity") <= col("p50"), 1L).otherwise(0L)).as("at_or_below"))
        .select(col("l_returnflag"), col("n"),
          ((col("below").cast("double") - tol <= col("n").cast("double") / 2.0)
            && (col("n").cast("double") / 2.0 <= col("at_or_below").cast("double") + tol))
            .as("p50_rank_ok"))
        .orderBy(col("l_returnflag"))
    },
    oracle = Some(
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, true AS p50_rank_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  val all: Map[String, GQuery] = Map(
    "c01_hll_distinct" -> c01,
    "c02_multimodal_decode" -> c02,
    "c03_approx_percentile" -> c03)
}
