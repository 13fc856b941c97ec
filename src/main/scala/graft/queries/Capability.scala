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

  /** c04 — bloom-filter join pruning (the probe-side pre-shuffle prune
    * every selective fact-dim join wants at 100 TB; see
    * [[graft.functions.BloomSketch]]). Build = the selectively-filtered
    * orders; its keys fold into a contract-sized bloom sketch via the
    * partial-mergeable `graft_bloom_agg`, delivered to every probe task
    * as ONE scalar-subquery result; lineitem rows are dropped at the
    * scan by the codegen'd `graft_bloom_contains` BEFORE the join pays
    * its shuffle. False positives cost only wasted shuffle rows — the
    * real join runs behind the filter, so the aggregates hash-match the
    * PLAIN join oracle exactly; `fp_ok` pins the prune quality (pass
    * rows beyond the true matches within the sized-for fpp band, 16
    * bits/key ≈ 5e-4, graded at 1% + slack). Bloom sizing (`estItems`)
    * is a bounded 1-row count, the same staging contract as t69's
    * frozen mask. */
  private val c04 = GQuery(
    fn = (s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      val money = graft.operators.Relational.money _
      val build = Tables.orders(s, dir)
        .where("o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'")
      build.createOrReplaceTempView("c04_build")
      // Bounded 1-row count (the sizing contract) run at construction,
      // like t69's frozen-mask staging; sizedArgs applies the session's
      // bloom ceilings so the fpp contract can't silently degrade.
      val (est, bits) = graft.functions.BloomSketch.sizedArgs(s, build.count())
      val bloom = s"(SELECT graft_bloom_agg(xxhash64(o_orderkey), ${est}L, ${bits}L) " +
        "FROM c04_build)"
      val li = Tables.lineitem(s, dir)
      val pass = li.where(expr(s"graft_bloom_contains($bloom, xxhash64(l_orderkey))"))
      val joined = pass
        .join(broadcast(build.select(col("o_orderkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_match"),
          sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      val passAgg = pass.agg(count(lit(1)).as("bloom_pass"))
      val probeAgg = li.agg(count(lit(1)).as("probe_rows"))
      probeAgg.crossJoin(joined).crossJoin(passAgg)
        .select(col("probe_rows"), col("n_match"), col("sum_qty"),
          (col("bloom_pass") >= col("n_match") &&
            (col("bloom_pass") - col("n_match")).cast("double")
              <= greatest(lit(10.0), lit(0.01) * col("probe_rows").cast("double")))
            .as("fp_ok"))
    },
    oracle = Some(
      """SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS probe_rows,
        |  CAST(count(*) AS BIGINT) AS n_match,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  true AS fp_ok
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'F'""".stripMargin))

  /** c05 — Count-Min heavy hitters: the one-pass mergeable frequency
    * sketch for "which keys dominate this corpus" (hot domains,
    * over-crawled sources, skew-join diagnosis) when an exact
    * per-key count would be a full shuffle per refresh. The sketch is
    * contract-sized (width ⌈2/ε⌉ × depth ⌈ln(1/δ)⌉ counters — ~112 KB
    * at ε=1e-3, δ=0.01 — independent of data volume) and collected
    * driver-side within the bounded-collect discipline; the driver then
    * probes it for the exact top-k keys and grades each estimate
    * against the published CM guarantee (exact ≤ est ≤ exact + εN),
    * deterministic at fixed seed. The exact top-k companion (count,
    * deterministic tie-break) is what the oracle hash-matches; `cms_ok`
    * turns sketch drift into a red driver row, the c01/c03 discipline.
    *
    * Like t41/t44/t69, the fn runs bounded driver jobs at construction
    * (the sketch agg + the k-row collect); the returned frame is the
    * graded k rows, so the analyze-only guard exercises this query's
    * computation too, not just its plan. */
  private val c05 = GQuery(
    fn = (s, dir) => {
      val k = 10
      val eps = 0.001
      val ev = Tables.events(s, dir)
      val skBytes = ev
        .agg(count_min_sketch(col("user_id"), lit(eps), lit(0.99), lit(42)).as("sk"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      val topk = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id")).limit(k).collect()
      val total = cms.totalCount()
      val graded = topk.toSeq.map { r =>
        val uid = r.getLong(0)
        val exact = r.getLong(1)
        val estC = cms.estimateCount(java.lang.Long.valueOf(uid))
        (uid, exact, estC >= exact && estC <= exact + math.ceil(eps * total).toLong)
      }
      import s.implicits._
      graded.toDF("user_id", "exact_n", "cms_ok")
        .orderBy(col("exact_n").desc, col("user_id"))
    },
    oracle = Some(
      """SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n, true AS cms_ok
        |FROM events GROUP BY user_id
        |ORDER BY exact_n DESC, user_id LIMIT 10""".stripMargin))

  /** c06 — incremental distinct counts from per-batch HLL sketches: the
    * functional twin of [[graft.operators.SketchLog]] (whose on-disk
    * log, batch-keyed replay idempotence, compaction and rebuild are
    * spec-pinned in `SketchLogSpec`). Two simulated landing batches
    * (event_id parity) are sketched INDEPENDENTLY — per-batch scans,
    * the only thing a 100 TB maintenance loop pays — then merged by
    * pure sketch union into per-scope estimates: union of per-batch
    * sketches carries exactly the registers of a single build over the
    * whole stream. The oracle pins the exact distinct count and that
    * the sketch's 3·rsd band held, c01's discipline — but c01 pays a
    * corpus-wide exact pass per refresh, while this path answers from
    * kilobytes of persisted sketch. */
  private val c06 = GQuery(
    fn = (s, dir) => {
      val ev = Tables.events(s, dir)
      val b0 = graft.operators.SketchLog.sketch(
        ev.where("event_id % 2 = 0"), "event_type", "user_id")
      val b1 = graft.operators.SketchLog.sketch(
        ev.where("event_id % 2 = 1"), "event_type", "user_id")
      val merged = b0.unionByName(b1)
        .groupBy(col("event_type"))
        .agg(
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx"),
          sum(col("n_rows")).as("n"))
      val exact = ev.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
      exact.join(merged, "event_type")
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx") - col("exact_users")).cast("double")
            <= lit(graft.operators.SketchLog.errBound)
              * col("exact_users").cast("double")).as("hll_ok"))
        .orderBy(col("event_type"))
    },
    oracle = Some(
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  CAST(count(*) AS BIGINT) AS n, true AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** c07 — REAL image decode through `javax.imageio` (r18 verdict item
    * 4; c02 keeps the stub-decoder contract row): synthetic grayscale
    * PNG fixtures are generated ON EXECUTORS (pure function of doc_id —
    * [[Multimodal.syntheticPng]]), batch-decoded by
    * [[Multimodal.ImageIoDecoder]] (the JDK PNG reader parsing real
    * container bytes), and the decoded dimensions + an order-exact
    * pixel digest are compared against the oracle's CLOSED-FORM
    * recompute of the same rasters — the oracle never sees the PNG
    * bytes (encoders may differ; PNG is lossless, so decoded samples
    * cannot), so a decoder that misreads any pixel, row order, or
    * color model turns the row red. Scale: generation + decode are
    * scan-side per-partition work, no shuffle; the pattern is the
    * image-corpus feature-extract road with the codec swapped in. */
  private val c07 = GQuery(
    fn = (s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).where("doc_id % 37 = 0")
        .select(col("doc_id")).as[Long]
        .map(id => Multimodal.MediaRow(id, "image/png", Multimodal.syntheticPng(id)))
      Multimodal.decodeAll(media, new Multimodal.ImageIoDecoder(8))
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("checksum"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(
      """SELECT doc_id,
        |  CAST(16 + doc_id % 8 AS BIGINT) AS width,
        |  CAST(12 + doc_id % 5 AS BIGINT) AS height,
        |  list_reduce(
        |    list_prepend(CAST(7 AS BIGINT),
        |      list_transform(range(0, (16 + doc_id % 8) * (12 + doc_id % 5)),
        |        p -> (doc_id * 31 + (p % (16 + doc_id % 8)) * 7
        |              + (p // (16 + doc_id % 8)) * 13) % 256)),
        |    (a, g) -> (a * 31 + g) % 1000000007) AS checksum
        |FROM documents WHERE doc_id % 37 = 0 ORDER BY doc_id""".stripMargin))

  /** c08 — REAL audio decode through `javax.sound.sampled` (the audio
    * twin of c07): synthetic mono PCM16 WAV fixtures are generated ON
    * EXECUTORS (pure function of doc_id — [[Multimodal.syntheticWav]],
    * containerized by the JDK's own WAV writer), batch-decoded by
    * [[Multimodal.WavDecoder]] (the JDK RIFF/PCM reader parsing real
    * container bytes), and the decoded rate/frame-count + an
    * order-exact sample digest are compared against the oracle's
    * CLOSED-FORM recompute of the same clips — the oracle never sees
    * the WAV bytes (PCM is lossless, so decoded samples cannot differ
    * across encoders), so a decoder that misreads any sample, frame
    * order, endianness, or sign convention turns the row red. Scale:
    * generation + decode are scan-side per-partition work, no shuffle;
    * the pattern is the audio-corpus feature-extract road with the
    * codec swapped in. */
  private val c08 = GQuery(
    fn = (s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).where("doc_id % 41 = 0")
        .select(col("doc_id")).as[Long]
        .map(id => Multimodal.MediaRow(id, "audio/wav", Multimodal.syntheticWav(id)))
      Multimodal.decodeAll(media, new Multimodal.WavDecoder(8))
        .select(col("doc_id"), col("width").cast("long").as("sample_rate"),
          col("height").cast("long").as("channels"),
          col("n_frames").cast("long").as("n_frames"), col("checksum"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(
      """SELECT doc_id,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(200 + doc_id % 64 AS BIGINT) AS n_frames,
        |  list_reduce(
        |    list_prepend(CAST(7 AS BIGINT),
        |      list_transform(range(0, 200 + doc_id % 64),
        |        i -> (doc_id * 31 + i * 7) % 65536)),
        |    (a, g) -> (a * 31 + g) % 1000000007) AS checksum
        |FROM documents WHERE doc_id % 41 = 0 ORDER BY doc_id""".stripMargin))

  val all: Map[String, GQuery] = Map(
    "c01_hll_distinct" -> c01,
    "c02_multimodal_decode" -> c02,
    "c03_approx_percentile" -> c03,
    "c04_bloom_join_prune" -> c04,
    "c05_cms_heavy_hitters" -> c05,
    "c06_incremental_distinct" -> c06,
    "c07_imageio_decode" -> c07,
    "c08_wav_decode" -> c08)
}
