package graft

/** Physical-plan regression guards: the properties that make these
  * queries scale (pushdown, broadcast, partial aggregation, no
  * accidental cross joins) asserted against the compiled plans — so a
  * future refactor that silently de-optimizes a plan fails here, not in
  * a 100 TB run. */
class PlanPropertiesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // formatted mode — the simple plan's toString truncates PushedFilters
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate predicate must push to the scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double"),
      s"scan must prune to the 7 needed columns:\n$p")
  }

  test("q02: multiple pushed predicates") {
    val p = plan("q02_filter_project")
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)") && p.contains("EqualTo(l_returnflag,R)"),
      s"both predicates must push down:\n$p")
  }

  test("q03/q04: dimension lookups are broadcast hash joins") {
    assert(plan("q03_lookup_join").contains("BroadcastHashJoin"))
    val p4 = plan("q04_enrich_customer")
    // formatted mode prints each node in the tree and the detail section
    assert("BroadcastHashJoin".r.findAllIn(p4).size >= 2 && !p4.contains("SortMergeJoin"),
      s"both enrichment joins must broadcast:\n$p4")
  }

  test("t74: the indexed batch path only ever broadcasts against the corpus-side logs") {
    // The whole point of the posting/df side tables is that the
    // corpus-side logs are SCANNED, never shuffled: every join in the
    // delta-pair plan must be a broadcast hash join (the increment/
    // cap/candidate side is the bounded one by construction). A
    // SortMergeJoin or ShuffledHashJoin here means a refactor dropped
    // a broadcast hint and the corpus logs started moving per batch.
    val p = plan("t74_indexed_dedup")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus-side logs must never shuffle into a join:\n$p")
  }

  test("q01/q05: aggregates split partial/final (map-side combine)") {
    assert("HashAggregate".r.findAllIn(plan("q01_pricing_summary")).size >= 2)
    assert("HashAggregate".r.findAllIn(plan("q05_big_join_agg")).size >= 2)
  }

  test("t35/t36/t37/t39/t41: near-dup + ANN candidate generation never cross-joins the corpus") {
    // t37: pigeonhole banding keys candidates on (table, 15-bit block
    // combo) equi-joins; t39: probe→bucket equi-join; t41: cell equi-join
    // against the scan-side assignment — no corpus×corpus join survives
    // in any of them.
    // t67/t69: the incremental delta-pair paths keep the same shape —
    // posting/bucket equi-joins with the increment on one side.
    // t70: the refreeze lifecycle runs the same delta-pair shape under
    // both masks — the migration must not change the join structure.
    Seq("t35_ngram_jaccard_dedup", "t36_minhash_lsh_dedup", "t37_simhash_dedup",
      "t39_lsh_bucket_ann", "t41_ivf_ann", "t49_ivf_sq8_ann", "t50_decontam_removal",
      "t51_crossmodal_ann", "t54_embedding_dedup", "t56_semdedup",
      "t63_ivf_pq_ann", "t67_incremental_dedup", "t69_incremental_cosine",
      "t70_refreeze_cosine",
      // t73: positional k-grams join the duplicated-hash SET (a
      // hash-keyed aggregate), never themselves — an m-fold repeat
      // costs m rows, not m².
      "t73_exact_substring_dedup",
      // t74: the persisted indexed batch path — candidates and verify
      // from the posting/df side tables; its corpus-side scans must
      // only ever meet broadcast sides (asserted separately below).
      "t74_indexed_dedup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not cartesian-join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q must pair via equi-joins:\n$p")
    }
    // t71: both lifecycle phases are scan-side projections over
    // broadcast quantizer literals — the plan may contain NO join of
    // any kind (a join here means someone turned the centroid literal
    // back into a corpus×cells cross join).
    locally {
      val p = plan("t71_refreeze_ann")
      assert(!p.contains("Join"), s"t71 must stay join-free scan-side encode:\n$p")
    }
  }

  test("t41: cell assignment is scan-side — no full-corpus window, no shuffle before the probe join") {
    val p = plan("t41_ivf_ann")
    // The round-2 plan assigned cells via CROSS JOIN + row_number over
    // n×cells rows. Now assignment is an argmin fold over the broadcast
    // centroid literal, so the ONLY Window node left is the bounded
    // per-query top-k after the probe equi-join.
    val windows = "(?m)^\\(\\d+\\) Window\\s*$".r.findAllIn(p).size
    assert(windows == 1, s"expected exactly the per-query ranking window, got $windows:\n$p")
    assert(!p.contains("SortMergeJoin"), s"probe join must broadcast:\n$p")
  }

  test("t49: SQ8 scoring joins on cell — no corpus-wide nested loop, only the two ranking windows") {
    val p = plan("t49_ivf_sq8_ann")
    // The whole point of composing IVF with SQ8: every scoring pair comes
    // from the cell equi-join (probe side ≤ 3·queries rows), so the plan
    // must contain no corpus×corpus nested loop, and the only Window
    // nodes are the bounded per-query candidate + re-rank rankings.
    assert(!p.contains("CartesianProduct"), s"t49 must not cartesian-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"t49 must score via the cell equi-join:\n$p")
    val windows = "(?m)^\\(\\d+\\) Window\\s*$".r.findAllIn(p).size
    assert(windows == 2, s"expected candidate + re-rank windows only, got $windows:\n$p")
  }

  test("t63: PQ scoring joins on cell — no corpus-wide nested loop, only the two ranking windows") {
    val p = plan("t63_ivf_pq_ann")
    // Same contract as t49 with the PQ code table: scoring pairs come
    // only from the cell equi-join, candidates + re-rank are the only
    // windows. The ADC lookups live inside the join projection.
    assert(!p.contains("CartesianProduct"), s"t63 must not cartesian-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"t63 must score via the cell equi-join:\n$p")
    val windows = "(?m)^\\(\\d+\\) Window\\s*$".r.findAllIn(p).size
    assert(windows == 2, s"expected candidate + re-rank windows only, got $windows:\n$p")
  }

  test("t56: SemDeDup pairs come only from the within-cell self-equi-join") {
    val p = plan("t56_semdedup")
    // The published method's cost bound: pair generation is the cell
    // equi-join of the scan-side assignment with itself — never a
    // corpus×corpus comparison, and no iterative resolution loop.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"t56 must pair via the cell equi-join:\n$p")
    assert(!p.contains("Window"), s"t56 is one join + one aggregate, no window:\n$p")
  }

  test("t57: shard assignment is scan-side; the only shuffle partitioning is the per-shard rank") {
    val p = plan("t57_shuffle_shard")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"), s"t57 must not join at all:\n$p")
    val windows = "(?m)^\\(\\d+\\) Window\\s*$".r.findAllIn(p).size
    assert(windows == 1, s"expected exactly the per-shard rank window, got $windows:\n$p")
  }

  test("q13: unpivot compiles to Expand (no join, no explode shuffle)") {
    val p = plan("q13_unpivot")
    assert(p.contains("Expand"), s"native unpivot should use Expand:\n$p")
  }

  test("q06: keep-last dedup is a windowed rank filter with group-limit pushdown") {
    val p = plan("q06_dedup_keeplast")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      s"dedup should run as a window rank filter:\n$p")
  }
}
