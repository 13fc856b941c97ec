package graft

/** End-to-end checks for the sketch capability queries (c04–c06): the
  * verdict columns must come back TRUE (each pins a published sketch
  * bound or the no-false-negative prune contract) and c04's plan must
  * actually carry the bloom probe below the join — the property that
  * makes it a pre-shuffle prune, not a post-join decoration. */
class CapabilitySketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("c04: bloom prune returns the exact join's aggregates with fp_ok") {
    val rows = SparkEntry.queries("c04_bloom_join_prune")(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Boolean]("fp_ok"), s"bloom false-positive band blown: $r")
    assert(r.getAs[Long]("n_match") > 0L)
    assert(r.getAs[Long]("probe_rows") > r.getAs[Long]("n_match"),
      "fixture degenerate: every probe row matched — the prune proves nothing")
  }

  test("c04: the bloom membership probe filters the probe side below the join") {
    // Tree walk, not a string-index check: the query ALSO counts bloom
    // passes in a separate agg branch, whose Filter(might_contain) would
    // satisfy any textual "appears after the join line" assertion even
    // if the join branch lost its prune. The pin must find the probe as
    // a descendant of the join's STREAMED side specifically.
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def hasBloomProbe(p: SparkPlan): Boolean = p.exists {
      case f: FilterExec => f.condition.exists {
        case _: BloomFilterMightContain => true
        case _ => false
      }
      case _ => false
    }
    val sp = SparkEntry.queries("c04_bloom_join_prune")(spark, dir)
      .queryExecution.sparkPlan
    val joins = sp.collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, s"expected a broadcast join in the plan:\n$sp")
    assert(joins.exists { j =>
      val streamed = j.buildSide match {
        case BuildLeft => j.right
        case BuildRight => j.left
      }
      hasBloomProbe(streamed)
    }, s"bloom probe must prune the join's streamed side BELOW the join:\n$sp")
  }

  test("c05: every top-k estimate honours the count-min guarantee") {
    val rows = SparkEntry.queries("c05_cms_heavy_hitters")(spark, dir).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[Boolean]("cms_ok")),
      s"count-min bound violated: ${rows.mkString(", ")}")
    // Descending exact counts with the deterministic tie-break.
    val counts = rows.map(_.getAs[Long]("exact_n")).toSeq
    assert(counts === counts.sorted.reverse)
  }

  test("c06: merged per-batch sketches stay inside the 3-sigma band") {
    val rows = SparkEntry.queries("c06_incremental_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("hll_ok")),
      s"HLL union drifted past 3·rsd: ${rows.mkString(", ")}")
  }
}
