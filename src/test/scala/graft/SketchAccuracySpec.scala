package graft

import org.apache.spark.sql.functions._

/** Error-bound verification for the sketch aggregates (c01 HLL, c03
  * approx-percentile) against exact answers computed on the same data.
  * Since r7 the registry queries THEMSELVES emit the bound check (the
  * oracle pins it green), so this spec (a) re-derives the bounds from
  * the raw sketch values — the numeric evidence behind the booleans —
  * and (b) asserts the query-surfaced verdicts agree. */
class SketchAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("c01: HLL distinct counts within 3x the configured 2% rsd of exact") {
    val both = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(both.nonEmpty && both.forall(_._3 > 0), "exact distinct counts must be non-trivial")
    both.foreach { case (et, ap, ex) =>
      val relErr = math.abs(ap - ex).toDouble / ex
      info(f"c01 $et: approx=$ap exact=$ex relErr=$relErr%.4f")
      // rsd 0.02 is a standard deviation; 3x = ~99.7% confidence band.
      assert(relErr <= 3 * 0.02, s"HLL estimate for $et off by $relErr (> 6%)")
    }
    // The registry query surfaces the same check for the driver oracle.
    val verdicts = SparkEntry.queries("c01_hll_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getBoolean(3))
    assert(verdicts.nonEmpty && verdicts.forall(_._2), s"c01 hll_ok verdicts: ${verdicts.toSeq}")
  }

  test("c03: approx p50 sits within rank tolerance of the true median") {
    val approx = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(approx.nonEmpty)
    val li = Tables.lineitem(spark, dir).select("l_returnflag", "l_quantity")
    approx.foreach { case (flag, p50, n) =>
      // Rank of the returned value within its group: GK with accuracy
      // 10000 guarantees rank error <= n/10000; allow that plus the mass
      // of duplicate values at the estimate (l_quantity is discrete, so
      // a whole run of equal values legitimately spans the median).
      val below = li.filter(col("l_returnflag") === flag && col("l_quantity") < p50).count()
      val atOrBelow = li.filter(col("l_returnflag") === flag && col("l_quantity") <= p50).count()
      val target = n / 2.0
      val tol = n / 10000.0 + 1
      info(s"c03 $flag: p50=$p50 n=$n rank_range=[$below,$atOrBelow] target=$target")
      assert(below - tol <= target && target <= atOrBelow + tol,
        s"approx p50 $p50 for $flag has rank range [$below,$atOrBelow], true median rank $target")
    }
    val verdicts = SparkEntry.queries("c03_approx_percentile")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getBoolean(2))
    assert(verdicts.nonEmpty && verdicts.forall(_._2), s"c03 p50_rank_ok verdicts: ${verdicts.toSeq}")
  }
}
