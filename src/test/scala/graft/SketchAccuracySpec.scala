package graft

import org.apache.spark.sql.functions._

/** Error-bound verification for the sketch aggregates (c01 HLL, c03
  * approx-percentile) against exact answers computed on the same data —
  * the rows-only driver check says they RUN; this spec says they're
  * RIGHT within their configured accuracy. */
class SketchAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("c01: HLL distinct counts within 3x the configured 2% rsd of exact") {
    val approx = SparkEntry.queries("c01_hll_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    assert(exact.values.forall(_ > 0), "exact distinct counts must be non-trivial")
    exact.foreach { case (et, ex) =>
      val ap = approx(et)
      val relErr = math.abs(ap - ex).toDouble / ex
      info(f"c01 $et: approx=$ap exact=$ex relErr=$relErr%.4f")
      // rsd 0.02 is a standard deviation; 3x = ~99.7% confidence band.
      assert(relErr <= 3 * 0.02, s"HLL estimate for $et off by $relErr (> 6%)")
    }
  }

  test("c03: approx p50 sits within rank tolerance of the true median") {
    val approx = SparkEntry.queries("c03_approx_percentile")(spark, dir)
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
  }
}
