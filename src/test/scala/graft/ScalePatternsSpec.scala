package graft

import graft.operators.Relational._
import org.apache.spark.sql.functions._

/** Scale patterns: bucketed co-located joins (no shuffle) and salted
  * two-phase aggregation for skew. */
class ScalePatternsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    writeBucketed(Tables.lineitem(spark, dir), "li_bucketed", 8, "l_orderkey")
    writeBucketed(Tables.orders(spark, dir), "o_bucketed", 8, "o_orderkey")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and the result is right
      val expect = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      assert(joined.orderBy("l_orderkey").collect().toSeq ==
        expect.orderBy("l_orderkey").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = Seq.tabulate(10000)(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "v").repartition(8)
    val salted = saltedSum(Seq("k"), saltBuckets = 16, sumCols = Seq("v"))(df)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = df.groupBy("k").agg(sum("v").as("v"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }
}
