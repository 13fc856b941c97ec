package graft

import graft.functions.{GraftFunctions, TextSim}

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot product is bit-identical to the HOF fold") {
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(50) { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    rows.toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val out = spark.sql(
      s"""SELECT graft_dot(a, b) AS fast,
         |       ${TextSim.dotHof(TextSim.spark, "a", "b")} AS hof,
         |       graft_dot(a, a) AS n2_fast,
         |       ${TextSim.dotHof(TextSim.spark, "a", "a")} AS n2_hof
         |FROM vecs""".stripMargin).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot mismatch")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "norm mismatch")
    }
  }

  test("null array and length mismatch yield NULL") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a,
        |       graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS b
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
