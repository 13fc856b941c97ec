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

  test("codegen accepts double-width and MIXED-width vectors, bit-identical to the HOF fold") {
    // Embeddings parquet in the wild carries float32 or float64; both
    // widths (and the mixed case — a double query against a float corpus)
    // must EXECUTE through the generated code, not just analyze, and stay
    // bit-equal to the HOF form (`double(x)` is exact for either width).
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(50) { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    rows.toDF("id", "d", "f").createOrReplaceTempView("vecs_mixed")
    val out = spark.sql(
      s"""SELECT graft_dot(d, d) AS dd_fast,
         |       ${TextSim.dotHof(TextSim.spark, "d", "d")} AS dd_hof,
         |       graft_dot(d, f) AS df_fast,
         |       ${TextSim.dotHof(TextSim.spark, "d", "f")} AS df_hof
         |FROM vecs_mixed""".stripMargin).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "double-double mismatch")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "mixed-width mismatch")
    }
    // The SQ8 scoring path with a double-width query, against its HOF
    // rendering (the exact dequantize arithmetic), through codegen too.
    val codes = Seq.tabulate(20) { i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() * 2 - 1),
        Array.fill(8)(rnd.nextInt(256).toLong))
    }
    codes.toDF("id", "q", "codes").createOrReplaceTempView("sq8_mixed")
    val mns = Array.fill(8)("-1.0D").mkString("array(", ", ", ")")
    val spans = Array.fill(8)("2.0D").mkString("array(", ", ", ")")
    val sq = spark.sql(
      s"""SELECT graft_sq8_dot(q, codes, $mns, $spans) AS fast,
         |  aggregate(zip_with(q, transform(sequence(1, 8),
         |      i -> element_at($mns, i) + CAST(element_at(codes, i) AS DOUBLE) / 255.0D * element_at($spans, i)),
         |    (x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v) AS hof
         |FROM sq8_mixed""".stripMargin).collect()
    sq.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "sq8 double-query mismatch")
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
