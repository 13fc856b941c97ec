package graft

import graft.functions.{PolyHash, TextSim}
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "the", "customer", "a b", "0123456789",
    "ünïcödé", "中文字符", "mixed 中 ascii", "x" * 500)

  test("codegen expression is bit-identical to the HOF fold on all planes") {
    PolyHash.register(spark)
    val df = samples.toDF("w")
    val rows = df.selectExpr(
      "graft_poly_hash(w) AS fast",
      s"${TextSim.wordHashHof(TextSim.spark, "w")} AS hof").collect()
    rows.zip(samples).foreach { case (r, w) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for '$w'")
    }
  }

  test("matches the direct kernel and stays within [0, P)") {
    samples.foreach { w =>
      val h = PolyHash.hash(org.apache.spark.unsafe.types.UTF8String.fromString(w))
      assert(h >= 0 && h < PolyHash.P)
      // reference fold in plain Scala over code points
      var want = 7L
      w.codePoints().forEach(cp => want = (want * 31 + cp) % PolyHash.P)
      assert(h == want, s"kernel mismatch for '$w'")
    }
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    PolyHash.register(spark)
    // non-literal input so constant folding can't pre-evaluate it; the
    // `*(n)` prefix marks a WholeStageCodegen stage containing the Project
    val df = spark.sql("SELECT graft_poly_hash(CAST(id AS STRING)) AS h FROM range(10)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"expected codegen'd Project in:\n$plan")
    assert(df.collect().length == 10)
  }
}
