package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: run every registered query once at the target SF,
  * emit ONE JSON line. A query that throws is reported as `-1` in
  * `queries` AND carries its message in `errors` — a failure must never
  * masquerade as a (fast) timing. */
object Bench {
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")
    val results: Seq[(String, Double, Option[String])] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
          finally CacheJanitor.drain()
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    val qs = results
      .map { case (k, v, err) => s"\"${esc(k)}\":" + (if (err.isEmpty) v else -1) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"${esc(k)}\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val nErr = results.count(_._3.nonEmpty)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
