package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      s"usage: graft.Verify <sfDir> <outDir> [namePrefix...] (got ${args.mkString(" ")})")
    val (sfDir, outDir) = (args(0), args(1))
    // Optional name-prefix filters for local iteration on one query;
    // the driver passes exactly two args and gets the full dump.
    val prefixes = args.drop(2).toSeq
    val spark = GraftSession.build("graft-verify")
    GraftSession.tuneShufflePartitions(spark, Seq(sfDir))
    run(spark, SparkEntry.queries, SparkEntry.oracleSql, sfDir, outDir, prefixes)
    spark.stop()
  }

  /** The dump loop, injectable so the error-artifact contract is spec-able
    * (VerifyErrorsSpec drives it with a deliberately broken registry).
    * Driver contract unchanged: two-arg main dumps every query's parquet +
    * oracle_sql.json exactly as before; _errors.json is additive.
    * Returns the error map for callers. */
  def run(
      spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String],
      sfDir: String,
      outDir: String,
      prefixes: Seq[String] = Nil): Map[String, String] = {
    def selected(name: String): Boolean =
      prefixes.isEmpty || prefixes.exists(name.startsWith)
    new java.io.File(outDir).mkdirs()
    // A failed query must leave a VISIBLE record, not just a stderr line:
    // the driver's correctness compare iterates the dumped parquet dirs, so
    // a swallowed throw silently shrinks the denominator (round 8: e13's
    // analysis error made it vanish from CORRECTNESS_r08.json instead of
    // showing red). Errors are collected and written as _errors.json beside
    // oracle_sql.json — absence of a query dir is then always
    // distinguishable from "never ran".
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}"
        errors(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
      }
      // Blocking barrier (same as Bench): the dump loop is untimed, and a
      // 111-query session otherwise accumulates dead blocks (r19 §heap).
      finally CacheJanitor.drain(blocking = true)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty) {
      System.err.println(
        s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED " +
        s"(recorded in $outDir/_errors.json): ${errors.keys.mkString(", ")}")
    } else {
      System.err.println("[verify] all selected queries dumped, 0 errors")
    }
    errors.toMap
  }
}
