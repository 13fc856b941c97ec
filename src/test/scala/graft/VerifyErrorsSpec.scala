package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The correctness gate's failure shape (round-8 lesson): a query that
  * throws must leave a VISIBLE artifact, not silently shrink the
  * denominator. Drives Verify.run with a deliberately broken registry and
  * pins that (a) the broken query lands in _errors.json with its message,
  * (b) the healthy query still dumps parquet + its oracle entry (one bad
  * query cannot sink the run), and (c) a clean run writes an EMPTY
  * _errors.json — so "no file"/"no entry" is always distinguishable from
  * "never ran". */
class VerifyErrorsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val good: (SparkSession, String) => DataFrame =
    (s, d) => Tables.region(s, d)
  private val broken: (SparkSession, String) => DataFrame =
    (s, d) => Tables.region(s, d).selectExpr("no_such_column + 1")

  test("a broken query produces a visible error record; healthy ones still dump") {
    val out = Files.createTempDirectory("graft_verify_err").toString
    val errs = Verify.run(spark,
      queries = Map("vx_ok" -> good, "vx_broken" -> broken),
      oracleSql = Map("vx_ok" -> "SELECT * FROM region"),
      sfDir = sfDir, outDir = out)
    assert(errs.keySet == Set("vx_broken"))
    val errJson = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(errJson.contains("vx_broken"), s"_errors.json missing entry: $errJson")
    assert(errJson.toLowerCase.contains("no_such_column"),
      s"_errors.json lost the diagnostic message: $errJson")
    // the broken query wrote no parquet dir — absence + error record, never
    // absence alone
    assert(!Files.exists(Paths.get(s"$out/vx_broken")))
    // the healthy query is unaffected: parquet present and readable, oracle
    // entry intact (driver contract)
    assert(spark.read.parquet(s"$out/vx_ok").count() ==
      Tables.region(spark, sfDir).count())
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json")).contains("vx_ok"))
  }

  test("a clean run writes an explicitly empty _errors.json") {
    val out = Files.createTempDirectory("graft_verify_ok").toString
    val errs = Verify.run(spark,
      queries = Map("vx_ok" -> good),
      oracleSql = Map("vx_ok" -> "SELECT * FROM region"),
      sfDir = sfDir, outDir = out)
    assert(errs.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_errors.json")).trim == "{}")
  }

  test("prefix filtering still selects both dumps and oracle entries") {
    val out = Files.createTempDirectory("graft_verify_pfx").toString
    Verify.run(spark,
      queries = Map("vx_ok" -> good, "other" -> good),
      oracleSql = Map("vx_ok" -> "SELECT 1", "other" -> "SELECT 2"),
      sfDir = sfDir, outDir = out, prefixes = Seq("vx"))
    assert(Files.exists(Paths.get(s"$out/vx_ok")))
    assert(!Files.exists(Paths.get(s"$out/other")))
    val oracle = Files.readString(Paths.get(s"$out/oracle_sql.json"))
    assert(oracle.contains("vx_ok") && !oracle.contains("other"))
  }
}
