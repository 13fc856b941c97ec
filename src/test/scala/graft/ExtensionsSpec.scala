package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions deployment path. GraftSession sets the
  * string-form extensions config (the spark-submit production path); as a
  * static conf it is re-applied to every SparkSession created over the
  * context. The shared test session also calls registerAll imperatively,
  * which would make a test against it vacuous — so this builds a FRESH
  * session (default/active cleared first) whose function registry was
  * never touched imperatively: resolution there proves the injection path
  * alone registers the functions. */
class ExtensionsSpec extends SparkSpec {

  test("extensions injection registers graft functions in a fresh, untouched session") {
    val shared = spark // force shared session init before clearing
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]").appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne shared, "extension session must be fresh (vacuity guard)")
      assert(s2.sessionState ne shared.sessionState,
        "fresh session must not inherit the shared session's registry")
      val r = s2.sql(
        """SELECT graft_poly_hash('abc') AS h,
          |       graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       graft_sq8_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                     array(0L, 255L), array(0.0D, 0.0D), array(1.0D, 1.0D)) AS sd,
          |       graft_sq8_norm2(array(255L, 255L), array(0.0D, 0.0D), array(1.0D, 1.0D)) AS sn,
          |       graft_dist2(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                   array(3.0D, 4.0D)) AS d2,
          |       graft_lsh_code(array(CAST(0.0 AS FLOAT))) AS lc,
          |       graft_inter_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ic,
          |       graft_bloom_contains(
          |         (SELECT graft_bloom_agg(xxhash64(id), 10L, 160L) FROM range(10)),
          |         xxhash64(3L)) AS bc
          |""".stripMargin).collect()(0)
      assert(r.getLong(0) == graft.functions.PolyHash.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
      assert(r.getDouble(1) == 11.0)
      assert(r.getDouble(2) == 2.0) // 1*0 + 2*(255/255)
      assert(r.getDouble(3) == 2.0) // 1^2 + 1^2
      assert(r.getDouble(4) == 8.0) // (1-3)^2 + (2-4)^2
      // 0.0 contributes 0 to every plane's projection; 0.0 >= 0 sets all
      // 12 sign bits — the HOF form's exact edge semantics.
      assert(r.getLong(5) == (1L << graft.functions.TextSim.lshPlanes) - 1)
      assert(r.getLong(6) == 2L) // {3, 5}
      // Bloom build + probe through the injection path alone: a key the
      // build inserted must come back might-contain=true (no false
      // negatives, whatever the hash seeds).
      assert(r.getBoolean(7))
    } finally {
      // Hand the shared session back to the other suites (the fresh
      // session shares its SparkContext, so nothing is stopped here).
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
