package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions deployment path: a session built with
  * GraftExtensions has the native functions without any imperative
  * registration. */
class ExtensionsSpec extends SparkSpec {

  test("withExtensions registers graft functions at session build") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // note: getOrCreate may return the shared session; the injected
    // functions must be present either way
    val r = s2.sql(
      """SELECT graft_poly_hash('abc') AS h,
        |       graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == graft.functions.PolyHash.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(r.getDouble(1) == 11.0)
  }
}
