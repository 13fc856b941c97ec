package graft

/** Every registered query must at least ANALYZE — round 4 shipped
  * t55_boilerplate_removal with a scalar subquery inside a
  * higher-order-function lambda (rejected at analysis with
  * UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.HIGHER_ORDER_FUNCTION)
  * while the suite stayed green, because nothing planned the registry.
  * This guard makes an unplannable registration fail `sbt test` the
  * moment it is committed. */
class RegistryAnalyzesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query analyzes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, dir).queryExecution.analyzed
        None
      } catch {
        // String.valueOf: getMessage can be null (NPE, some wrappers) and
        // the diagnostic listing must survive that, not NPE in the catch.
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(3).mkString(" ")}")
      }
    }
    assert(failures.isEmpty, s"unplannable registered queries:\n${failures.mkString("\n")}")
  }

  test("every oracle entry names a registered query") {
    val unknown = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"oracleSql entries without a query: $unknown")
  }
}
