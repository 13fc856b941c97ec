package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator/query: a Spark implementation over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (so the driver's hash compare is exact):
  *  - output column names identical on both sides;
  *  - rows emitted in a deterministic ORDER BY present on both sides;
  *  - money aggregates computed in DECIMAL (exact, order-independent) and
  *    cast to DOUBLE only at the end;
  *  - derived integers cast to BIGINT on both sides;
  *  - no transcendental functions (libm results differ across engines).
  */
final case class GQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
