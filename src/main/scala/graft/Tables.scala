package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst's data-source V2
  * path gives vectorized reads, column pruning and filter pushdown for free.
  * At cluster scale the same call works against a directory of many files;
  * nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts normalized to session TimestampType regardless of the
    * parquet physical encoding. The wild produces (and the driver's
    * regenerations have produced) all three:
    *  - TIMESTAMP(NANOS): Spark's µs TimestampType cannot hold it; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as
    *    epoch-nanos LongType — convert via integer division (exact; a
    *    double division would lose precision at 2^53) to µs, matching
    *    DuckDB's truncating read of the same file;
    *  - TIMESTAMP_MICROS(isAdjustedToUTC=0): Spark 4 reads TIMESTAMP_NTZ —
    *    cast to TimestampType, value-preserving under the pinned UTC
    *    session TZ (GraftSession) and identical to DuckDB's naive read;
    *  - TIMESTAMP_MICROS(isAdjustedToUTC=1): already TimestampType.
    * One session type downstream means every registered query analyzes
    * against any encoding a regeneration can hand us. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
