package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) is exposed as a named query over the testdata
  * tables; SQL-expressible ones carry a DuckDB oracle for the driver's
  * hash-compare correctness gate.
  */
object SparkEntry {

  /** All registered queries, assembled from the per-domain registries. */
  def registry: Map[String, GQuery] =
    _root_.graft.queries.Core.all ++ _root_.graft.queries.TrainingData.all ++
      _root_.graft.queries.Extra.all ++ _root_.graft.queries.Capability.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q01_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, GQuery(_, Some(sql), _)) => name -> sql }

  /** Headline queries used by Bench (a scale-representative subset). */
  def headlines: Seq[String] =
    registry.collect { case (name, q) if q.headline => name }.toSeq.sorted
}
