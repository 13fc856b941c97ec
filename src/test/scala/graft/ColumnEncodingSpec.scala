package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType}

/** The e13 failure class, generalized past timestamps: a driver testdata
  * regeneration can plausibly re-encode the OTHER column families too —
  * dates as DATE instead of µs timestamps (the natural TPC-H type),
  * money as DECIMAL(12,2) instead of double, key columns narrowed to
  * INT32. Every registered query must still ANALYZE against that world
  * (round 8 proved an analysis break silently costs a correctness row).
  * Values/hashes are the driver gate's job — it regenerates both sides
  * from the same files; what must never break is plan resolution. */
class ColumnEncodingSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"

  private lazy val variantDir: String = {
    val dir = Files.createTempDirectory("graft_col_enc").resolve("alt")
    Files.createDirectories(dir)
    for (t <- Tables.names if t != "lineitem" && t != "orders")
      Files.copy(Paths.get(s"$srcDir/$t.parquet"),
        dir.resolve(s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Tables.load(spark, srcDir, "lineitem")
      .withColumn("l_shipdate", col("l_shipdate").cast(DateType))
      .withColumn("l_quantity", col("l_quantity").cast(DecimalType(12, 2)))
      .withColumn("l_extendedprice", col("l_extendedprice").cast(DecimalType(12, 2)))
      .withColumn("l_discount", col("l_discount").cast(DecimalType(12, 2)))
      .withColumn("l_tax", col("l_tax").cast(DecimalType(12, 2)))
      .withColumn("l_partkey", col("l_partkey").cast(IntegerType))
      .withColumn("l_suppkey", col("l_suppkey").cast(IntegerType))
      .coalesce(1).write.parquet(dir.resolve("lineitem.parquet").toString)
    Tables.load(spark, srcDir, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast(DateType))
      .withColumn("o_totalprice", col("o_totalprice").cast(DecimalType(12, 2)))
      .withColumn("o_custkey", col("o_custkey").cast(IntegerType))
      .coalesce(1).write.parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  private lazy val doubleEmbDir: String = {
    val dir = Files.createTempDirectory("graft_col_enc_emb").resolve("demb")
    Files.createDirectories(dir)
    for (t <- Tables.names if t != "embeddings")
      Files.copy(Paths.get(s"$srcDir/$t.parquet"),
        dir.resolve(s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Tables.load(spark, srcDir, "embeddings")
      .withColumn("embedding",
        col("embedding").cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
      .coalesce(1).write.parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("every registered query analyzes when embeddings widen to ARRAY<DOUBLE>") {
    // float32 is the common embedding width, but double-width parquet is
    // a real wild shape; the similarity kernels (graft_dot, graft_sq8_dot,
    // graft_dist2, graft_lsh_code) accept both element widths, so the ANN
    // and dedup registry must keep planning.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, doubleEmbDir).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(2).mkString(" "))
      } finally CacheJanitor.drain()
    }
    assert(failures.isEmpty,
      s"queries unplannable under ARRAY<DOUBLE> embeddings:\n${failures.mkString("\n")}")
  }

  /** Order-insensitive value fingerprint of a result (rows rendered and
    * sorted) — the driver's compare normalizes ordering the same way, so
    * equality here is the spec-level twin of its hash match. */
  private def fingerprint(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      case a: Array[_] => a.mkString("[", ",", "]")
      case s: Seq[_] => s.mkString("[", ",", "]")
      case x => x.toString
    }.mkString("|")).toSeq.sorted

  test("representative queries EXECUTE to identical values under each re-encoding") {
    // Analysis-green does not prove value parity (the decimal→double bug
    // class changes results without touching plan resolution): one
    // representative per family runs to completion against each variant
    // and must match the baseline row-for-row.
    //   q01 — DECIMAL money aggregation over the re-encoded lineitem;
    //   q08 — date-part derivation over the re-encoded date columns;
    //   t35 — text dedup (regression guard that re-encoding neighbours
    //         doesn't perturb an untouched family);
    //   t41 — the ANN chain through the width-polymorphic kernels.
    val reps = Seq("q01_pricing_summary", "q08_dim_date",
      "t35_ngram_jaccard_dedup", "t41_ivf_ann")
    for (name <- reps) {
      val fn = SparkEntry.queries(name)
      val base = fingerprint(fn(spark, srcDir))
      CacheJanitor.drain()
      for ((label, dir) <- Seq("DATE/DECIMAL/INT32" -> variantDir,
                               "ARRAY<DOUBLE> embeddings" -> doubleEmbDir)) {
        val got = fingerprint(fn(spark, dir))
        CacheJanitor.drain()
        assert(got == base,
          s"$name drifts under $label re-encoding: " +
            s"${got.diff(base).take(3)} vs ${base.diff(got).take(3)}")
      }
    }
  }

  test("every registered query analyzes when dates/money/keys re-encode") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, variantDir).queryExecution.analyzed; None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(2).mkString(" "))
      } finally CacheJanitor.drain()
    }
    assert(failures.isEmpty,
      s"queries unplannable under DATE/DECIMAL/INT32 re-encoding:\n${failures.mkString("\n")}")
  }
}
