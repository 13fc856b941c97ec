package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Physical-encoding robustness for timestamp columns (round-8 lesson).
  *
  * The driver's testdata regeneration switched `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP_MICROS(isAdjustedToUTC=0) — which Spark 4
  * reads as TIMESTAMP_NTZ — and e13's `CAST(ts AS LONG)` stopped analyzing.
  * One environmental re-encode cost a round. This spec rewrites the sf0.001
  * events table into each physical variant Spark can hand the engine and
  * pins that (a) the loader normalizes every variant to the session
  * TimestampType, and (b) every registered query still analyzes. Reverting
  * the `TimestampNTZType` branch in `Tables.events` fails (a) immediately
  * (mutation check); a future query written against one concrete encoding
  * fails (b) the moment it is committed.
  */
class TimestampEncodingSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"

  /** Variant dirs share the 9 timestamp-free tables (copied bytes) and
    * differ only in how events.ts is physically encoded. */
  private lazy val variants: Map[String, String] = {
    val base = Files.createTempDirectory("graft_ts_enc")
    // Loader-normalized form: TimestampType under the pinned UTC session.
    val events = Tables.events(spark, srcDir).persist()
    val encoded = Map[String, org.apache.spark.sql.DataFrame](
      // Spark writes TimestampType as TIMESTAMP_MICROS(isAdjustedToUTC=1)
      "ltz" -> events,
      // … TimestampNTZType as TIMESTAMP_MICROS(isAdjustedToUTC=0) — the
      // regenerated-testdata shape that broke round 8
      "ntz" -> events.withColumn("ts", col("ts").cast(TimestampNTZType)),
      // epoch-nanos LongType — the exact frame `nanosAsLong=true` hands the
      // loader for TIMESTAMP(NANOS) files (Spark cannot WRITE nanos, so the
      // long column emulates the post-read shape faithfully)
      "nanos" -> events.withColumn("ts", expr("unix_micros(ts) * 1000L")))
    val dirs = encoded.map { case (name, df) =>
      val dir = base.resolve(name)
      Files.createDirectories(dir)
      for (t <- Tables.names if t != "events")
        Files.copy(Paths.get(s"$srcDir/$t.parquet"),
          dir.resolve(s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
      df.coalesce(1).write.parquet(dir.resolve("events.parquet").toString)
      name -> dir.toString
    }
    events.unpersist()
    dirs
  }

  test("loader normalizes every physical ts encoding to session TimestampType") {
    for ((name, dir) <- variants) {
      val got = Tables.events(spark, dir).schema("ts").dataType
      assert(got == TimestampType, s"variant $name: loader produced $got")
      // and the values are the same instants regardless of encoding
      val n = Tables.events(spark, dir)
        .join(Tables.events(spark, srcDir), Seq("event_id", "ts"), "inner").count()
      assert(n == Tables.events(spark, srcDir).count(),
        s"variant $name: ts values drifted under re-encode")
    }
  }

  test("raw variants really differ before the loader (spec is not vacuous)") {
    val raws = variants.map { case (name, dir) =>
      name -> spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType }
    assert(raws("ntz") == TimestampNTZType, s"ntz wrote ${raws("ntz")}")
    assert(raws("nanos") == LongType, s"nanos wrote ${raws("nanos")}")
    assert(raws("ltz") == TimestampType, s"ltz wrote ${raws("ltz")}")
  }

  test("the streaming file source reads µs variants under its explicit schema") {
    // EventsStream.readEvents declares `ts TIMESTAMP` — the production
    // streaming entry must survive a landing directory whose files were
    // written NTZ (the regenerated-testdata shape) as well as LTZ. The
    // batch read here exercises the same parquet requested-schema
    // conversion; the nanos-as-long variant is out of scope for the
    // streaming contract (the landing sink writes µs timestamps).
    for (variant <- Seq("ltz", "ntz")) {
      val df = spark.read
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP")
        .parquet(s"${variants(variant)}/events.parquet")
      assert(df.where(col("ts").isNotNull).count() ==
        Tables.events(spark, srcDir).count(),
        s"explicit-schema read lost rows under the $variant encoding")
    }
  }

  test("every registered query analyzes against every ts encoding") {
    for ((variant, dir) <- variants) {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name [$variant]: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(2).mkString(" "))
        } finally CacheJanitor.drain()
      }
      assert(failures.isEmpty,
        s"queries unplannable under '$variant' ts encoding:\n${failures.mkString("\n")}")
    }
  }
}
