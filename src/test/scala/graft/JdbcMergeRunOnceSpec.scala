package graft

import java.nio.file.Files
import java.util.Properties

import graft.sources.{Extract, LandingLog}
import graft.star.{MergeRunner, StarBench}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `MergeRunner.runOnceJdbc` end-to-end on embedded Derby over the real
  * sf0.001 source frames: two micro-batches (a last_updated slice, then
  * the full sources), facts published INCREMENTALLY through the staged
  * MERGE, dims by full refresh — after each batch every published
  * warehouse table must equal its merged parquet snapshot. This is the
  * composition JdbcMergeSpec's processMerge-level test doesn't cover
  * (ingest gates + dim refresh + fact upsert through one entry). */
class JdbcMergeRunOnceSpec extends SparkSpec {

  private val props = new Properties()
  props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

  private def rowSet(df: DataFrame, cols: Seq[String]): Set[String] =
    df.select(cols.map(col): _*).collect().map(_.toString).toSet

  test("runOnceJdbc: two sliced batches; warehouse tables equal merged snapshots") {
    val url = "jdbc:derby:memory:graftrunoncejdbc;create=true"
    val root = Files.createTempDirectory("graft_runoncejdbc").toString
    val srcs = StarBench.sources(spark, "/root/testdata/sf0.001")

    // Median fact last_updated as the slice cutoff — batch 1 lands a
    // genuine subset, batch 2 the remainder (constant-ts dims land once).
    val cut = srcs("sales_order")
      .selectExpr("percentile_approx(last_updated, 0.5, 1000) AS c").head.get(0)
    val constantTs = srcs.keys.filter { t =>
      val mm = srcs(t).agg(min("last_updated"), max("last_updated")).head
      mm.get(0) == mm.get(1)
    }.toSet
    val sliced = srcs.map { case (t, df) =>
      t -> (if (constantTs(t)) df else df.where(col("last_updated") <= lit(cut)))
    }

    def compare(keys: Seq[String]): Unit = keys.foreach { key =>
      val snap = LandingLog.readSnapshot(spark, s"$root/processed", key)
      val cols = snap.columns.filterNot(_.startsWith("__p_")).toSeq
      val table = key.replaceFirst("^dim-", "").replaceFirst("^fact-", "")
        .replace("-", "_")
      // Quoted-UPPERCASE readback: Spark's Derby writer creates the
      // stage unquoted (stored uppercase) and the publish rename
      // inherits that casing, while `transaction` is a Derby reserved
      // word an unquoted SELECT trips over — so quote the stored form.
      assert(rowSet(Extract.jdbc(spark, url, s""""${table.toUpperCase}"""", props),
        cols) == rowSet(snap, cols), s"warehouse $table diverged from snapshot $key")
    }

    val w1 = MergeRunner.runOnceJdbc(spark, sliced, s"$root/landing",
      s"$root/processed", s"$root/state.json", "2025-09-01 10:00:00.000", url, props)
    assert(w1.exists(_.startsWith("fact-")) && w1.exists(_.startsWith("dim-")),
      s"first batch must publish facts and dims, got $w1")
    compare(w1)

    val w2 = MergeRunner.runOnceJdbc(spark, srcs, s"$root/landing",
      s"$root/processed", s"$root/state.json", "2025-09-01 10:10:00.000", url, props)
    assert(w2.exists(_.startsWith("fact-")), s"second batch must update facts, got $w2")
    compare(w2)

    // Third call with unchanged sources: every ingest gate closes — a
    // clean no-op, nothing re-published.
    val w3 = MergeRunner.runOnceJdbc(spark, srcs, s"$root/landing",
      s"$root/processed", s"$root/state.json", "2025-09-01 10:20:00.000", url, props)
    assert(w3.isEmpty, s"no-change batch must publish nothing, got $w3")
    CacheJanitor.drain()
  }
}
