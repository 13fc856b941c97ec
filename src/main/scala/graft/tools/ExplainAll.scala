package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for every registry query (or a named
  * subset) to one file per query under an output directory — the
  * optimization round's plan evidence (plans/r19/<name>_<suffix>.txt).
  * Lifecycle queries execute their maintenance side effects while the
  * frame is built; the dumped plan is the returned (final) frame's.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     SPARK_GRAFT_EXPLAIN_OUT=plans/r19 SPARK_GRAFT_EXPLAIN_SUFFIX=before \
  *     sbt "runMain graft.tools.ExplainAll [names...]"
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_OUT", "plans/r19")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.GraftSession.build("graft-explain-all")
    graft.GraftSession.tuneShufflePartitions(spark, Seq(dir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
        println(s"[explain] $n -> $outDir/${n}_$suffix.txt")
      } catch {
        case e: Exception =>
          System.err.println(s"[explain] $n FAILED: $e")
      } finally graft.CacheJanitor.drain()
    }
    spark.stop()
  }
}
