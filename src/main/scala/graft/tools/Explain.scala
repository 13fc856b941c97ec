package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan-inspection utility: prints the formatted physical plan for the
  * named queries (or a default set) at the given scale dir — used to
  * check pushdown/broadcast/codegen properties during development. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_summary", "q05_big_join_agg")
    val spark = GraftSession.build("graft-explain")
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
