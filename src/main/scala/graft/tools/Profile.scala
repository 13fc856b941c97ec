package graft.tools

/** Stage-level profiling entry for the iterative dedup path (the
  * slowest registered query family): times t54's LSH pair generation,
  * the connected-components driver loop, and the full query separately,
  * so a regression is attributable to a stage instead of a total.
  * Combine with GRAFT_CC_DEBUG=1 for per-round CC timings.
  *
  *   GRAFT_CC_DEBUG=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("profile")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.GraftFunctions.registerAll(spark)
    graft.Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = graft.queries.TrainingData.all("t54_embedding_dedup")
    val pairs = time("pairs collect") {
      val p = spark.sql(graft.queries.TrainingData.lshPairsSql)
      val n = p.count(); println(s"[profile] n_pairs=$n"); p
    }
    time("cc") {
      val l = graft.operators.Relational.connectedComponents(pairs.select("vec_a", "vec_b"))
      println(s"[profile] n_labeled=${l.count()}"); l
    }
    // count(), never collect(): the tool must profile big outputs, not OOM on them
    time("full t54 (cold caches)") { q.fn(spark, dir).count() }
    // The two remaining slowest registered queries (both output-bound at
    // sf0.1 — see SCALE.md): time them whole so a regression in either
    // is visible from the same entry point.
    graft.CacheJanitor.drain()
    for (name <- Seq("t37_simhash_dedup", "t35_ngram_jaccard_dedup", "t66_curation_v2")) {
      time(s"full $name") {
        println(s"[profile] ${name}_rows=" +
          graft.queries.TrainingData.all(name).fn(spark, dir).count())
      }
      graft.CacheJanitor.drain()
    }
    spark.stop()
  }
}
