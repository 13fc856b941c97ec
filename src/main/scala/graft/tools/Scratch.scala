package graft.tools

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("scratch")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.functions.GraftFunctions.registerAll(spark)
    graft.Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val q = graft.queries.TrainingData.all("t54_embedding_dedup")
    val pairsSql = graft.queries.TrainingData.debugLshPairsSql
    val pairs = time("pairs collect") {
      val p = spark.sql(pairsSql)
      val n = p.count(); println(s"[scratch] n_pairs=$n"); p
    }
    val labels = time("cc") {
      val l = graft.operators.Relational.connectedComponents(pairs.select("vec_a", "vec_b"))
      println(s"[scratch] n_labeled=${l.count()}"); l
    }
    time("full t54") { q.fn(spark, dir).collect().length }
    spark.stop()
  }
}
