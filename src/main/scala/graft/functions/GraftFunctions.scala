package graft.functions

import org.apache.spark.sql.SparkSession

/** One-stop idempotent registration of the engine's native expressions on
  * any SparkSession (called by GraftSession and defensively by each query
  * that uses them, so externally-built sessions work too). */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    PolyHash.register(spark)
    DotProduct.register(spark)
    Sq8.register(spark)
    Dist2.register(spark)
    LshCode.register(spark)
    InterCount.register(spark)
    BloomSketch.register(spark)
  }
}
