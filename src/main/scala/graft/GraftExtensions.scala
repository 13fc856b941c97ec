package graft

import graft.functions.{BloomSketch, Dist2, DotProduct, InterCount, LshCode, PolyHash, Sq8}
import org.apache.spark.sql.SparkSessionExtensions

/** Spark extension point: registers the engine's native expressions at
  * session build time. Use via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on spark-submit —
  * the standard way a cluster deployment picks up the library's functions
  * without touching application code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(PolyHash.description)
    ext.injectFunction(DotProduct.description)
    ext.injectFunction(Sq8.dotDescription)
    ext.injectFunction(Sq8.norm2Description)
    ext.injectFunction(Dist2.description)
    ext.injectFunction(LshCode.description)
    ext.injectFunction(InterCount.description)
    ext.injectFunction(BloomSketch.aggDescription)
    ext.injectFunction(BloomSketch.containsDescription)
  }
}
