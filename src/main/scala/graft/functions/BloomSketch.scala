package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}

/** Bloom-filter semi-join pruning, exposed as SQL functions.
  *
  * The 100 TB join pattern this serves: a fact-scale probe side joined
  * against a selectively-filtered build side wants the probe rows pruned
  * BEFORE the shuffle — a bloom filter built from the build side's join
  * keys is a few hundred KB (size chosen by contract, independent of
  * probe size), ships to every probe task as a scalar-subquery result,
  * and drops the overwhelming non-matching majority at the scan, so the
  * shuffle moves only plausible matches. False positives are harmless:
  * the real join still runs behind the filter, so RESULTS are exactly
  * the plain join's (the property c04's oracle hash-matches); the bloom
  * only decides how many rows pay the shuffle.
  *
  * Spark ships this machinery for its own runtime-filter injection
  * (`InjectRuntimeFilter`) but gates it on size estimates tuned for
  * cluster-scale scans and exposes no SQL surface. These wrappers
  * register the engine's partial-mergeable bloom aggregate and its
  * codegen'd membership probe under stable names so a pipeline author
  * can APPLY the pattern deliberately:
  *
  *   `graft_bloom_agg(xxhash64(k), estItems, numBits)` → binary sketch
  *   `graft_bloom_contains(<scalar subquery>, xxhash64(k))` → boolean
  *
  * Feed `xxhash64` longs on both sides: one fixed-width insert/probe
  * representation whatever the natural key type. The probe's bloom
  * argument must be foldable or a scalar subquery (enforced by the
  * expression's own type check) — exactly the shape that broadcasts the
  * sketch once instead of joining it row-wise.
  */
object BloomSketch {

  val aggDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
    (children: Seq[Expression]) => children match {
      case Seq(c)       => new BloomFilterAggregate(c)
      case Seq(c, n)    => new BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_agg takes 1-3 arguments, got ${other.size}")
    })

  val containsDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_contains"),
    (children: Seq[Expression]) => children match {
      case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_contains takes 2 arguments, got ${other.size}")
    })

  /** Bits per expected key the library sizes for (fpp ≈ 5e-4). */
  val bitsPerKey = 16L

  /** Bloom sizing honest about Spark's SILENT ceilings: the underlying
    * aggregate clamps its arguments to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (4M items / 2^26 bits out of the box) with no error
    * — a 50M-key build sized naively at 16 bits/key would come back at
    * ~1.3 bits/key, fpp → 1, and the "prune" would pass the whole probe
    * side while looking healthy. This helper returns the (items, bits)
    * that will ACTUALLY apply under the session's ceilings, so a caller
    * can see the degradation (items < estItems ⇒ raise the confs —
    * [[graft.GraftSession]] already lifts them to 64M items / 2^30 bits
    * — or accept the weaker prune deliberately). */
  def sizedArgs(spark: SparkSession, estItems: Long): (Long, Long) = {
    def ceil(key: String, dflt: Long): Long =
      spark.conf.getOption(key).map(_.toLong).getOrElse(dflt)
    val items = math.min(math.max(estItems, 1L),
      ceil("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L))
    val bits = math.min(bitsPerKey * items,
      ceil("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 67108864L))
    (items, bits)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      aggDescription._1, aggDescription._2, aggDescription._3)
    spark.sessionState.functionRegistry.registerFunction(
      containsDescription._1, containsDescription._2, containsDescription._3)
  }
}
