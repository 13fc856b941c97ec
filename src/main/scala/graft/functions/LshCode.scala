package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd random-hyperplane LSH sign code — the native form of
  * [[TextSim.lshCode]]'s `lshPlanes` independent projection folds. The
  * HOF rendering walks the embedding once PER PLANE (one interpreted
  * `aggregate(transform(...))` pass per plane per row); this kernel
  * computes all planes in ONE loop over the array, accumulating each plane's
  * dot product in strict left-to-right element order with the identical
  * per-element arithmetic (element ::DOUBLE × LCG-integer weight
  * ::DOUBLE), so plans using it still hash-match the DuckDB oracle's
  * HOF rendering (KernelProps pins bit-equality, t39/t51/t54 pin it
  * end-to-end through the oracle compare).
  *
  * Null/edge parity with the HOF form: a NULL element nulls every
  * plane's fold, and `CASE WHEN NULL >= 0` takes the ELSE — code 0; an
  * empty array folds to 0.0 per plane and 0.0 >= 0 sets every bit
  * (both pinned by KernelProps).
  *
  * PRECONDITION — finite elements: on a NaN projection (an Inf or NaN
  * embedding element) Java's `proj >= 0` is false, while Spark SQL and
  * DuckDB both ORDER NaN above all doubles, so their `CASE WHEN proj >=
  * 0` sets the bit — the one input class where kernel and HOF twin
  * diverge. Embeddings are finite by construction everywhere this
  * engine produces them (parquet floats through arithmetic that cannot
  * overflow); feed the kernel external vectors only after a
  * finiteness check. */
case class LshCode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_code requires ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_lsh_code"

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any): Any =
    LshCode.code(a.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshCode.code($a, $isDouble);")

  override protected def withNewChildInternal(newChild: Expression): LshCode =
    copy(child = newChild)
}

object LshCode {
  /** Plane weights precomputed for dims < [[maxTableDim]] (the 20 ×
    * 1024 table is 160 KB, built once per JVM): weight for (plane j,
    * 0-based dim i) replays [[TextSim]]'s LCG exactly —
    * ((1103515245·(j·64 + i) + 12345) mod 2001) − 1000. The inner loop
    * previously paid that multiply+mod per element per plane; with 20
    * planes the weight arithmetic had grown to half the kernel. Layout
    * is [i][j] so one element's 20 plane weights are contiguous. */
  private val maxTableDim = 1024
  private def weightOf(j: Int, i: Int): Double =
    (((1103515245L * (j * 64 + i) + 12345L) % 2001L) - 1000L).toDouble
  private val weights: Array[Array[Double]] =
    Array.tabulate(maxTableDim)(i => Array.tabulate(TextSim.lshPlanes)(j => weightOf(j, i)))

  /** Static kernel — called from generated code. One pass over the
    * array; `projs` holds the running per-plane sums. */
  def code(a: ArrayData, aDouble: Boolean): Long = {
    val planes = TextSim.lshPlanes
    val n = a.numElements()
    val projs = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        // A null element nulls every plane's fold; every CASE WHEN takes
        // the ELSE branch — the HOF form's total is 0.
        return 0L
      }
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      if (i < maxTableDim) {
        val w = weights(i)
        var j = 0
        while (j < planes) { projs(j) += x * w(j); j += 1 }
      } else {
        // Dims past the table replay the LCG inline — same values.
        var j = 0
        while (j < planes) { projs(j) += x * weightOf(j, i); j += 1 }
      }
      i += 1
    }
    var codeAcc = 0L
    var j = 0
    while (j < planes) {
      if (projs(j) >= 0) codeAcc += (1L << j)
      j += 1
    }
    codeAcc
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lsh_code"),
    new ExpressionInfo(classOf[LshCode].getName, "graft_lsh_code"),
    (children: Seq[Expression]) => LshCode(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}
