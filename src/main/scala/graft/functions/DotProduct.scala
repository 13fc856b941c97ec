package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two vector columns in DOUBLE precision —
  * the native-Expression form of the TextSim fold
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)`.
  *
  * Strict left-to-right double accumulation, so it is bit-identical to the
  * HOF form and to the DuckDB oracle's `list_reduce` — but one tight loop
  * over the unsafe array data instead of materializing an intermediate
  * product array and dispatching interpreted lambdas per element. This is
  * the hot kernel of the similarity-search queries (64-dim embeddings ×
  * corpus size candidate pairs).
  *
  * Each side may be ARRAY<FLOAT> or ARRAY<DOUBLE> independently (same
  * contract as [[Dist2]]): embeddings parquet in the wild carries either
  * element width, and `double(x)` in the HOF form is exact for both, so
  * the kernel stays bit-identical whichever arrives. Mismatched lengths
  * yield NULL (as zip_with's null padding would).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isDouble(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isVec(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot: left side is ${left.dataType.sql}, need ARRAY<FLOAT> or ARRAY<DOUBLE>")
    else if (!isVec(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot: right side is ${right.dataType.sql}, need ARRAY<FLOAT> or ARRAY<DOUBLE>")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], isDouble(left.dataType),
      b.asInstanceOf[ArrayData], isDouble(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_boxed = graft.functions.DotProduct.dot(
         |  $a, ${isDouble(left.dataType)}, $b, ${isDouble(right.dataType)});
         |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static kernel — called from generated code with compile-time-constant
    * element-width flags (JIT specializes the branch away). Returns null
    * (boxed) on length mismatch (mirroring zip_with padding semantics) and
    * on any NULL array element (mirroring the HOF fold, which nulls out). */
  def dot(a: ArrayData, aDouble: Boolean, b: ArrayData, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  /** (identifier, info, builder) — shared by imperative registration and
    * the SparkSessionExtensions path. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}
