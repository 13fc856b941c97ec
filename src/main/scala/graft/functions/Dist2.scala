package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd squared Euclidean distance — the native form of the TextSim
  * fold `aggregate(zip_with(a, b, (x,y) -> (double(x)-double(y))²), 0, +)`
  * that drives IVF cell assignment (corpus rows × cells evaluations per
  * scan — the hot loop of t41/t49/`AnnIndex` after SQ8 scoring moved to
  * its own kernel). Strict left-to-right double accumulation with the
  * HOF form's per-element arithmetic, so plans using it still hash-match
  * the DuckDB oracle's HOF rendering. Sides may independently be
  * ARRAY<FLOAT> (raw embeddings) or ARRAY<DOUBLE> (centroid literals /
  * cast training vectors). Mismatched lengths yield NULL, and so does
  * any NULL array element — matching the `aggregate(zip_with(...))`
  * form, where a null element nulls the fold. */
case class Dist2(left: Expression, right: Expression) extends BinaryExpression {
  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dist2 requires ARRAY<FLOAT|DOUBLE> sides, got ${left.dataType.sql}, ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dist2"

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Dist2.dist2(a.asInstanceOf[ArrayData], isDouble(left),
      b.asInstanceOf[ArrayData], isDouble(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_boxed =
         |  graft.functions.Dist2.dist2($a, ${isDouble(left)}, $b, ${isDouble(right)});
         |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Dist2 =
    copy(left = newLeft, right = newRight)
}

object Dist2 {
  /** Static kernel — called from generated code. The element-type flags
    * are compile-time constants in the generated source, so the JIT
    * folds the branches away. */
  def dist2(a: ArrayData, aDouble: Boolean, b: ArrayData, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dist2"),
    new ExpressionInfo(classOf[Dist2].getName, "graft_dist2"),
    (children: Seq[Expression]) => Dist2(children(0), children(1)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}
