package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd kernels for the int8 scalar-quantized (SQ8) scoring path —
  * the hot inner loop of t48/t49/`AnnIndex`: score a float query against
  * an int8-coded corpus vector WITHOUT materializing the dequantized
  * array. The HOF form is
  * `aggregate(zip_with(q, transform(ramp, i -> mns[i] + codes[i]/255.0 *
  * spans[i]), (x,y) -> double(x)*double(y)), 0.0, +)` — two intermediate
  * arrays and interpreted lambdas per element, per CANDIDATE PAIR. These
  * expressions are one tight loop each, inlined into whole-stage
  * codegen, with strict left-to-right double accumulation and the exact
  * dequantization arithmetic of the HOF form — bit-identical by
  * construction (fuzz-pinned in `Sq8KernelSpec`), so plans using them
  * still hash-match the DuckDB oracle's HOF rendering.
  *
  * Mismatched lengths yield NULL (as zip_with's null padding would),
  * and so does any NULL array element — matching the HOF forms, where
  * a null element nulls the fold.
  */
case class Sq8Dot(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  private def isFloatArr(t: DataType) = t match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private def isLongArr(t: DataType) = t match {
    case ArrayType(LongType, _) => true; case _ => false
  }
  private def isDoubleArr(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true; case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (!isFloatArr(first.dataType) && !isDoubleArr(first.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_dot: query is ${first.dataType.sql}, need ARRAY<FLOAT> or ARRAY<DOUBLE>")
    else if (!isLongArr(second.dataType))
      TypeCheckResult.TypeCheckFailure(s"graft_sq8_dot: codes is ${second.dataType.sql}, need ARRAY<BIGINT>")
    else if (!isDoubleArr(third.dataType) || !isDoubleArr(fourth.dataType))
      TypeCheckResult.TypeCheckFailure("graft_sq8_dot: mns/spans must be ARRAY<DOUBLE>")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq8_dot"

  override protected def nullSafeEval(q: Any, c: Any, m: Any, s: Any): Any =
    Sq8.dot(q.asInstanceOf[ArrayData], isDoubleArr(first.dataType),
      c.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, m, s) => {
      s"""
         |java.lang.Double ${ev.value}_boxed = graft.functions.Sq8.dot(
         |  $q, ${isDoubleArr(first.dataType)}, $c, $m, $s);
         |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Sq8Dot =
    copy(first = f, second = s, third = t, fourth = q)
}

case class Sq8Norm2(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(LongType, _) => (second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("graft_sq8_norm2: mns/spans must be ARRAY<DOUBLE>")
    }
    case t => TypeCheckResult.TypeCheckFailure(s"graft_sq8_norm2: codes is ${t.sql}, need ARRAY<BIGINT>")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq8_norm2"

  override protected def nullSafeEval(c: Any, m: Any, s: Any): Any =
    Sq8.norm2(c.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, m, s) => {
      s"""
         |java.lang.Double ${ev.value}_boxed = graft.functions.Sq8.norm2($c, $m, $s);
         |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8Norm2 =
    copy(first = f, second = s, third = t)
}

object Sq8 {
  /** Dequantize-and-dot in one pass. The per-element arithmetic is the
    * HOF form's, verbatim: dq_i = mns[i] + codes[i]/255.0 * spans[i]
    * (no zero-span branch — codes are 0 there, so dq_i = mns[i] falls
    * out of the same expression), acc += double(q_i) * dq_i, strictly
    * left to right. The query side may be float or double (compile-time
    * -constant flag from the generated code — `double(q_i)` is exact
    * either way, so the fold stays bit-identical to the HOF form). */
  def dot(q: ArrayData, qDouble: Boolean, codes: ArrayData,
      mns: ArrayData, spans: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    if (n != q.numElements() || n != mns.numElements() || n != spans.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || codes.isNullAt(i) || mns.isNullAt(i) || spans.isNullAt(i)) return null
      val dq = mns.getDouble(i) + codes.getLong(i).toDouble / 255.0 * spans.getDouble(i)
      val x = if (qDouble) q.getDouble(i) else q.getFloat(i).toDouble
      acc += x * dq
      i += 1
    }
    acc
  }

  /** Σ dq_i² with the same dequantization and fold order. */
  def norm2(codes: ArrayData, mns: ArrayData, spans: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    if (n != mns.numElements() || n != spans.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || mns.isNullAt(i) || spans.isNullAt(i)) return null
      val dq = mns.getDouble(i) + codes.getLong(i).toDouble / 255.0 * spans.getDouble(i)
      acc += dq * dq
      i += 1
    }
    acc
  }

  val dotDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sq8_dot"),
    new ExpressionInfo(classOf[Sq8Dot].getName, "graft_sq8_dot"),
    (children: Seq[Expression]) => Sq8Dot(children(0), children(1), children(2), children(3)))

  val norm2Description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sq8_norm2"),
    new ExpressionInfo(classOf[Sq8Norm2].getName, "graft_sq8_norm2"),
    (children: Seq[Expression]) => Sq8Norm2(children(0), children(1), children(2)))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotDescription._1, dotDescription._2, dotDescription._3)
    spark.sessionState.functionRegistry.registerFunction(
      norm2Description._1, norm2Description._2, norm2Description._3)
  }
}
