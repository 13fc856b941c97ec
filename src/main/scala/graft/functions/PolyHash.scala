package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial string hash — the native-Expression form of the
  * TextSim word hash (fold of h*31+codePoint mod 1e9+7, init 7).
  *
  * The pure-SQL form is a nested HOF chain
  * (`aggregate(transform(sequence(...), i -> ascii(substring(w,i,1))), …)`)
  * that allocates an index array + per-char UTF8String slices per word and
  * evaluates lambdas interpretively. This expression is one tight loop over
  * the string's code points, inlined into whole-stage codegen — the
  * "custom Catalyst Expression beats UDF beats HOF chain" preference for
  * hot scan-side kernels (builder brief; SURVEY.md §7.2 step 7).
  *
  * Bit-identical to the HOF form (and to the DuckDB oracle's
  * `list_reduce(unicode(...))` form) on any string, all Unicode planes.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_poly_hash requires a STRING argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P = 1000000007L

  /** Static kernel — called from generated code; one pass, no allocation. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 7L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** (identifier, info, builder) — shared by imperative registration and
    * the SparkSessionExtensions path. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_poly_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
    (children: Seq[Expression]) => PolyHash(children.head))

  /** Idempotently register `graft_poly_hash` on a session so SQL text can
    * use it (done per-query too, so any externally-built session works). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}
