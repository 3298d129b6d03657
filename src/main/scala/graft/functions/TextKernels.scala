package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen text kernels (the engine's preference ladder: builtin >
  * custom codegen Expression > UDF — SURVEY §2.7).
  *
  * `TokenCount` counts maximal non-whitespace runs directly over the
  * UTF8String bytes: no regex compilation, no split-array allocation, no
  * String materialization — the generated code is one byte loop inlined into
  * whole-stage codegen. Semantics are exactly `size(split(trim(s), "\\s+"))`
  * with 0 for blank strings (Java regex `\s` = ASCII [ \t\n\x0B\f\r];
  * multibyte UTF-8 lead/continuation bytes are negative and thus non-ws,
  * so runs are counted correctly for any Unicode text).
  */
object TextKernels {

  /** Java-callable kernel shared by interpreted eval and generated code. */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var count = 0
    var inToken = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (!ws && !inToken) { count += 1; inToken = true }
      else if (ws) inToken = false
      i += 1
    }
    count
  }

  case class TokenCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_count needs a string argument, got ${child.dataType}")

    override protected def nullSafeEval(input: Any): Any =
      tokenCount(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextKernels.tokenCount($c)")

    override protected def withNewChildInternal(c: Expression): TokenCount =
      copy(child = c)
    override def prettyName: String = "graft_token_count"
  }

  /** Register `graft_token_count(s)` on the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_count", es => TokenCount(es.head), "scala_udf")
}
