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

  /** Unicode NFC normalization (UAX #15 canonical composition) — composes
    * combining sequences ("e" + U+0301 → "é") so visually-identical strings
    * hash/dedup/join identically, the first step of any real text pipeline.
    * Engine-portable: Java's Normalizer and DuckDB's utf8proc-backed
    * `nfc_normalize` implement the same UAX #15 tables (q124 oracle). */
  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Accent stripping = NFD → drop non-spacing marks (category Mn, by code
    * point so astral-plane marks are handled) → NFC recompose. Matches
    * DuckDB `strip_accents` on the canonical-composition range (é→e, ñ→n,
    * Å→A; standalone letters like ø/ß and non-Latin scripts pass through —
    * cross-checked value-by-value before the oracle was registered). */
  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }

  abstract class StringKernel extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string argument, got ${child.dataType}")
  }

  case class NfcNormalize(child: Expression) extends StringKernel {
    override protected def nullSafeEval(input: Any): Any =
      nfcNormalize(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfcNormalize($c)")
    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
    override def prettyName: String = "graft_nfc"
  }

  case class StripAccents(child: Expression) extends StringKernel {
    override protected def nullSafeEval(input: Any): Any =
      stripAccents(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.stripAccents($c)")
    override protected def withNewChildInternal(c: Expression): StripAccents =
      copy(child = c)
    override def prettyName: String = "graft_strip_accents"
  }

  /** Register `graft_token_count(s)`, `graft_nfc(s)`,
    * `graft_strip_accents(s)` on the session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_token_count", es => TokenCount(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_nfc", es => NfcNormalize(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_strip_accents", es => StripAccents(es.head), "scala_udf")
  }
}
