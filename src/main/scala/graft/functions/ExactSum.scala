package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact 128-bit integer SUM as a [[DeclarativeAggregate]].
  *
  * The engine's determinism contract routes every float aggregate through
  * exact integer/decimal sums (Reductions.dsum/isum) — previously
  * `Sum(Decimal(30,_))`, whose per-row adds run on heap BigDecimals once
  * precision exceeds the compact-long range, the single hottest cost in the
  * correlation/stats queries. This aggregate keeps the identical exact
  * semantics (wide integer accumulation of long addends, null-skipping,
  * all-null → NULL, final value surfaced as a Decimal so the decimal→double
  * rounding matches any engine) but the accumulator is two primitive LONG
  * buffer slots with carry arithmetic expressed as Catalyst bitwise
  * expressions — the whole update stays inside whole-stage codegen with zero
  * allocation per row.
  *
  * Carry logic (standard two-word add): for unsigned lo addition
  * `newLo = lo + v`, `carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63`; the
  * high word adds the addend's sign extension (`v >> 63`) so the pair is a
  * true 128-bit two's-complement accumulator. Adds use LEGACY eval mode
  * explicitly: wrap-around on the low word is the mechanism, not an error,
  * and must not trip ANSI overflow checks.
  *
  * Capacity: |addend| < 2^63 and ~2^63 rows before 128-bit overflow —
  * unreachable for any real dataset (at 10^13-scale addends that is ~10^25
  * rows). */
object ExactSum {

  private def addL(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** carry-out of unsigned a + b where s = a + b (wrapped). */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  case class Int128Sum(child: Expression, scale: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {
    require(scale >= 0 && scale <= 18, s"int128_sum scale out of range: $scale")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"int128_sum needs a bigint addend, got $other")
      }

    private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
    private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
    private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

    override lazy val aggBufferAttributes: Seq[AttributeReference] =
      Seq(hi, lo, seen)

    override lazy val initialValues: Seq[Expression] =
      Seq(Literal(0L), Literal(0L), Literal(false))

    override lazy val updateExpressions: Seq[Expression] = {
      val v = Coalesce(Seq(child, Literal(0L)))
      val newLo = addL(lo, v)
      val newHi = addL(addL(hi, ShiftRight(v, Literal(63))), carry(lo, v, newLo))
      Seq(newHi, newLo, Or(seen, IsNotNull(child)))
    }

    override lazy val mergeExpressions: Seq[Expression] = {
      val newLo = addL(lo.left, lo.right)
      val newHi = addL(addL(hi.left, hi.right), carry(lo.left, lo.right, newLo))
      Seq(newHi, newLo, Or(seen.left, seen.right))
    }

    override lazy val evaluateExpression: Expression =
      If(seen, Int128ToDecimal(hi, lo, scale),
        Literal.create(null, DecimalType(38, scale)))

    override def dataType: DataType = DecimalType(38, scale)
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): Int128Sum =
      copy(child = c)
    override def prettyName: String = "graft_sum128"
  }

  /** Java-callable finisher shared by interpreted eval and generated code. */
  def toDecimal(hi: Long, lo: Long, scale: Int): Decimal = {
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(new java.math.BigDecimal(bi, scale), 38, scale)
  }

  /** (hi, lo) two's-complement 128-bit value → Decimal(38, scale) with the
    * unscaled value hi·2^64 + lo. Runs once per GROUP (not per row), so the
    * BigInteger construction here is off the hot path. */
  case class Int128ToDecimal(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {
    override def dataType: DataType = DecimalType(38, scale)
    override def nullable: Boolean = false

    override protected def nullSafeEval(hiV: Any, loV: Any): Any =
      toDecimal(hiV.asInstanceOf[Long], loV.asInstanceOf[Long], scale)

    override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                     ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (h, l) =>
        s"graft.functions.ExactSum.toDecimal($h, $l, $scale)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Int128ToDecimal =
      copy(left = l, right = r)
    override def prettyName: String = "int128_to_decimal"
  }

  /** Register `graft_sum128`:
    *  - `graft_sum128(addend BIGINT, scale)` — sums the longs, result
    *    Decimal(38, scale) with unscaled value = Σ addend;
    *  - `graft_sum128(x DECIMAL(p≤18, s))` — sums the exact decimal values
    *    (addend = unscaled long), result Decimal(38, s). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sum128", { es =>
        val agg = es.head.dataType match {
          case dt: DecimalType if es.length == 1 =>
            require(dt.precision <= 18, "graft_sum128 decimal input must fit " +
              s"a compact long (precision <= 18), got precision ${dt.precision}")
            Int128Sum(UnscaledValue(es.head), dt.scale)
          case _ =>
            val s = es(1) match {
              case Literal(i: Int, IntegerType) => i
              case other => throw new IllegalArgumentException(
                s"graft_sum128 scale must be an int literal, got $other")
            }
            Int128Sum(es.head, s)
        }
        agg.toAggregateExpression()
      }, "scala_udf")
}
