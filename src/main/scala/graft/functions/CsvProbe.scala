package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shape probe for promotional CSV inference
  * (reference io/column_parsers.clj promotion chain — the probe decides
  * which of the chain's parsers could accept a value before the real
  * parser runs).
  *
  * [[graft.sources.Io.inferPromotional]]'s probe pass originally gated
  * each candidate parse behind an `rlike` SUPERSET regex — correct, but
  * 4+ Java-regex executions per value meant ~150M regex matches on a
  * 2.77M × 12 table and a probe pass 15× slower than the scan under it.
  * This kernel computes ALL the gate verdicts in ONE byte scan per value
  * (no regex, no allocation, inlined into whole-stage codegen) and
  * returns them as a bitmask; the authoritative parsers — Spark's
  * `try_cast` and the `parseLocalDateFlex` ladder — still run behind the
  * gates, so inference semantics are bit-identical to the rlike form:
  * each bit accepts exactly the same language as the regex it replaces
  * (LONG/DOUBLE/TS/BOOL) or a strict superset of the values its parser
  * can accept (DATE), which leaves every gated parse count unchanged.
  *
  * Bits: 1 = LONG `[+-]?\d{1,19}`; 2 = DOUBLE
  * `[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?[dDfF]?` or `[+-]?(Infinity|NaN)`;
  * 4 = TIMESTAMP `[+-]?\d{1,6}[-T:. ].+` or `[+-]?\d{4}`; 8 = DATE-ladder
  * gate (3 `[/,. -]`-separated tokens, each all-digits ≤4 or all-alpha
  * =3, ≥2 digit tokens; or one 8-digit token — a superset of all 7
  * ladder shapes); 16 = BOOL (exact "true"/"false"). Numeric/ts shapes
  * test the space-trimmed value (Spark `trim` = 0x20 only, matching the
  * old `trim(c).rlike(...)` gates); the date gate tests the raw value
  * (space is a date separator — the ladder's normalization makes a
  * leading/trailing space fatal, and the gate reproduces that). */
object CsvProbe {

  final val LONG = 1
  final val DOUBLE = 2
  final val TS = 4
  final val DATE = 8
  final val BOOL = 16
  /** case-insensitive exact "na" — the reference's default NA-as-missing
    * token (column_parsers.clj missing-value?) */
  final val NA = 32

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isSep(b: Byte): Boolean =
    b == '/' || b == ',' || b == '-' || b == '.' || b == ' '

  /** One scan, all gate bits. Shared by interpreted eval and codegen. */
  def shapeMask(s: UTF8String): Int = {
    val n = s.numBytes()
    var mask = 0

    // NA: case-insensitive exact "na" on the raw value (the separate
    // lower(c) === 'na' gate in Io uses the same definition)
    if (n == 2) {
      val b0 = s.getByte(0); val b1 = s.getByte(1)
      if ((b0 == 'n' || b0 == 'N') && (b1 == 'a' || b1 == 'A')) mask |= NA
    }

    // BOOL: exact match on the raw value (the old gate was c.isin(...))
    if (n == 4 && s.getByte(0) == 't' && s.getByte(1) == 'r' &&
        s.getByte(2) == 'u' && s.getByte(3) == 'e') mask |= BOOL
    else if (n == 5 && s.getByte(0) == 'f' && s.getByte(1) == 'a' &&
        s.getByte(2) == 'l' && s.getByte(3) == 's' && s.getByte(4) == 'e')
      mask |= BOOL

    // ---- date-ladder gate: raw bytes, tokenized on [/,. -] runs -------
    if (n > 0 && !isSep(s.getByte(0)) && !isSep(s.getByte(n - 1))) {
      var i = 0
      var tokens = 0
      var digitTokens = 0
      var ok = true
      var singleTokenLen = -1
      while (ok && i < n) {
        // token start
        var len = 0
        var allDig = true
        var allAlp = true
        while (i < n && !isSep(s.getByte(i))) {
          val b = s.getByte(i)
          if (!isDigit(b)) allDig = false
          if (!isAlpha(b)) allAlp = false
          len += 1; i += 1
        }
        tokens += 1
        if (tokens == 1) singleTokenLen = if (allDig) len else -1
        if (allDig && len >= 1 && len <= 4) digitTokens += 1
        else if (!(allAlp && len == 3)) ok = false
        while (i < n && isSep(s.getByte(i))) i += 1
      }
      if (ok && tokens == 3 && digitTokens >= 2) mask |= DATE
      else if (tokens == 1 && singleTokenLen == 8) mask |= DATE
    }

    // ---- numeric / timestamp shapes: space-trimmed bytes --------------
    var lo = 0
    var hi = n
    while (lo < hi && s.getByte(lo) == ' ') lo += 1
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    if (lo >= hi) return mask
    val signed = s.getByte(lo) == '+' || s.getByte(lo) == '-'
    val b0 = if (signed) lo + 1 else lo

    // LONG: 1-19 digits, nothing else
    var i = b0
    while (i < hi && isDigit(s.getByte(i))) i += 1
    val intDigits = i - b0
    if (i == hi && intDigits >= 1 && intDigits <= 19) mask |= LONG

    // TS: \d{1,6} then one of [-T:. ] then anything non-empty; or \d{4}
    if (intDigits == 4 && b0 + 4 == hi) mask |= TS
    else if (intDigits >= 1 && intDigits <= 6 && i < hi) {
      val b = s.getByte(i)
      if ((b == '-' || b == 'T' || b == ':' || b == '.' || b == ' ') &&
          i + 1 < hi) mask |= TS
    }

    // DOUBLE: digits[.digits] | .digits, optional exponent, optional dDfF
    var j = b0
    var okD = false
    while (j < hi && isDigit(s.getByte(j))) j += 1
    if (j > b0) { // \d+\.?\d*
      okD = true
      if (j < hi && s.getByte(j) == '.') {
        j += 1
        while (j < hi && isDigit(s.getByte(j))) j += 1
      }
    } else if (j < hi && s.getByte(j) == '.') { // \.\d+
      j += 1
      val fs = j
      while (j < hi && isDigit(s.getByte(j))) j += 1
      okD = j > fs
    }
    if (okD && j < hi && (s.getByte(j) == 'e' || s.getByte(j) == 'E')) {
      var k = j + 1
      if (k < hi && (s.getByte(k) == '+' || s.getByte(k) == '-')) k += 1
      val es = k
      while (k < hi && isDigit(s.getByte(k))) k += 1
      if (k > es) j = k else okD = false
    }
    if (okD && j < hi) {
      val b = s.getByte(j)
      if (b == 'd' || b == 'D' || b == 'f' || b == 'F') j += 1
    }
    if (okD && j == hi) mask |= DOUBLE
    else {
      // [+-]?(Infinity|NaN)
      val len = hi - b0
      if (len == 8 && matchesAscii(s, b0, "Infinity")) mask |= DOUBLE
      else if (len == 3 && matchesAscii(s, b0, "NaN")) mask |= DOUBLE
    }
    mask
  }

  // ---------------------------------------------------------------------
  // Fused flexible date parse — the codegen kernel behind
  // [[graft.sources.Io.parseLocalDateFlex]]. Replaces the 7-pattern
  // regexp_replace + rlike + try_to_date ladder (1 regex rewrite + up to
  // 7 regex matches + a java.time formatter parse per value) with ONE
  // byte scan and integer arithmetic; semantics are pinned bit-identical
  // to the ladder by IoSpec's fuzz-equivalence test. The ladder's exact
  // behavior (measured against Spark's try_to_date, strict resolver):
  //  - separators [/,. -] in runs; a LEADING or TRAILING separator is
  //    fatal (the ladder's normalization leaves a space the anchored
  //    patterns reject);
  //  - 'yyyy' needs exactly 4 digits (java.time appendValue(minWidth=4);
  //    the \d{1,4} gates pass shorter years but the parse then fails),
  //  - 'yy' needs exactly 2 and maps to 2000-2099 (reduced-value base
  //    2000), 'M'/'d' take 1-2 digits,
  //  - month names are 3-letter English, CASE-INSENSITIVE (Spark builds
  //    its formatters with parseCaseInsensitive),
  //  - validation is strict proleptic-Gregorian (Feb 29 1900 → null,
  //    year 0000 valid).
  // Pattern order (disjoint gates, so an if-chain is the coalesce):
  //   "yyyy M d" | "yyyyMMdd" | "M d yyyy" | "d MMM yyyy" | "M d yy" |
  //   "MMM d yyyy" | "MMM d yy"
  // ---------------------------------------------------------------------

  /** Epoch days, or Int.MinValue for no-parse. */
  def flexDateDays(s: UTF8String): Int = {
    val n = s.numBytes()
    if (n == 0) return Int.MinValue
    if (isSep(s.getByte(0)) || isSep(s.getByte(n - 1))) return Int.MinValue
    // tokenize into ≤3 tokens: start, len, allDigit, allAlpha
    val st = new Array[Int](3)
    val ln = new Array[Int](3)
    val dig = new Array[Boolean](3)
    val alp = new Array[Boolean](3)
    var i = 0
    var t = 0
    while (i < n) {
      if (t == 3) return Int.MinValue
      st(t) = i
      var allDig = true
      var allAlp = true
      while (i < n && !isSep(s.getByte(i))) {
        val b = s.getByte(i)
        if (!isDigit(b)) allDig = false
        if (!isAlpha(b)) allAlp = false
        i += 1
      }
      ln(t) = i - st(t); dig(t) = allDig; alp(t) = allAlp
      t += 1
      while (i < n && isSep(s.getByte(i))) i += 1
    }
    def v(k: Int): Int = { // digit token value (len ≤ 4 by the gates)
      var x = 0; var j = st(k)
      val end = st(k) + ln(k)
      while (j < end) { x = x * 10 + (s.getByte(j) - '0'); j += 1 }
      x
    }
    def mon(k: Int): Int = { // case-insensitive 3-letter month, or -1
      val a = (s.getByte(st(k)) | 0x20).toChar
      val b = (s.getByte(st(k) + 1) | 0x20).toChar
      val c = (s.getByte(st(k) + 2) | 0x20).toChar
      (a: @annotation.switch) match {
        case 'j' => if (b == 'a' && c == 'n') 1
          else if (b == 'u' && c == 'n') 6
          else if (b == 'u' && c == 'l') 7 else -1
        case 'f' => if (b == 'e' && c == 'b') 2 else -1
        case 'm' => if (b == 'a' && c == 'r') 3
          else if (b == 'a' && c == 'y') 5 else -1
        case 'a' => if (b == 'p' && c == 'r') 4
          else if (b == 'u' && c == 'g') 8 else -1
        case 's' => if (b == 'e' && c == 'p') 9 else -1
        case 'o' => if (b == 'c' && c == 't') 10 else -1
        case 'n' => if (b == 'o' && c == 'v') 11 else -1
        case 'd' => if (b == 'e' && c == 'c') 12 else -1
        case _ => -1
      }
    }
    if (t == 1) {
      if (dig(0) && ln(0) == 8) {
        var x = 0; var j = st(0)
        while (j < st(0) + 8) { x = x * 10 + (s.getByte(j) - '0'); j += 1 }
        ymdDays(x / 10000, x / 100 % 100, x % 100)
      } else Int.MinValue
    } else if (t == 3) {
      val d0 = dig(0) && ln(0) <= 2
      val d1 = dig(1) && ln(1) <= 2
      val d2s = dig(2) && ln(2) == 2 // 'yy'
      val d2l = dig(2) && ln(2) == 4 // 'yyyy'
      if (dig(0) && ln(0) == 4 && d1 && dig(2) && ln(2) <= 2)
        ymdDays(v(0), v(1), v(2)) // yyyy M d
      else if (d0 && d1 && d2l) ymdDays(v(2), v(0), v(1)) // M d yyyy
      else if (d0 && alp(1) && ln(1) == 3 && mon(1) > 0 && d2l)
        ymdDays(v(2), mon(1), v(0)) // d MMM yyyy
      else if (d0 && d1 && d2s) ymdDays(2000 + v(2), v(0), v(1)) // M d yy
      else if (alp(0) && ln(0) == 3 && mon(0) > 0 && d1 && d2l)
        ymdDays(v(2), mon(0), v(1)) // MMM d yyyy
      else if (alp(0) && ln(0) == 3 && mon(0) > 0 && d1 && d2s)
        ymdDays(2000 + v(2), mon(0), v(1)) // MMM d yy
      else Int.MinValue
    } else Int.MinValue
  }

  /** Strict proleptic-Gregorian validation + epoch days. */
  private def ymdDays(y: Int, m: Int, d: Int): Int = {
    if (m < 1 || m > 12 || d < 1) return Int.MinValue
    val leap = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
    val dim = (m: @annotation.switch) match {
      case 2 => if (leap) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    if (d > dim) return Int.MinValue
    java.time.LocalDate.of(y, m, d).toEpochDay.toInt
  }

  /** DateType expression over [[flexDateDays]] — inlines into
    * whole-stage codegen; null when no pattern parses. */
  case class FlexLocalDate(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DateType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_flex_date needs a string argument, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any = {
      val d = flexDateDays(input.asInstanceOf[UTF8String])
      if (d == Int.MinValue) null else d
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val d = ctx.freshName("days")
        s"""
        int $d = graft.functions.CsvProbe.flexDateDays($c);
        if ($d == Integer.MIN_VALUE) { ${ev.isNull} = true; }
        else { ${ev.value} = $d; }
        """
      })
    override protected def withNewChildInternal(c: Expression): FlexLocalDate =
      copy(child = c)
    override def prettyName: String = "graft_flex_date"
  }

  private def matchesAscii(s: UTF8String, off: Int, lit: String): Boolean = {
    var i = 0
    while (i < lit.length) {
      if (s.getByte(off + i) != lit.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  case class CsvShapeMask(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_csv_shape needs a string argument, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      shapeMask(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.CsvProbe.shapeMask($c)")
    override protected def withNewChildInternal(c: Expression): CsvShapeMask =
      copy(child = c)
    override def prettyName: String = "graft_csv_shape"
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_csv_shape", es => CsvShapeMask(es.head), "scala_udf")
}
