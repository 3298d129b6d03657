package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused floor-scaled vector dot product — the hot kernel of the exact
  * cosine family (Similarity.dotExact / normExact and everything built on
  * them: brute-force top-k, kNN classify, hard negatives, SemDeDup, MMR,
  * IVF/PQ rerank).
  *
  * Semantics are BIT-IDENTICAL to the Catalyst composition it replaces
  * (`aggregate(zip_with(a, b, (x,y) => floor(x·y·1e12) cast long), 0L, +)
  * cast double / 1e12`), clause by clause:
  *   - per element: doubles multiplied, scaled by 1e12, `Math.floor`, then
  *     a Java `(long)` cast (Spark's non-ANSI double→long: NaN→0, ±Inf
  *     clamps) — same left-to-right LONG accumulation with wrap-around;
  *   - any NULL element → NULL result (zip_with's null propagates through
  *     the fold); length mismatch → NULL (zip_with pads the short side
  *     with nulls); both arrays empty → 0.0;
  *   - final value: long sum cast to double, divided by 1e12.
  *
  * Why a kernel at all: the composed form allocates an intermediate array
  * per PAIR (zip_with) and walks it a second time (aggregate), and at
  * brute-force-scoring scale the pair count is |Q|·|C| — the allocation is
  * the cost, not the multiplies. The kernel is one allocation-free loop
  * that whole-stage codegen inlines per pair. Numeric results are
  * unchanged, so every oracle hash that consumed the composed form stays
  * green (the DuckDB mirrors replay the same floor-scaled arithmetic).
  */
object VecKernels {

  private final val S = 1e12

  /** Element accessor codes — resolved once at plan time, not per row. */
  final val EF = 0; final val ED = 1; final val EI = 2; final val EL = 3

  private def elemCode(dt: DataType): Int = dt match {
    case FloatType => EF
    case DoubleType => ED
    case IntegerType => EI
    case LongType => EL
    case other => throw new IllegalArgumentException(s"unsupported element $other")
  }

  @inline private def elem(a: ArrayData, i: Int, code: Int): Double =
    code match {
      case EF => a.getFloat(i).toDouble
      case ED => a.getDouble(i)
      case EI => a.getInt(i).toDouble
      case _ => a.getLong(i).toDouble
    }

  /** Shared by interpreted eval and generated code. Null ⇒ the composed
    * form would have produced SQL NULL. */
  def dotScaled(a: ArrayData, b: ArrayData, ca: Int, cb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += Math.floor(elem(a, i, ca) * elem(b, i, cb) * S).toLong
      i += 1
    }
    java.lang.Double.valueOf(acc.toDouble / S)
  }

  /** `graft_dot_scaled(a, b)` — see object doc. Accepts float/double/int/
    * long element types (the composed form cast every element to double;
    * so does this). */
  case class DotScaled(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    private def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_dot_scaled needs two numeric arrays, got (${left.dataType}, ${right.dataType})")

    private lazy val ca = elemCode(left.dataType.asInstanceOf[ArrayType].elementType)
    private lazy val cb = elemCode(right.dataType.asInstanceOf[ArrayType].elementType)

    override protected def nullSafeEval(a: Any, b: Any): Any =
      dotScaled(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ca, cb)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("dotr")
        s"""
           |java.lang.Double $r = graft.functions.VecKernels.dotScaled($a, $b, $ca, $cb);
           |${ev.isNull} = ($r == null);
           |${ev.value} = ${ev.isNull} ? 0.0 : $r.doubleValue();
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotScaled = copy(left = l, right = r)
    override def prettyName: String = "graft_dot_scaled"
  }

  /** Full-window DTW distance with L1 cost, shared by interpreted eval and
    * codegen. The DP is a fixed left-to-right/top-to-bottom fold of
    * abs/min/+ over doubles — every cell is an IEEE-exact op sequence, so
    * an engine replaying the same recurrence cell by cell (the q369 oracle
    * does, as lateral column aliases) reproduces the distance BIT-exactly;
    * no floor scaling needed anywhere. O(n·m) per row: callers bound the
    * series (the hour-of-day profile is 24 points). Null element or empty
    * array ⇒ NULL. */
  def dtw(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 || m == 0) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    var j = 0
    while (j < m) { if (b.isNullAt(j)) return null; j += 1 }
    val prev = new Array[Double](m)
    val curr = new Array[Double](m)
    prev(0) = Math.abs(a.getDouble(0) - b.getDouble(0))
    j = 1
    while (j < m) {
      prev(j) = prev(j - 1) + Math.abs(a.getDouble(0) - b.getDouble(j))
      j += 1
    }
    i = 1
    while (i < n) {
      val ai = a.getDouble(i)
      curr(0) = prev(0) + Math.abs(ai - b.getDouble(0))
      j = 1
      while (j < m) {
        curr(j) = Math.abs(ai - b.getDouble(j)) +
          Math.min(prev(j), Math.min(prev(j - 1), curr(j - 1)))
        j += 1
      }
      System.arraycopy(curr, 0, prev, 0, m)
      i += 1
    }
    java.lang.Double.valueOf(prev(m - 1))
  }

  /** `graft_dtw(a, b)` — see [[dtw]]. Double arrays only (profile builders
    * emit doubles; float callers cast upstream). */
  case class DtwDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    private def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_dtw needs two double arrays, got (${left.dataType}, ${right.dataType})")
    override protected def nullSafeEval(a: Any, b: Any): Any =
      dtw(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("dtwr")
        s"""
           |java.lang.Double $r = graft.functions.VecKernels.dtw($a, $b);
           |${ev.isNull} = ($r == null);
           |${ev.value} = ${ev.isNull} ? 0.0 : $r.doubleValue();
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DtwDistance = copy(left = l, right = r)
    override def prettyName: String = "graft_dtw"
  }

  /** Register `graft_dot_scaled(a, b)` and `graft_dtw(a, b)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_scaled", es => DotScaled(es(0), es(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dtw", es => DtwDistance(es(0), es(1)), "scala_udf")
  }
}
