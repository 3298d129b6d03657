package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen kernels for product-quantization encode + ADC scoring (the
  * engine's preference ladder: builtin > custom codegen Expression > UDF).
  *
  * The higher-order-function formulation in `Similarity.pqArgmin` /
  * `pqTopK` is the executable spec — Catalyst's `aggregate`/`zip_with` are
  * CodegenFallback, so the fold over numSub × k codewords × dsub dims runs
  * interpreted per row (measured 4.8 s for q123 at sf0.1; these kernels take
  * the same query to ~1 s). Arithmetic is ORDER-IDENTICAL to the HOF form
  * (ascending subspace, ascending codeword, ascending dim, same IEEE
  * accumulation), so the DuckDB oracle and the HOF spec pin bit-equality.
  * Codebooks ride as a constructor-param reference object — constant-size
  * generated code, no literal explosion, no per-row conversion.
  */
object PqKernels {

  /** codes(m) = argmin_ci Σ_d (emb[m·dsub+d] − books(m)(ci)(d))²; strict `<`
    * scanning ci ascending → ties and all-NaN rows resolve to the lowest
    * index, exactly like the HOF fold's `when(d < acc.d)`. */
  def encode(emb: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val numSub = books.length
    val dsub = books(0)(0).length
    val out = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      val cb = books(m)
      val base = m * dsub
      var best = 0
      var bestD = sqDist(emb, base, cb(0))
      var ci = 1
      while (ci < cb.length) {
        val d = sqDist(emb, base, cb(ci))
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }

  private def sqDist(emb: ArrayData, base: Int, cw: Array[Double]): Double = {
    var acc = 0.0
    var d = 0
    while (d < cw.length) {
      val diff = emb.getDouble(base + d) - cw(d)
      acc += diff * diff
      d += 1
    }
    acc
  }

  /** Reconstructed cosine = Σₘ dot(qₘ, codewordₘ) / (qNorm·√Σₘ‖codewordₘ‖²):
    * inner dot accumulated per subspace then folded ascending — the same
    * two-level left fold as the HOF form; non-positive denominator → -1e308
    * (the HOF `when` guard). */
  def adcCosine(qEmb: ArrayData, codes: ArrayData, qNorm: Double,
                books: Array[Array[Array[Double]]],
                norm2: Array[Array[Double]]): Double = {
    val numSub = books.length
    val dsub = books(0)(0).length
    var dot = 0.0
    var rn2 = 0.0
    var m = 0
    while (m < numSub) {
      val code = codes.getInt(m)
      val cw = books(m)(code)
      var dm = 0.0
      var d = 0
      while (d < dsub) {
        dm += qEmb.getDouble(m * dsub + d) * cw(d)
        d += 1
      }
      dot += dm
      rn2 += norm2(m)(code)
      m += 1
    }
    val den = qNorm * math.sqrt(rn2)
    if (den > 0) dot / den else -1e308
  }

  case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_pq_encode needs array<double>, got $other")
      }
    override protected def nullSafeEval(input: Any): Any =
      encode(input.asInstanceOf[ArrayData], books)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.encode($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
    override def prettyName: String = "graft_pq_encode"
  }

  case class PqAdcCosine(qEmb: Expression, codes: Expression, qNorm: Expression,
                         books: Array[Array[Array[Double]]],
                         norm2: Array[Array[Double]])
    extends TernaryExpression {
    override def first: Expression = qEmb
    override def second: Expression = codes
    override def third: Expression = qNorm
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (qEmb.dataType, codes.dataType, qNorm.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(IntegerType, _), DoubleType) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_pq_adc needs (array<double>, array<int>, double), got $other")
      }
    override protected def nullSafeEval(q: Any, c: Any, n: Any): Any =
      adcCosine(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
        n.asInstanceOf[Double], books, norm2)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val refB = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val refN = ctx.addReferenceObj("pqNorm2", norm2, "double[][]")
      defineCodeGen(ctx, ev, (q, c, n) =>
        s"graft.functions.PqKernels.adcCosine($q, $c, $n, $refB, $refN)")
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): PqAdcCosine =
      copy(qEmb = f, codes = s, qNorm = t)
    override def prettyName: String = "graft_pq_adc"
  }

  /** Register `graft_pq_encode(emb)` / `graft_pq_adc(q_emb, codes, q_norm)`
    * with the given codebooks CAPTURED — callers re-register when the
    * codebooks change (the fit loop does, per iteration). */
  def register(spark: SparkSession, books: Seq[Seq[Array[Double]]]): Unit = {
    val b = books.map(_.map(_.clone).toArray).toArray
    val n2 = b.map(_.map(_.foldLeft(0.0)((a, x) => a + x * x)))
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_pq_encode",
      es => PqEncode(es.head, b), "scala_udf")
    reg.createOrReplaceTempFunction("graft_pq_adc",
      es => PqAdcCosine(es(0), es(1), es(2), b, n2), "scala_udf")
  }
}
