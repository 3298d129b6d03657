package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.llm.Similarity

/** Pins the fused dot kernel (functions/VecKernels.scala) bit-exactly to
  * the Catalyst composition it replaced — the contract that keeps every
  * cosine-family oracle hash green. */
class VecKernelsSpec extends SparkSuite {
  init()

  /** The pre-kernel composed form, verbatim. */
  private def composedDot(a: org.apache.spark.sql.Column,
                          b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast(DoubleType) * y.cast(DoubleType) * lit(1e12)).cast(LongType)),
      lit(0L), (acc, v) => acc + v).cast(DoubleType) / lit(1e12)

  test("Similarity entry points self-register the kernel (library use, " +
       "no Tables.ensureFunctions)") {
    import spark.implicits._
    // simulate an isolated caller: the temp function is absent
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_scaled"))
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = graft.llm.Similarity.bruteForceTopK(vecs, vecs, 1).collect()
    assert(r.nonEmpty, "self-registration failed — UNRESOLVED_ROUTINE")
  }

  test("kernel == composed zip_with/aggregate form, including edge cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val regular = (1 to 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = regular.toDF("a", "b")
    val both = df.select(
      Similarity.dotExact(col("a"), col("b")).as("k"),
      composedDot(col("a"), col("b")).as("c"))
    val rows = both.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      // bit-exact, not approximate
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("kernel edge semantics: null element, length mismatch, empty, NaN, Inf") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val rows = Seq(
      org.apache.spark.sql.Row(Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      org.apache.spark.sql.Row(Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      org.apache.spark.sql.Row(Array.empty[java.lang.Float], Array.empty[java.lang.Float]),
      org.apache.spark.sql.Row(Array[java.lang.Float](Float.NaN, 2.0f), Array[java.lang.Float](1.0f, 2.0f)),
      org.apache.spark.sql.Row(Array[java.lang.Float](Float.PositiveInfinity), Array[java.lang.Float](1.0f)),
      org.apache.spark.sql.Row(null, Array[java.lang.Float](1.0f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(
          Option(r.get(0)).map(_.asInstanceOf[Array[java.lang.Float]].toSeq).orNull,
          Option(r.get(1)).map(_.asInstanceOf[Array[java.lang.Float]].toSeq).orNull))),
      schema)
    val out = df.select(
      Similarity.dotExact(col("a"), col("b")).as("k"),
      composedDot(col("a"), col("b")).as("c")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"value mismatch: $r")
    }
    // pin the expectations themselves, not just agreement
    assert(out(0).isNullAt(0))           // null element
    assert(out(1).isNullAt(0))           // length mismatch
    assert(out(2).getDouble(0) == 0.0)   // empty arrays
    assert(!out(3).isNullAt(0))          // NaN product floors to NaN, casts to 0
    assert(out(5).isNullAt(0))           // null array
  }

  test("double-element arrays take the same path") {
    import spark.implicits._
    val df = Seq((Array(0.5, -0.25, 3.75), Array(1.0, 2.0, -0.5))).toDF("a", "b")
    val r = df.select(
      Similarity.dotExact(col("a"), col("b")).as("k"),
      composedDot(col("a"), col("b")).as("c")).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("norm is the self-dot") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("a")
    val r = df.select(Similarity.normExact(col("a"))).head().getDouble(0)
    assert(math.abs(r - 5.0) < 1e-9)
  }
}
