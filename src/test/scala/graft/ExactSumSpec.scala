package graft

import org.apache.spark.sql.functions._

import graft.ops.Reductions

/** Pins the Int128 codegen sum bit-exactly to the Sum(Decimal) forms it
  * replaced — on real table columns (incl. products and negatives), across
  * partition counts, and on null/edge inputs. */
class ExactSumSpec extends SparkSuite {
  init()
  import spark.implicits._

  private lazy val li = Tables.t(spark, sfDir, "lineitem")

  test("dsum == decimal sum on prices, grouped and global") {
    val a = li.groupBy(col("l_returnflag"))
      .agg(Reductions.dsum(col("l_extendedprice")).as("s"),
        Reductions.dsumDecimal(col("l_extendedprice")).as("d"))
      .collect()
    assert(a.nonEmpty)
    a.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"flag=${r.getString(0)}"))
    val g = li.agg(
      Reductions.dsum(col("l_discount") - lit(0.05)).as("s"),
      Reductions.dsumDecimal(col("l_discount") - lit(0.05)).as("d")).collect()(0)
    assert(g.getDouble(0) == g.getDouble(1)) // negative addends exercise carry
  }

  test("isum == decimal floor-sum on full-precision products") {
    val prod = col("l_extendedprice") * col("l_quantity")
    Seq(1, 8).foreach { parts =>
      val r = li.repartition(parts).agg(
        Reductions.isum(prod, 2).as("s"),
        Reductions.isumDecimal(prod, 2).as("d")).collect()(0)
      assert(r.getDouble(0) == r.getDouble(1), s"parts=$parts")
    }
  }

  test("null skipping and all-null groups return NULL like SUM") {
    val df = Seq(
      ("a", Some(1.5)), ("a", None), ("a", Some(2.25)),
      ("b", None), ("b", None)).toDF("k", "v")
    val out = df.groupBy(col("k"))
      .agg(Reductions.dsum(col("v"), 2).as("s"),
        Reductions.dsumDecimal(col("v"), 2).as("d"))
      .orderBy(col("k")).collect()
    assert(out(0).getDouble(1) == 3.75 && out(0).getDouble(2) == 3.75)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("large-magnitude addends: sum crosses the long boundary") {
    // 2000 addends of ~9e15 → Σ ≈ 1.8e19 > Long.MaxValue: the 128-bit
    // accumulator must carry correctly where a long sum would wrap.
    val big = spark.range(2000).select(
      (lit(9.0e15) + col("id").cast("double")).as("v"))
    val r = big.agg(Reductions.isum(col("v"), 0).as("s"),
      Reductions.isumDecimal(col("v"), 0).as("d")).collect()(0)
    assert(r.getDouble(0) == r.getDouble(1))
    assert(r.getDouble(0) > 9.2e18) // genuinely beyond long range
  }
}
