package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.Kmv
import graft.llm.TextDedup

/** KMV / bottom-k theta sketch: accuracy bounds, mergeability (partition-count
  * invariance), and set-operation estimates. Oracle-exactness itself is pinned
  * by q62 in the driver's DuckDB gate. */
class KmvSpec extends SparkSuite {
  init()
  import spark.implicits._

  private val k = 256

  private def sketchOf(n: Long, parts: Int): Array[Long] = {
    Kmv.register(spark)
    spark.range(n).repartition(parts)
      .select(TextDedup.h60(col("id").cast(StringType)).as("h"))
      .agg(expr(s"kmv_sketch(h, $k)")).collect()(0).getSeq[Long](0).toArray
  }

  test("exact below k, within 3/sqrt(k) relative error above") {
    val small = sketchOf(200, 8)
    assert(small.length == 200 && Kmv.estimate(small, k) == 200.0)
    val big = sketchOf(50000, 8)
    assert(big.length == k)
    val est = Kmv.estimate(big, k)
    val rel = math.abs(est - 50000) / 50000
    assert(rel < 3.0 / math.sqrt(k), s"est=$est rel=$rel")
  }

  test("sketch is partition-count invariant (merge order irrelevant)") {
    assert(sketchOf(10000, 1).toSeq == sketchOf(10000, 32).toSeq)
  }

  test("set-op estimates: overlap halves, union covers") {
    Kmv.register(spark)
    def sk(lo: Long, hi: Long) =
      spark.range(lo, hi)
        .select(TextDedup.h60(col("id").cast(StringType)).as("h"))
        .agg(expr(s"kmv_sketch(h, $k)")).collect()(0).getSeq[Long](0).toArray
    val a = sk(0, 20000)       // [0, 20k)
    val b = sk(10000, 30000)   // [10k, 30k) — true ∩ = 10k, ∪ = 30k
    val inter = Kmv.intersectEstimate(a, b, k)
    val union = Kmv.unionEstimate(a, b, k)
    assert(math.abs(inter - 10000) / 10000 < 0.25, s"inter=$inter")
    assert(math.abs(union - 30000) / 30000 < 3.0 / math.sqrt(k), s"union=$union")
    // disjoint sets: intersection estimate collapses toward 0
    val c = sk(100000, 120000)
    assert(Kmv.intersectEstimate(a, c, k) < 500)
  }
}
