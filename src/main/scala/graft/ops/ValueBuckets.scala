package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Quantile bucketing of a numeric axis into P ordered buckets, where the
  * bucket id is a PURE FUNCTION OF THE VALUE — the primitive behind the
  * distributed keyless carries (as-of join, fill-range): a plan that
  * references the bucketed frame in several branches needs ids that agree
  * across branches regardless of exchange reuse, which a
  * `spark_partition_id` over a range exchange cannot promise (column
  * pruning de-duplicates the exchanges and each samples its own bounds).
  *
  * Boundaries are probed once with `approxQuantile` (one column-pruned
  * pass, at call time) and compiled into a balanced `when()` comparison
  * tree — O(log P) codegen-friendly comparisons per row. Equal values can
  * never straddle buckets, and bucket order follows value order; boundary
  * quality affects only load balance, never results.
  */
private[ops] object ValueBuckets {

  /** Append `outCol` = bucket index of `numExpr` (must cast to double). */
  def assign(df: DataFrame, numExpr: Column, outCol: String): DataFrame = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val v = numExpr.cast(DoubleType)
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.select(v.as("__vb")).na.drop("all")
        .stat.approxQuantile("__vb", probs, 0.001).distinct.sorted
    // bucket i holds values in [bounds(i-1), bounds(i))
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(v < lit(bounds(mid)), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    df.withColumn(outCol, tree(0, bounds.length))
  }
}
