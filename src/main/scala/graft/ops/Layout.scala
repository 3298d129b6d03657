package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Physical-layout operators: Z-ORDER (Morton) clustering for
  * multi-dimensional data skipping. At 100 TB the win is not the query
  * plan but the FILE STATS: parquet keeps per-file min/max for every
  * column, and a scan with predicates on (a, b) can prune files only if
  * rows are clustered in BOTH dimensions at once. A linear sort clusters
  * one dimension perfectly and scatters the other; interleaving the two
  * dimensions' bits makes nearby z-values close in both, so range-
  * partitioning by z gives every output file a tight bounding box in
  * (a, b) — the Delta/Iceberg OPTIMIZE ZORDER layout, built from plain
  * repartitionByRange.
  *
  * Everything here is integer bit arithmetic (codegen'd, engine-portable:
  * the DuckDB oracle replays the same shift/mask sequence).
  */
object Layout {

  /** Spread a SCAN-ROOTED frame across the session's parallelism before
    * a CPU-heavy per-row kernel (tokenize / shingle / hash explode).
    *
    * Why it exists (r18, measured): Spark splits parquet scans by byte
    * range but cannot split below ROW-GROUP granularity, so a
    * single-file single-row-group table — the degenerate layout small
    * test fixtures and one-shot exports produce — hands the entire scan
    * to one or two tasks, and every downstream tokenization kernel in
    * the same stage serializes on one core (q128 at sf1.0: 7.2 s as-is,
    * 1.7 s spread — the whole "dedup-kernel curve" on the sf1.0
    * watch-list was this, not shuffle mass). At 100 TB real layouts
    * yield thousands of splits and this is a NO-OP; the repartition only
    * fires when the scan's split count is under half the session's
    * parallelism, and what it shuffles is by definition a small input
    * (a big one would have had splits).
    *
    * Contract: call on exchange-free frames only (scans + projections/
    * filters). Frames with upstream exchanges are returned unchanged
    * WITHOUT introspection — reading `.rdd` on an AQE plan with
    * exchanges would eagerly execute its query stages. */
  def spreadScan(df: DataFrame): DataFrame = {
    val hasExchange = df.queryExecution.sparkPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
      .isDefined
    if (hasExchange) df
    else {
      val want = df.sparkSession.sparkContext.defaultParallelism
      val have = df.rdd.getNumPartitions
      if (have * 2 >= want) df else df.repartition(want)
    }
  }

  /** Spread the low 16 bits of a non-negative long so bit i lands at
    * position 2i — the standard mask-shift Morton sequence (4 fixed
    * integer ops, no loops, codegen-friendly). */
  def spread16(v: Column): Column = {
    val m1 = lit(0x00FF00FFL); val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L); val m4 = lit(0x55555555L)
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(m1)
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(m2)
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(m3)
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(m4)
  }

  /** Morton z-value of two 16-bit cell coordinates: x bits at even
    * positions, y bits at odd — z ∈ [0, 2³²). */
  def zValue16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Min-max scale a numeric column to an integer cell in [0, 2^bits):
    * floor((v − min)·(2^bits − 1)/(max − min)), constant columns → 0.
    * The (min, max) come from `minCol`/`maxCol` (broadcast O(1) fit). */
  def toCell(v: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val span = maxC.cast(DoubleType) - minC.cast(DoubleType)
    val hi = math.pow(2, bits) - 1
    when(span > 0.0,
      floor((v.cast(DoubleType) - minC.cast(DoubleType)) / span * lit(hi))
        .cast(LongType))
      .otherwise(lit(0L))
  }

  /** Attach 16-bit cells and the z-value for two numeric columns:
    * adds (xCell, yCell, z). One O(1) min/max fit broadcast back, then
    * pure codegen arithmetic — the assignment pass of OPTIMIZE ZORDER. */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
                 xCell: String = "x_cell", yCell: String = "y_cell",
                 zName: String = "z"): DataFrame = {
    val fit = df.agg(
      min(col(xCol)).as("__xmn"), max(col(xCol)).as("__xmx"),
      min(col(yCol)).as("__ymn"), max(col(yCol)).as("__ymx"))
    df.crossJoin(broadcast(fit))
      .withColumn(xCell, toCell(col(xCol), col("__xmn"), col("__xmx"), 16))
      .withColumn(yCell, toCell(col(yCol), col("__ymn"), col("__ymx"), 16))
      .withColumn(zName, zValue16(col(xCell), col(yCell)))
      .drop("__xmn", "__xmx", "__ymn", "__ymx")
  }

  /** Rewrite `df` z-ordered on (xCol, yCol): range-partition by the
    * z-value into `files` partitions and sort within each — each output
    * file then covers a tight (x, y) bounding box, which is what the
    * parquet min/max file stats prune on. This is the layout action;
    * [[zorderStats]] is its measurable effect. */
  def repartitionByZOrder(df: DataFrame, xCol: String, yCol: String,
                          files: Int): DataFrame =
    withZValue(df, xCol, yCol)
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))

  /** SMALL-FILE COMPACTION shape: rewrite a frame into `files`
    * range-partitioned, internally sorted output partitions — the
    * OPTIMIZE/compact action that turns a shower of tiny files (the
    * classic streaming-ingest pathology; at 100 TB, file-count pressure
    * on the metastore/driver is as real as data size) into few
    * fat, sorted, min/max-prunable ones. One range shuffle, no driver
    * involvement; pair with `.write` at the call site. */
  def compact(df: DataFrame, files: Int, sortCols: Seq[String]): DataFrame =
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)

  /** CLUSTERING QUALITY table for a z-order layout: bucket rows by the
    * top `log2(buckets)` z bits (bucket = z >> (32 − log₂ buckets) — the
    * prefix ranges a range-partitioner would cut) and report each
    * bucket's row count and (x, y) cell bounding box. Tight boxes ⇒
    * file-stat pruning works in both dimensions. All integer arithmetic;
    * one data-sized groupBy after the O(1) fit. Returns
    * (bucket, n, x_min, x_max, y_min, y_max) for non-empty buckets. */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  buckets: Int = 64): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val shift = 32 - (31 - java.lang.Integer.numberOfLeadingZeros(buckets))
    withZValue(df, xCol, yCol)
      .withColumn("bucket", shiftright(col("z"), shift))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x_cell")).as("x_min"), max(col("x_cell")).as("x_max"),
        min(col("y_cell")).as("y_min"), max(col("y_cell")).as("y_max"))
      .orderBy(col("bucket"))
  }
}
