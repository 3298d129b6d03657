package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Rolling / expanding windows (reference src/tech/v3/dataset/rolling.clj).
  *
  * The reference materializes per-row index ranges and maps a reducer over each
  * (apply-window-ranges, rolling.clj:76-113). On Spark the same semantics are
  * window frames — computed streaming within a partition, no range
  * materialization, distributed by the partition keys.
  *
  * TMD's `:relative-window-position` maps to frame bounds:
  *   :left   → rowsBetween(-(n-1), 0)
  *   :center → rowsBetween(-(n-1)/2, n/2)   (TMD centers the same way)
  *   :right  → rowsBetween(0, n-1)
  * TMD `:edge-mode :clamp` repeats the edge value so windows stay size n;
  * Spark frames shrink at the edges. For sum/min/max/first/last the shrunk
  * frame equals clamp only sometimes — `clampPad` reproduces clamp exactly by
  * padding the aggregate with the edge value weighted by the missing width.
  * Default rolling uses shrinking frames (documented engine policy).
  */
object Rolling {

  sealed trait Position
  case object Left extends Position
  case object Center extends Position
  case object Right extends Position

  def frame(w: WindowSpec, n: Int, pos: Position): WindowSpec = pos match {
    case Left   => w.rowsBetween(-(n - 1), 0)
    case Center => w.rowsBetween(-((n - 1) / 2), n / 2)
    case Right  => w.rowsBetween(0, n - 1)
  }

  /** Fixed rolling window (rolling.clj:116-304): named reducers over a window
    * of n rows ordered by `order`, partitioned by `part` for distribution. */
  def rolling(df: DataFrame, n: Int, pos: Position, order: Seq[Column],
              part: Seq[Column], aggs: (String, WindowSpec => Column)*): DataFrame = {
    val w = frame(Window.partitionBy(part: _*).orderBy(order: _*), n, pos)
    aggs.foldLeft(df) { case (d, (name, f)) => d.withColumn(name, f(w)) }
  }

  /** Variable (range/time-based) window (rolling.clj:286-301): window extends
    * `span` units back from the current row on a monotonic numeric/time axis.
    * For timestamps pass the column pre-cast to long seconds/millis. */
  def rollingRange(df: DataFrame, axis: Column, span: Long, part: Seq[Column],
                   aggs: (String, WindowSpec => Column)*): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(axis)
      .rangeBetween(-span, 0)
    aggs.foldLeft(df) { case (d, (name, f)) => d.withColumn(name, f(w)) }
  }

  /** Calendar-unit variable rolling window (reference rolling.clj:286-301
    * with `:units :months`/`:years` — dtype-next's between-op in calendar
    * units): for each row, named reducers over all rows of the same
    * partition whose time lies in `[t − span·unit, t]`, where the
    * subtraction is CALENDAR arithmetic with month-end clamping
    * (2020-03-31 − 1 month = 2020-02-29) — inexpressible as a Spark
    * `rangeBetween` (the frame width varies row to row in physical time).
    *
    * Plan (no global window, no per-row span trick): windows depend only
    * on (partition, t), so (1) distinct anchors get their clamped lower
    * bound via `add_months`/`timestampadd`; (2) every value row is
    * replicated to the `span+1` month buckets it can serve
    * (`explode(sequence(m, m+span))` on the year·12+month index — a row's
    * calendar-window lower bound always lands exactly `span` month slots
    * back); (3) one equi shuffle join on (partition, bucket) + the exact
    * range filter; (4) one keyed aggregation per anchor; (5) join back.
    * Cost: one shuffle of |anchors| + (span+1)·|rows| — replication factor
    * O(span), never O(n²), and survives arbitrary partition counts.
    *
    * `aggs` entries are (outputCol, valueCol, reducer) — the reducer gets
    * the joined value column (e.g. `c => avg(c)`). Rows with a NULL time
    * keep their row but get NULL aggregates (left join back). `unit` ∈
    * months | years (years = 12·span months; identical clamp rule).
    * `position` mirrors the reference's `:relative-window-position` for
    * variable windows: Left (default) = trailing `[t − span, t]`, Right =
    * leading `[t, t + span]` (Center is not defined for calendar spans —
    * half a month is not a calendar quantity). */
  def rollingRangeCalendar(df: DataFrame, timeCol: String, span: Int,
                           unit: String, part: Seq[String],
                           aggs: Seq[(String, String, Column => Column)],
                           position: Position = Left): DataFrame = {
    require(span >= 1, s"rollingRangeCalendar: span must be >= 1, got $span")
    require(aggs.nonEmpty, "rollingRangeCalendar: no reducers given")
    require(position != Center,
      "rollingRangeCalendar: Center is undefined for calendar units")
    val months = unit match {
      case "months" => span
      case "years"  => span * 12
      case other => throw new IllegalArgumentException(
        s"rollingRangeCalendar: unit must be months|years, got '$other'")
    }
    val isDate =
      df.schema(timeCol).dataType == org.apache.spark.sql.types.DateType
    def mIdx(c: Column): Column = year(c) * lit(12) + month(c) - lit(1)
    def shifted(m: Int): Column =
      if (isDate) add_months(col("__anchor_t"), m)
      else expr(s"timestampadd(MONTH, $m, __anchor_t)")
    val farBound = shifted(if (position == Left) -months else months)
    val anchors = df
      .select((part.map(col) :+ col(timeCol).as("__anchor_t")): _*)
      .filter(col("__anchor_t").isNotNull).distinct()
      .withColumn("__fb", farBound)
      .withColumn("__b", mIdx(col("__anchor_t")))
    val valueCols = aggs.map(_._2).distinct
    // replication: a value row in month slot m can serve anchors whose
    // slot is in [m, m+span] for trailing windows, [m−span, m] for leading
    val (repLo, repHi) =
      if (position == Left) (lit(0), lit(months)) else (lit(-months), lit(0))
    val rv = df
      .select((part.map(col) :+ col(timeCol).as("__rt")) ++
        valueCols.map(c => col(c).as(s"__rv_$c")): _*)
      .filter(col("__rt").isNotNull)
      .withColumn("__b",
        explode(sequence(mIdx(col("__rt")) + repLo, mIdx(col("__rt")) + repHi)))
    val rangePred =
      if (position == Left)
        col("__rt") >= col("__fb") && col("__rt") <= col("__anchor_t")
      else
        col("__rt") >= col("__anchor_t") && col("__rt") <= col("__fb")
    val joined = anchors.join(rv, part :+ "__b").filter(rangePred)
    val aggExprs = aggs.map { case (out, vc, fn) =>
      fn(col(s"__rv_$vc")).as(out) }
    val agged = joined
      .groupBy((part.map(col) :+ col("__anchor_t")): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .withColumnRenamed("__anchor_t", timeCol)
    df.join(agged, part :+ timeCol, "left")
  }

  /** Expanding / cumulative windows (rolling.clj:307-314). */
  def expanding(df: DataFrame, order: Seq[Column], part: Seq[Column],
                aggs: (String, WindowSpec => Column)*): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aggs.foldLeft(df) { case (d, (name, f)) => d.withColumn(name, f(w)) }
  }

  /** The built-in reducer set (rolling.clj:17-73) as WindowSpec functions. */
  def rMean(c: Column): WindowSpec => Column = w => avg(c).over(w)
  def rSum(c: Column): WindowSpec => Column = w => sum(c).over(w)
  def rMin(c: Column): WindowSpec => Column = w => min(c).over(w)
  def rMax(c: Column): WindowSpec => Column = w => max(c).over(w)
  def rFirst(c: Column): WindowSpec => Column = w => first(c).over(w)
  def rLast(c: Column): WindowSpec => Column = w => last(c).over(w)
  def rCount(c: Column): WindowSpec => Column = w => count(c).over(w)
  def rVariance(c: Column): WindowSpec => Column = w => var_samp(c).over(w)
  def rStddev(c: Column): WindowSpec => Column = w => stddev_samp(c).over(w)

  /** ROLLING PEARSON CORRELATION between two columns (parity-plus window
    * reducer — the pairs-trading / sensor-drift signal): all five co-moments
    * come from floor-scaled exact integer window sums (order-independent on
    * any partitioning, so the result replays bit-exactly in SQL), the
    * closed form runs in a fixed IEEE op sequence, and degenerate windows
    * (zero variance on either side) yield null. One window pass, keyed
    * partitioning — no single-task funnel. */
  def rCorr(x: Column, y: Column): WindowSpec => Column = { w =>
    def sL(c: Column): WindowSpec => Column = wi =>
      sum(floor(c * lit(1e6)).cast("long")).over(wi).cast("double") / lit(1e6)
    val n = count(lit(1)).over(w).cast("double")
    val (sx, sy) = (sL(x.cast("double"))(w), sL(y.cast("double"))(w))
    val (sxx, syy) = (sL(x.cast("double") * x.cast("double"))(w),
      sL(y.cast("double") * y.cast("double"))(w))
    val sxy = sL(x.cast("double") * y.cast("double"))(w)
    val cov = n * sxy - sx * sy
    val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
    when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy)))
  }

  /** ROLLING SKEWNESS (population, moment-based): m₃/m₂^1.5 over the
    * frame, from floor-scaled exact integer window sums of x, x², x³
    * (order-independent ⇒ replays bit-exactly in SQL). Scales: 10⁶ for
    * x and x², 10⁴ for x³ — the x³ addend must keep |x|³·10⁴ < 9·10¹⁸/n,
    * fine for metric-sized columns on FIXED windows (this is a fixed
    * window reducer, not for unbounded frames). Degenerate frames
    * (m₂ ≤ 0) yield null. */
  def rSkew(c: Column): WindowSpec => Column = { w =>
    def sL(e: Column, p: Double): Column =
      sum(floor(e * lit(p)).cast("long")).over(w).cast("double") / lit(p)
    val x = c.cast("double")
    val n = count(lit(1)).over(w).cast("double")
    val s1 = sL(x, 1e6); val s2 = sL(x * x, 1e6); val s3 = sL(x * x * x, 1e4)
    val mean = s1 / n
    val m2 = s2 / n - mean * mean
    val m3 = s3 / n - lit(3.0) * mean * (s2 / n) + lit(2.0) * mean * mean * mean
    when(n > 2 && m2 > 0.0, m3 / sqrt(m2 * m2 * m2))
  }

  /** ROLLING EXCESS KURTOSIS (population): m₄/m₂² − 3 over the frame,
    * same floor-scaled exact-sum construction as [[rSkew]] (x⁴ at 10²:
    * |x|⁴·10²·n must stay < 9·10¹⁸ — metric-sized columns on fixed
    * windows). Degenerate frames yield null. */
  def rKurt(c: Column): WindowSpec => Column = { w =>
    def sL(e: Column, p: Double): Column =
      sum(floor(e * lit(p)).cast("long")).over(w).cast("double") / lit(p)
    val x = c.cast("double")
    val n = count(lit(1)).over(w).cast("double")
    val s1 = sL(x, 1e6); val s2 = sL(x * x, 1e6)
    val s3 = sL(x * x * x, 1e4); val s4 = sL(x * x * x * x, 1e2)
    val mean = s1 / n
    val m2 = s2 / n - mean * mean
    val m4 = s4 / n - lit(4.0) * mean * (s3 / n) +
      lit(6.0) * mean * mean * (s2 / n) -
      lit(3.0) * mean * mean * mean * mean
    when(n > 3 && m2 > 0.0, m4 / (m2 * m2) - lit(3.0))
  }

  /** ROLLING EXACT MEDIAN (parity-plus window reducer): the frame's
    * non-null values are collected, sorted, and the median read as
    * (v[(m−1) div 2] + v[m div 2]) / 2 — for odd m the two indices
    * coincide, so no interpolation noise; for even m the symmetric
    * midpoint. State is bounded by the frame width n (this is a FIXED
    * window reducer — never use over an unbounded frame), so the window
    * stays a streaming in-partition pass. The sort order and index pick
    * are total → engine-replayable (DuckDB: list() window + list_sort). */
  def rMedian(c: Column): WindowSpec => Column = { w =>
    val arr = array_sort(collect_list(c.cast("double")).over(w))
    val m = size(arr)
    // integer index arithmetic (Column./ is float division — cast back)
    val lo = ((m - lit(1)) / lit(2)).cast("int") + lit(1)
    val hi = (m / lit(2)).cast("int") + lit(1)
    when(m > 0, (element_at(arr, lo) + element_at(arr, hi)) / lit(2.0))
  }

  /** Time-weighted average per key (the TWAP / sensor-sampling mean):
    * each sample holds its value until the next sample's timestamp, so
    * twap = Σ vᵢ·Δᵢ / Σ Δᵢ with Δᵢ = t_{i+1} − tᵢ in integer
    * MICROSECONDS (the last sample has no duration and contributes
    * nothing). Weights are exact integers; the weighted sum is a
    * floor-scaled exact sum (scale 4 — |v|·Δus must stay < 9·10¹⁴, i.e.
    * |v| ≲ 250 per hour-scale gap, far above the metric columns this
    * aggregates). Returns (key…, n, span_us, twap); keys whose span is
    * zero (single sample or all-equal timestamps) yield null twap.
    * One keyed window pass (lead) + one keyed aggregation. */
  def timeWeightedAvg(df: DataFrame, keyCols: Seq[Column], tsCol: Column,
                      orderTiebreak: Seq[Column], valueCol: Column,
                      outName: String = "twap"): DataFrame = {
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(tsCol +: orderTiebreak: _*)
    val us = unix_micros(tsCol)
    val base = df
      .filter(valueCol.isNotNull && !isnan(valueCol.cast("double")) &&
        tsCol.isNotNull)
      .withColumn("__dus", lead(us, 1).over(w) - us)
      .withColumn("__v", valueCol.cast("double"))
    base.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("__dus")), lit(0L)).as("span_us"),
        Reductions.isum(col("__v") * col("__dus").cast("double"), 4)
          .as("__wsum"))
      .withColumn(outName,
        when(col("span_us") > 0L,
          col("__wsum") / col("span_us").cast("double")))
      .drop("__wsum")
  }

  /** TMD `:edge-mode :clamp` parity (rolling.clj:130-133): the reference
    * keeps windows at size n by REPEATING the edge value; Spark frames shrink.
    * For sum/mean the clamped result is recovered exactly from the shrunk
    * frame: sum_clamp = sum_shrunk + (n − cnt)·edge_value, where the edge
    * value is the partition's first row (trailing windows) or last row
    * (leading windows). Adds `<out>_sum`/`<out>_mean` columns. */
  def rollingClampSumMean(df: DataFrame, n: Int, pos: Position,
                          order: Seq[Column], part: Seq[Column], c: Column,
                          out: String): DataFrame = {
    val base = Window.partitionBy(part: _*).orderBy(order: _*)
    val w = frame(base, n, pos)
    val wholePart = base
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // frame bounds per position: lo rows before, hi rows after the current
    val (lo, hi) = pos match {
      case Left => (n - 1, 0)
      case Center => ((n - 1) / 2, n / 2)
      case Right => (0, n - 1)
    }
    // how many frame slots fall off each partition edge — computed from ROW
    // POSITION (nulls inside a full frame are NOT edge shrinkage and must
    // not be padded): leading pads repeat the partition's first value,
    // trailing pads its last (reference ':clamp fills first,last
    // respectively', rolling.clj:130-133)
    val rn = row_number().over(base)
    val cntPart = count(lit(1)).over(wholePart)
    val missLead = greatest(lit(0), lit(lo) - (rn - 1))
    val missTrail = greatest(lit(0), lit(hi) - (cntPart - rn))
    val sumClamp = sum(c).over(w) +
      missLead * first(c).over(wholePart) +
      missTrail * last(c).over(wholePart)
    df.withColumn(s"${out}_sum", sumClamp)
      .withColumn(s"${out}_mean", sumClamp / n)
  }

  /** Deterministic rolling mean via decimal sum (same engine policy as
    * Reductions.dmean — reproducible across partition counts). */
  def rMeanExact(c: Column, scale: Int = 4): WindowSpec => Column = w =>
    (sum(c.cast(org.apache.spark.sql.types.DecimalType(30, scale))).over(w)
      .cast("double") / count(c).over(w))

  /** Ranking/analytic family — absent in the reference (SURVEY §2.5: done by
    * hand there via shifting selects), free on Spark. Exposed for parity-plus. */
  def withLagLead(df: DataFrame, c: Column, order: Seq[Column],
                  part: Seq[Column], offset: Int): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn("lag", lag(c, offset).over(w))
      .withColumn("lead", lead(c, offset).over(w))
  }
}
