package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Bounded._

/** Aggregation surface: the reference's out-of-core reducer framework
  * (`tech.v3.dataset.reductions`, reference src/tech/v3/dataset/reductions.clj)
  * re-expressed as `groupBy().agg()` — Spark's partial (map-side) + final
  * aggregation is the same init/reduce/merge/finalize contract the reference
  * implements by hand over a ConcurrentHashMap (reductions.clj:463-481), but it
  * distributes across executors and spills.
  *
  * Determinism note (engine policy, SURVEY §7.4): double summation is
  * order-dependent, and Spark's merge order is nondeterministic across runs and
  * cluster sizes. Any aggregate we promise to be reproducible (and oracle-
  * comparable) is routed through exact decimal accumulation (`dsum`) and only
  * converted to double at the end. This also matches the reference's intent
  * with Kahan compensated summation (reductions.clj:107-113) — better-than-
  * naive floating point, at scale, for free inside Tungsten's decimal sum.
  */
object Reductions {

  /** Exact sum of a (≤ `scale`-decimal) double column, returned as a
    * deterministic double. Reference: Kahan `sum` reductions.clj:107-113. */
  def dsum(c: Column, scale: Int = 4): Column =
    call_function("graft_sum128", c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** The original Sum(Decimal)-based forms — executable spec for the Int128
    * aggregate (ExactSumSpec pins sum128 == decimal-sum bit-exactly).
    * Addend bound: |x| < 10^14 for the new compact-decimal form vs 10^26
    * before — far above any column this engine aggregates; the 128-bit
    * ACCUMULATOR is unbounded for practical purposes (~10^25 rows). */
  private[graft] def dsumDecimal(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  private[graft] def isumDecimal(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    sum(floor(c * lit(p)).cast(DecimalType(30, 0))).cast(DoubleType) / lit(p)
  }

  /** Deterministic mean via exact decimal sum / count.
    * Reference: `mean` reductions.clj:116-125. */
  def dmean(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Scaled-integer exact sum: floor(x·10^d) summed as exact integers in
    * decimal, then scaled back in double. Unlike a direct double→decimal cast
    * (whose round-half behavior differs between engines and ties surprisingly
    * often once the double's ulp exceeds 10^-scale), floor is exact on the
    * binary value, so the result is bit-identical on ANY engine. Use for
    * full-precision doubles and products; `dsum` remains for ≤scale-decimal
    * data where the cast is exact. */
  def isum(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    call_function("graft_sum128", floor(c * lit(p)).cast(LongType), lit(0))
      .cast(DoubleType) / lit(p)
  }

  /** Deterministic variance/stddev via exact sums of x and x² (products of
    * 2-decimal inputs stay exact at scale 8). Population variant matches
    * DuckDB var_pop. Reference: rolling variance rolling.clj:17-73. */
  def dvarPop(c: Column, scale: Int = 8): Column = {
    val n = count(c).cast(DoubleType)
    val sx = dsum(c, scale)
    val sxx = dsum(c * c, scale)
    (sxx - sx * sx / n) / n
  }

  def dstddevPop(c: Column, scale: Int = 8): Column = sqrt(dvarPop(c, scale))

  /** Deterministic Pearson correlation from exact component sums, over
    * PAIRWISE-COMPLETE rows (a null in either column drops the pair from
    * every sum and from n — mixing per-column null skipping with a global
    * count gives nonsense correlations).
    * Reference: correlation-table src/tech/v3/dataset/math.clj:37-109. */
  def dcorr(x: Column, y: Column, scale: Int = 8): Column = {
    val both = x.isNotNull && y.isNotNull
    def s(c: Column) = dsum(when(both, c), scale)
    val n = count(when(both, 1)).cast(DoubleType)
    val sx = s(x); val sy = s(y)
    val sxx = s(x * x); val syy = s(y * y)
    val sxy = s(x * y)
    (n * sxy - sx * sy) /
      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }

  /** The reference's named-reducer map API (reductions.clj:377-590):
    * `groupByAgg(df, Seq("k"), "sum_x" -> Reductions.dsum(col("x")), ...)`.
    * Key can be multiple columns, exactly like key-can-be-column-vec. */
  def groupByAgg(df: DataFrame, keys: Seq[String],
                 aggs: (String, Column)*): DataFrame = {
    val exprs = aggs.map { case (name, c) => c.as(name) }
    if (keys.isEmpty) df.agg(exprs.head, exprs.tail: _*)
    else df.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** min-n-by-column / top-k (reference dataset_api.clj:453-501, guava
    * min-max heap) → Catalyst TakeOrderedAndProject: each partition keeps
    * only its top N, the driver merges N·partitions rows — no global sort.
    * `tiebreak` columns join the SELECTION sort, not just presentation:
    * the top-k heap is not stable, so ties at the boundary would otherwise
    * pick a partition-order-dependent set. */
  def minNByColumn(df: DataFrame, name: String, n: Int,
                   descending: Boolean = false,
                   tiebreak: Seq[Column] = Seq.empty): DataFrame =
    df.orderBy((if (descending) col(name).desc else col(name).asc) +:
      tiebreak: _*).limit(n)

  /** descriptive-stats (reference dataset_api.clj:1300-1399): one row per
    * numeric column with n-valid/n-missing/min/mean/max/stddev — computed in a
    * single pass over the table (one job, column-pruned scan). */
  def descriptiveStats(df: DataFrame, cols: Seq[String],
                       squareScale: Map[String, Int] = Map.empty): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c0 =>
      val c = col(c0)
      val n = count(c).cast(DoubleType)
      val sx = isum(c, 4)
      // square-sum scale: 4 keeps ≤2-decimal data exact; columns whose squares
      // reach ~1e10 must drop to 2 so floor(x²·10^s) stays under 2^53
      val sxx = isum(c * c, squareScale.getOrElse(c0, 4))
      Seq(count(c).as(s"${c0}__nvalid"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${c0}__nmissing"),
        min(c).cast(DoubleType).as(s"${c0}__min"),
        (sx / count(c)).as(s"${c0}__mean"),
        max(c).cast(DoubleType).as(s"${c0}__max"),
        sqrt(greatest((sxx - sx * sx / n) / n, lit(0.0))).as(s"${c0}__stddev"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // driver-side reshape of ONE row → per-column rows (no distributed cost)
    val row = wide.collectBounded(1, "one-row stats agg")(0)
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c0 =>
      def g(s: String): Double = {
        val v = row.get(wide.columns.indexOf(s"${c0}__$s"))
        if (v == null) Double.NaN else v match {
          case d: Double => d
          case l: Long => l.toDouble
          case o => o.toString.toDouble
        }
      }
      (c0, g("nvalid").toLong, g("nmissing").toLong, g("min"), g("mean"),
        g("max"), g("stddev"))
    }.toDF("column", "n_valid", "n_missing", "min", "mean", "max", "stddev")
  }

  /** descriptive-stats over DATETIME columns — the reference computes
    * min/mean/max of date columns AS datetimes
    * (/root/reference/test/tech/v3/dataset/datetime_test.clj
    * stocks-descriptive-stats); here each timestamp/date column reduces
    * over exact integer epoch-micros (decimal sum — a long sum of micros
    * overflows at ~5k modern timestamps — then ONE integer division), so
    * the mean replays bit-exactly in SQL. Date columns are treated as
    * midnight timestamps (UTC session). Returns one row per column:
    * (column, n_valid, n_missing, min, mean, max) with the three stats
    * TimestampType. One aggregation; O(columns) driver reshape. */
  def descriptiveStatsDatetime(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    val aggs: Seq[Column] = cols.flatMap { c0 =>
      val raw = df.schema(c0).dataType match {
        case TimestampType => col(c0)
        case DateType => col(c0).cast(TimestampType)
        case other => throw new IllegalArgumentException(
          s"$c0: not a datetime column ($other)")
      }
      val us = unix_micros(raw)
      Seq(count(us).as(s"${c0}__nvalid"),
        sum(when(us.isNull, 1L).otherwise(0L)).as(s"${c0}__nmissing"),
        min(us).as(s"${c0}__min"),
        expr(s"CAST(sum(CAST(unix_micros(CAST(`$c0` AS TIMESTAMP)) " +
          s"AS DECIMAL(38,0))) div count(unix_micros(CAST(`$c0` AS " +
          "TIMESTAMP))) AS BIGINT)").as(s"${c0}__mean"),
        max(us).as(s"${c0}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val row = wide.collectBounded(1, "one-row stats agg")(0)
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c0 =>
      def g(s: String): java.lang.Long = {
        val v = row.get(wide.columns.indexOf(s"${c0}__$s"))
        if (v == null) null else java.lang.Long.valueOf(v.asInstanceOf[Long])
      }
      (c0, g("nvalid"), g("nmissing"), g("min"), g("mean"), g("max"))
    }.toDF("column", "n_valid", "n_missing", "__min", "__mean", "__max")
      .select(col("column"), col("n_valid"), col("n_missing"),
        timestamp_micros(col("__min")).as("min"),
        timestamp_micros(col("__mean")).as("mean"),
        timestamp_micros(col("__max")).as("max"))
  }

  /** brief (reference dataset_api.clj:1300-1399's quartile-bearing variant):
    * one row per column with min/q1/median/q3/max via EXACT percentiles.
    *
    * Scale design: Spark's exact `percentile()` is an ImperativeAggregate
    * that buffers EVERY value in the agg buffer — an executor OOM at 100 TB,
    * not just a slow query. Instead: one aggregation pass for
    * count/min/max, then per column a distributed range-partitioned sort +
    * index selection (`sortBy` + `zipWithIndex` + filter on the ≤6 quartile
    * ranks) — only O(1) values ever reach the driver and no operator holds
    * O(n) state. Interpolation reproduces Spark Percentile's formula
    * `(hi-p)·v_lo + (p-lo)·v_hi` at `p = q·(n-1)` bit-for-bit (and DuckDB's
    * quantile_cont agrees on these inputs — oracle-checked). */
  def briefStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val aggs: Seq[Column] = cols.flatMap { c0 =>
      val c = col(c0)
      Seq(count(c).as(s"${c0}__n"),
        min(c).cast(DoubleType).as(s"${c0}__min"),
        max(c).cast(DoubleType).as(s"${c0}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collectBounded(1, "one-row stats agg")(0)
    import spark.implicits._
    // the per-column quartile-selection sorts are independent Spark jobs —
    // submit them CONCURRENTLY (Spark's scheduler interleaves their stages
    // across the executor slots) instead of paying 1 sort-job latency per
    // column serially
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(cols.size, 8)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = cols.map { c0 =>
      Future {
        val n = row.getLong(row.fieldIndex(s"${c0}__n"))
        if (n == 0) (c0, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
        else {
          val targets: Set[Long] = Seq(0.25, 0.5, 0.75)
            .map(q => q * (n - 1))
            .flatMap(p => Seq(p.floor.toLong, p.ceil.toLong)).toSet
          val picked: Map[Long, Double] = df.select(col(c0).cast(DoubleType))
            .filter(col(c0).isNotNull)
            .rdd.map(_.getDouble(0))
            .sortBy(identity)          // distributed range-partitioned sort
            .zipWithIndex()
            .filter { case (_, i) => targets.contains(i) }
            .map(_.swap)
            .collectBounded(8, "<=6 rank targets").toMap           // ≤ 6 values — not a data collect
          def q(qq: Double): Double = {
            val p = qq * (n - 1)
            val lo = p.floor.toLong; val hi = p.ceil.toLong
            if (hi == lo) picked(lo)
            else (hi - p) * picked(lo) + (p - lo) * picked(hi)
          }
          (c0, row.getDouble(row.fieldIndex(s"${c0}__min")), q(0.25), q(0.5),
            q(0.75), row.getDouble(row.fieldIndex(s"${c0}__max")))
        }
      }
    }
    val out =
      try Await.result(Future.sequence(futures), Duration.Inf)
      finally pool.shutdown()
    out.toDF("column", "min", "q1", "median", "q3", "max")
  }

  /** PER-GROUP exact interpolated quantiles WITHOUT Spark's `percentile`
    * (whose agg buffer holds every group value — an executor OOM on a hot
    * group at 100 TB) and WITHOUT a per-group sort window funnel: ranks
    * come from `stratifiedRank` (one distributed range sort over
    * (group, value) + O(groups) broadcast offsets), the ≤ 2·|qs| needed
    * order statistics per group survive a codegen filter, and one tiny
    * keyed aggregation interpolates with `percentile`'s exact
    * `(hi−p)·v_lo + (p−lo)·v_hi` formula at p = q·(n−1) — which DuckDB's
    * per-group `quantile_cont` matches bit-for-bit (q106 precedent).
    * Returns (group, n, <name per quantile>) wide. Null/NaN values are
    * complete-case dropped. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[(String, Double)],
                     /** Optional precomputed complete-case counts
                       * (columns: groupCol, "n") from an earlier pass over
                       * the same rows — skips the counts scan, so `df` is
                       * consumed ONCE (the range sort). */
                     precounts: Option[DataFrame] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0 && q <= 1 })
    import graft.ops.TableOps._
    val vals = df
      .select(col(groupCol).as("__g"), col(valueCol).cast(DoubleType).as("__x"))
      .filter(col("__g").isNotNull && col("__x").isNotNull &&
        !isnan(col("__x")))
    val ranked = precounts match {
      case None => vals.stratifiedRank("__g", Seq(col("__x")), "__r", "__n")
      case Some(cnts) => vals.stratifiedRankPrecounted("__g",
        Seq(col("__x")),
        cnts.select(col(groupCol).as("__g"), col("n").cast(LongType).as("__n")),
        "__r", "__n")
    }
    val zeroIdx = col("__r") - 1
    def pRow(q: Double) = lit(q) * (col("__n") - 1).cast(DoubleType)
    val keep = qs.map { case (_, q) =>
      (zeroIdx === floor(pRow(q)).cast(LongType)) ||
        (zeroIdx === ceil(pRow(q)).cast(LongType))
    }.reduce(_ || _)
    val aggs: Seq[org.apache.spark.sql.Column] =
      max(col("__n")).as("n") +: qs.flatMap { case (name, q) =>
        Seq(
          max(when(zeroIdx === floor(pRow(q)).cast(LongType), col("__x")))
            .as(s"__lo_$name"),
          max(when(zeroIdx === ceil(pRow(q)).cast(LongType), col("__x")))
            .as(s"__hi_$name"))
      }
    val picked = ranked.filter(keep)
      .groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    def pAgg(q: Double) = lit(q) * (col("n") - 1).cast(DoubleType)
    picked.select(
      col("__g").as(groupCol) +: col("n") +: qs.map { case (name, q) =>
        val p = pAgg(q)
        val lo = floor(p); val hi = ceil(p)
        when(hi === lo, col(s"__lo_$name"))
          .otherwise((hi.cast(DoubleType) - p) * col(s"__lo_$name") +
            (p - lo.cast(DoubleType)) * col(s"__hi_$name"))
          .as(name)
      }: _*)
  }

  /** Coarse exact sum for large-magnitude products (third moments, big
    * squares): floor(x/div) summed exactly in Int128, scaled back by div.
    * Granularity `div` absolute — deterministic on any engine, PROVIDED div
    * is exactly double-representable (use powers of ten ≥ 1; 0.01-style
    * divisors are not exact in binary and would drift between engines). */
  def isumCoarse(c: Column, div: Double): Column = {
    require(div >= 1 && div == math.rint(div), s"div must be an integer ≥ 1, got $div")
    call_function("graft_sum128", floor(c / lit(div)).cast(LongType), lit(0))
      .cast(DoubleType) * lit(div)
  }

  /** FULL descriptive-stats (reference dataset_api.clj:1300-1399
    * all-descriptive-stats-names, numeric variant): ONE call → one row per
    * column with column/datatype/n_valid/n_missing/min/q1/mean/mode/median/
    * q3/max/stddev/skew/n_distinct/first/last.
    *
    * Scale design: one exact-sum aggregation over all columns (x, x², x³
    * Int128 sums + count-distinct + keyed first/last), then PER COLUMN —
    * submitted concurrently — a distributed quartile rank-selection (the
    * briefStats sort/zipWithIndex pick; no O(n) agg buffer) and a mode
    * aggregation over the column's value-count frame. Driver traffic is
    * O(cols) scalars.
    *
    * `orderCol`: unique key defining first/last via min_by/max_by — engine-
    * independent and shuffle-stable. None falls back to the reference's
    * positional semantics (limit(1)/tail(1) — tied to scan order; fine
    * single-file, not oracle-checkable across engines).
    *
    * skew: sample skewness G1 = n/((n−1)(n−2)) · Σ(x−μ)³/s³ (the
    * commons-math convention the reference's dfn/descriptive-statistics
    * follows), computed from exact raw-moment sums with pinned op order —
    * Σ(x−μ)³ = sxxx − 3μ·sxx + 2μ²·sx — and 0.0 when n<3 or s=0 (avoids a
    * cross-engine NaN/NULL mismatch). `cubeDiv` coarsens the x³ sum for
    * large-magnitude columns (e.g. 1e4 for values up to ~5e5, keeping
    * floor(x³/div) under the Int128 addend bound); `squareScale` as
    * descriptiveStats. */
  def descriptiveStatsFull(df: DataFrame, cols: Seq[String],
                           orderCol: Option[String] = None,
                           squareScale: Map[String, Int] = Map.empty,
                           cubeDiv: Map[String, Double] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val aggs: Seq[Column] = cols.flatMap { c0 =>
      val c = col(c0)
      val cube = c.cast(DoubleType) * c.cast(DoubleType) * c.cast(DoubleType)
      Seq(
        count(c).as(s"${c0}__nvalid"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${c0}__nmissing"),
        min(c).cast(DoubleType).as(s"${c0}__min"),
        max(c).cast(DoubleType).as(s"${c0}__max"),
        isum(c, 4).as(s"${c0}__sx"),
        isum(c * c, squareScale.getOrElse(c0, 4)).as(s"${c0}__sxx"),
        cubeDiv.get(c0).map(d => isumCoarse(cube, d))
          .getOrElse(isum(cube, 4)).as(s"${c0}__sxxx")) ++
        orderCol.toSeq.flatMap { o =>
          Seq(min_by(c, col(o)).cast(DoubleType).as(s"${c0}__first"),
            max_by(c, col(o)).cast(DoubleType).as(s"${c0}__last"))
        }
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val row = wide.collectBounded(1, "one-row stats agg")(0)
    // positional fallback: ONE head + ONE tail job for all columns
    val (posFirst, posLast) =
      if (orderCol.isDefined) (null, null)
      else {
        val sel = df.select(cols.map(c => col(c).cast(DoubleType)): _*)
        (sel.limit(1).collectBounded(1, "head row").headOption.orNull,
          sel.tail(1).headOption.orNull)
      }
    import spark.implicits._
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(cols.size, 8)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val dtypes = cols.map(c => c -> df.schema(c).dataType.simpleString).toMap
    val futures = cols.map { c0 =>
      Future {
        def g(s: String): Double = {
          val v = row.get(wide.columns.indexOf(s"${c0}__$s"))
          if (v == null) Double.NaN else v match {
            case d: Double => d
            case l: Long => l.toDouble
            case o => o.toString.toDouble
          }
        }
        val nv = row.getLong(row.fieldIndex(s"${c0}__nvalid"))
        val n = nv.toDouble
        val sx = g("sx"); val sxx = g("sxx"); val sxxx = g("sxxx")
        val mu = sx / n
        val stddev = math.sqrt(math.max((sxx - sx * sx / n) / n, 0.0))
        val sSamp =
          if (nv > 1) math.sqrt(math.max((sxx - sx * sx / n) / (n - 1.0), 0.0))
          else 0.0
        val m3 = sxxx - 3.0 * mu * sxx + 2.0 * mu * mu * sx
        val skew =
          if (nv < 3 || sSamp == 0.0) 0.0
          else (n / ((n - 1.0) * (n - 2.0))) * (m3 / (sSamp * sSamp * sSamp))
        // distributed quartile rank-selection (briefStats formula:
        // (hi−p)·v_lo + (p−lo)·v_hi at p = q·(n−1) — quantile_cont-exact)
        val (q1, med, q3) =
          if (nv == 0) (Double.NaN, Double.NaN, Double.NaN)
          else {
            val targets: Set[Long] = Seq(0.25, 0.5, 0.75)
              .map(q => q * (n - 1))
              .flatMap(p => Seq(p.floor.toLong, p.ceil.toLong)).toSet
            val picked: Map[Long, Double] = df.select(col(c0).cast(DoubleType))
              .filter(col(c0).isNotNull)
              .rdd.map(_.getDouble(0))
              .sortBy(identity)
              .zipWithIndex()
              .filter { case (_, i) => targets.contains(i) }
              .map(_.swap)
              .collectBounded(8, "<=6 rank targets").toMap
            def q(qq: Double): Double = {
              val p = qq * (n - 1)
              val lo = p.floor.toLong; val hi = p.ceil.toLong
              if (hi == lo) picked(lo)
              else (hi - p) * picked(lo) + (p - lo) * picked(hi)
            }
            (q(0.25), q(0.5), q(0.75))
          }
        // mode + n-distinct from ONE aggregation over the value-count frame
        // (a countDistinct per column in the main agg would Expand the scan
        // once per column); max count, ties to the smallest value
        // (modePerGroup semantics), the argmin rides min_by so no
        // single-task window
        val (mode, nDistinct) =
          if (nv == 0) (Double.NaN, 0L)
          else {
            val m = df.filter(col(c0).isNotNull)
              .groupBy(col(c0).cast(DoubleType).as("__v"))
              .agg(count(lit(1)).as("__n"))
              .agg(min_by(col("__v"), struct(-col("__n"), col("__v"))).as("m"),
                count(lit(1)).as("nd"))
              .collectBounded(1, "one-row mode readout")(0)
            (m.getDouble(0), m.getLong(1))
          }
        val (first, last) = orderCol match {
          case Some(_) => (g("first"), g("last"))
          case None =>
            val i = cols.indexOf(c0)
            def p(r: org.apache.spark.sql.Row): Double =
              if (r == null || r.isNullAt(i)) Double.NaN else r.getDouble(i)
            (p(posFirst), p(posLast))
        }
        (c0, dtypes(c0), nv, row.getLong(row.fieldIndex(s"${c0}__nmissing")),
          g("min"), q1, mu, mode, med, q3, g("max"), stddev, skew,
          nDistinct, first, last)
      }
    }
    val out =
      try Await.result(Future.sequence(futures), Duration.Inf)
      finally pool.shutdown()
    out.toDF("column", "datatype", "n_valid", "n_missing", "min", "q1",
      "mean", "mode", "median", "q3", "max", "stddev", "skew", "n_distinct",
      "first", "last")
  }

  /** Categorical descriptive stats — the reference's non-numeric
    * descriptive-stats branch (dataset_api.clj:1362-1375: :mode, :n-values,
    * :values top-N, :histogram), row-shaped for engine-independent
    * comparison: one row per (column, value) among each column's top
    * `nValues` by (count desc, value asc), with rank, count, and the
    * column's total distinct count. Mode = the rank-1 row.
    *
    * Scale shape: per column one value-count aggregation, then the top-N by
    * rank via TakeOrdered (no global window); columns are independent jobs
    * submitted concurrently. */
  def categoricalStats(df: DataFrame, cols: Seq[String],
                       nValues: Int = 21): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(cols.size, 8)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = cols.map { c0 =>
      Future {
        val counts = df.filter(col(c0).isNotNull)
          .groupBy(col(c0).cast(StringType).as("value"))
          .agg(count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val nDistinct = counts.count()
          counts.orderBy(col("n").desc, col("value").asc).limit(nValues)
            .collectBounded(nValues, "top-k categorical values")
            .zipWithIndex
            .map { case (r, i) =>
              (c0, i + 1, r.getString(0), r.getLong(1), nDistinct)
            }.toSeq
        } finally { counts.unpersist(); () }
      }
    }
    val rows =
      try Await.result(Future.sequence(futures), Duration.Inf).flatten
      finally pool.shutdown()
    rows.toDF("column", "rank", "value", "n", "n_values")
  }

  /** mode — most frequent value per group, deterministic (max count, ties to
    * the smallest value). Reference descriptive-stats' :mode for categorical
    * columns. One count aggregation + one window, no collect. */
  def modePerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__n").desc, col(valueCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((groupCols.map(col) :+ col(valueCol).as("mode") :+
        col("__n").as("mode_count")): _*)
  }

  /** Exact distinct + count-distinct (reductions.clj:151-208). */
  def countDistinctAgg(c: Column): Column = countDistinct(c)

  /** prob-set-cardinality (reductions.clj:210-224, DataSketches HLL) →
    * Spark's HyperLogLog++. Same contract (approximate distinct with
    * configurable error), different sketch — declared as approximate. */
  def probSetCardinality(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** prob-quantile (reductions.clj:226-252, DoublesSketch k=128 ≈1.7% rank
    * error) → percentile_approx. `exactPercentile` is the exact counterpart
    * for oracle comparison. */
  def probQuantile(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(accuracy))

  def exactPercentile(c: Column, q: Double): Column =
    percentile(c, lit(q))

  /** reservoir-dataset (reductions.clj:254-303): bounded uniform sample per
    * group in one pass — rand-keyed row_number keeps k rows per key without
    * collecting groups. */
  def reservoirPerGroup(df: DataFrame, keys: Seq[String], k: Int,
                        seed: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(rand(seed))
    df.withColumn("__r", row_number().over(w)).filter(col("__r") <= k).drop("__r")
  }

  /** Deterministic reservoir: the per-group "random" order is
    * md5(seed # key # tiebreak values) — value-derived like
    * hashSampleRows, so the sampled ROWS (not just their counts) are
    * identical on any cluster layout, file split, or engine, and an
    * external engine can replay the exact selection (the q57 oracle
    * does). `tiebreak` must make (keys ++ tiebreak) row-unique for a
    * total order. Prefer this for reproducible 100 TB pipelines; use
    * [[reservoirPerGroup]] when statistical independence from row values
    * matters more than replayability. */
  def reservoirPerGroupDeterministic(df: DataFrame, keys: Seq[String], k: Int,
                                     seed: Long,
                                     tiebreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hash = md5(concat_ws("#",
      lit(seed.toString) +:
        (keys ++ tiebreak).map(c => col(c).cast(StringType)): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(hash.asc +: tiebreak.map(col(_).asc): _*)
    df.withColumn("__r", row_number().over(w)).filter(col("__r") <= k).drop("__r")
  }

  /** EXACT heavy hitters at scale, two passes, no full-cardinality shuffle:
    * pass 1 streams the column into a mergeable frequent-items sketch
    * (Misra-Gries family, O(maxMapSize) memory per task — see
    * Sketches.FreqSketchAgg), whose NO_FALSE_NEGATIVES contract guarantees
    * the candidate set is COMPLETE for any threshold above the sketch's max
    * error; pass 2 exact-counts only those candidates (broadcast isin
    * filter → tiny groupBy). Output is exact — items with count ≥ ⌈phi·n⌉ —
    * so unlike a raw sketch readout it is oracle-checkable.
    *
    * At 100 TB: a vocabulary-sized groupBy (billions of distinct tokens)
    * shuffles everything; this shuffles only rows matching ~10^3 candidate
    * items. Throws if phi is too small for the sketch's guarantee
    * (phi·n ≤ maxError) — raise lgMaxMapSize rather than silently
    * returning an incomplete answer. */
  def heavyHittersExact(df: DataFrame, c: String, phi: Double,
                        lgMaxMapSize: Int = 12): DataFrame = {
    graft.functions.Sketches.register(df.sparkSession)
    val bytes = df.select(expr(s"freq_sketch(`$c`, $lgMaxMapSize)").as("sk"))
      .collectBounded(1, "O(k) sketch readout")(0).getAs[Array[Byte]](0)
    val (items, n, maxErr) = graft.functions.Sketches.freqItems(bytes)
    val thr = math.ceil(phi * n).toLong
    require(thr > maxErr,
      s"phi=$phi gives threshold $thr <= sketch max error $maxErr; " +
        s"raise lgMaxMapSize (=$lgMaxMapSize) for a complete candidate set")
    val candidates = items.collect { case (it, _, _, ub) if ub >= thr => it }
    // Sketch items are stringified (freq_sketch casts its child to string),
    // so recount with the SAME cast — comparing raw col(c) against string
    // candidates would miss every row for date/timestamp/numeric columns.
    df.filter(col(c).cast("string").isin(candidates: _*))
      .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
  }

  /** Kahan-compensated double sum as a typed Aggregator — bit-level parity
    * with the reference's ham-fisted `Sum` (reductions.clj:4-7,107-113) when
    * inputs arrive in the same order; used where decimal routing is not
    * possible (unbounded-scale doubles). */
  /** Neumaier (Kahan–Babuška) compensated sum: tracks the LOST low-order
    * part of every add, including the case where the addend is larger than
    * the running sum (which defeats classic Kahan — e.g. 1e16 + 1 − 1e16).
    * Buffer = (sum, compensation); result = sum + compensation. */
  class KahanSum extends Aggregator[Double, (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    private def add(s: Double, c: Double, x: Double): (Double, Double) = {
      val t = s + x
      val c2 =
        if (math.abs(s) >= math.abs(x)) c + ((s - t) + x)
        else c + ((x - t) + s)
      (t, c2)
    }
    def reduce(b: (Double, Double), x: Double): (Double, Double) =
      add(b._1, b._2, x)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
      val (s, c) = add(a._1, a._2 + b._2, b._1)
      (s, c)
    }
    def finish(r: (Double, Double)): Double = r._1 + r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Null-safe Kahan sum (nulls contribute 0, like SQL SUM skipping them;
    * the Double encoder would otherwise throw on null input). */
  def kahanSum(c: Column): Column =
    udaf(new KahanSum(), Encoders.scalaDouble).apply(coalesce(c, lit(0.0)))

  /** INCREMENTAL AGGREGATION state: per-key mergeable partials
    * (count + exact decimal sum) that can be written to storage and
    * later combined with more partials WITHOUT rescanning history — the
    * standing daily-rollup pattern at 100 TB (each day aggregates only
    * its own data; the merge touches O(keys) rows). The partial sum
    * stays a Decimal(38,scale) through the round-trip so merging is
    * exact; [[mergeAggPartials]] finishes to the same (n, sum) the
    * single-pass aggregation produces — bit-for-bit, because decimal
    * addition is associative. */
  def aggPartials(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  scale: Int = 4): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(col(valueCol)).as("__pn"),
        sum(col(valueCol).cast(DecimalType(38, scale))).as("__ps"))

  /** Merge any number of [[aggPartials]] frames into final
    * (keys…, n, sum) — one keyed aggregation over O(keys·parts) rows. */
  def mergeAggPartials(parts: Seq[DataFrame], keyCols: Seq[String],
                       outSum: String = "sum"): DataFrame = {
    require(parts.nonEmpty)
    parts.reduce(_.unionByName(_))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__pn")).as("n"),
        sum(col("__ps")).cast(DoubleType).as(outSum))
  }

  /** GLOBAL percent-rank of a numeric column — SQL
    * percent_rank() = (min_rank − 1)/(n − 1) — WITHOUT the global
    * single-task window Spark's `percent_rank().over(Window.orderBy)`
    * plans. Min-ranks come from the range-partitioned per-value count
    * frame (prefix counts via O(partitions) offsets — the rank-table
    * shape); the result joins back on the value. Returns the input plus
    * `outName`. Null/NaN values get a null rank. */
  def globalPercentRank(df: DataFrame, valueCol: String,
                        outName: String = "pct_rank"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val x = col(valueCol).cast(DoubleType)
    val grouped = df
      .filter(x.isNotNull && !isnan(x))
      .groupBy(x.as("__v")).agg(count(lit(1)).as("__c"))
      .as[(Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = grouped
      .repartitionByRange(parts, col("__v"))
      .sortWithinPartitions(col("__v"))
      .as[(Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sorted.count()
    val partTotals = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
    }.collectBounded(1 << 20, "O(P) partition totals").sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val n = partTotals.sum
    val bcOff = spark.sparkContext.broadcast(offsets)
    val ranks = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var before = bcOff.value(pid)
      it.map { case (v, c) =>
        val minRank = before + 1
        before += c
        (v, if (n <= 1) 0.0
            else (minRank - 1).toDouble / (n - 1).toDouble)
      }
    }.toDF("__v", outName)
    val out = df.join(ranks, x === col("__v"), "left").drop("__v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    sorted.unpersist(); grouped.unpersist()
    out
  }

  /** Fused MULTI-METRIC [[globalPercentRank]]: ONE range-partitioned rank
    * table keyed by (tag, value) serves every metric of a melted
    * (tag, value) frame — one keyed count + one repartitionByRange + one
    * O(partitions·tags) offset readout, where calling the single-metric
    * form per metric pays the whole persist/count/offset job chain k
    * times (q234 RFM: 3 chains → 1). Returns the per-(tag, value) rank
    * table `(tagCol, valueCol, outName)` with
    * percent_rank = (min_rank − 1)/(n_tag − 1); callers join it back on
    * (tag, value) — null/NaN values are absent (left-join → null rank).
    * Ranks and ties are bit-identical to [[globalPercentRank]] run per
    * metric: the same before/(n−1) double division. */
  def globalPercentRankTable(df: DataFrame, tagCol: String, valueCol: String,
                             outName: String = "pct_rank"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val x = col(valueCol).cast(DoubleType)
    val sorted = df
      .filter(col(tagCol).isNotNull && x.isNotNull && !isnan(x))
      .groupBy(col(tagCol).cast(StringType).as("__t"), x.as("__v"))
      .agg(count(lit(1)).as("__c"))
      .repartitionByRange(parts, col("__t"), col("__v"))
      .sortWithinPartitions(col("__t"), col("__v"))
      .as[(String, Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sorted.count()
    // O(partitions·tags) readout — range partitioning on (tag, value)
    // keeps each tag's values globally ordered across partitions
    val partTag = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { case (t, _, c) => m.update(t, m.getOrElse(t, 0L) + c) }
      m.iterator.map { case (t, s) => (pid, t, s) }.toList.iterator
    }.collectBounded(1 << 20, "O(P*tags) partition totals")
    val totals: Map[String, Long] =
      partTag.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val offsets: Map[(Int, String), Long] =
      partTag.groupBy(_._2).flatMap { case (t, xs) =>
        var acc = 0L
        xs.sortBy(_._1).map { case (pid, _, s) =>
          val o = ((pid, t), acc); acc += s; o
        }
      }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTot = spark.sparkContext.broadcast(totals)
    val ranks = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val before = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { case (t, v, c) =>
        val b = before.getOrElse(t, bcOff.value.getOrElse((pid, t), 0L))
        val n = bcTot.value(t)
        before.update(t, b + c)
        (t, v, if (n <= 1) 0.0 else b.toDouble / (n - 1).toDouble)
      }
    }.toDF(tagCol, valueCol, outName)
    // materialize before releasing the lineage source
    val out = ranks
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    sorted.unpersist()
    out
  }

  /** Equi-width histogram of a numeric column: `bins` equal-width buckets
    * over [min, max], bin i = ⌊(x − min)/w⌋ clamped so x = max lands in
    * the last bin. Returns (bin, lo, hi, n) for ALL bins including empty
    * ones. Fit = one O(1) min/max aggregate broadcast back; assignment is
    * pure codegen arithmetic; one keyed count. Complete-case. Constant
    * columns get one bin holding everything. */
  def histogramEqWidth(df: DataFrame, valueCol: String, bins: Int)
      : DataFrame = {
    require(bins >= 1, "bins must be ≥ 1")
    val x = col(valueCol).cast(DoubleType)
    val base = df.select(x.as("__x"))
      .filter(col("__x").isNotNull && !isnan(col("__x")))
    val mm = base.agg(min(col("__x")).as("__mn"), max(col("__x")).as("__mx"))
    val w = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val counts = base.crossJoin(broadcast(mm))
      .select(least(
        floor((col("__x") - col("__mn")) / w).cast(IntegerType),
        lit(bins - 1)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val shell = df.sparkSession.range(bins)
      .select(col("id").cast(IntegerType).as("bin"))
    shell.join(counts, Seq("bin"), "left").crossJoin(broadcast(mm))
      .select(col("bin"),
        (col("__mn") + col("bin").cast(DoubleType) * w).as("lo"),
        (col("__mn") + (col("bin") + 1).cast(DoubleType) * w).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bin"))
  }

  /** ABC / Pareto classification: rank keys by their exact integer value
    * sum (descending, key-tiebroken), accumulate the cumulative total,
    * and label A while the cumulative share BEFORE the key is < aPct%,
    * B while < bPct%, else C — all threshold tests are integer
    * cross-multiplications (no float share ever compared). Returns
    * (key, value, cum, abc_class) where value/cum are the scaled integer
    * sums (scale-`digits` fixed point).
    *
    * Plan: one keyed aggregation (the only data-sized pass), then the
    * ksTest-shaped range-partitioned prefix sum over the AGGREGATED frame
    * — O(partitions) totals to the driver, no global window, so the
    * classification scales to vocabulary-sized key sets. */
  def abcClassification(df: DataFrame, keyCol: String, valueCol: String,
                        digits: Int = 4, aPct: Int = 80, bPct: Int = 95)
      : DataFrame = {
    require(aPct >= 1 && bPct > aPct && bPct <= 100)
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val p = math.pow(10, digits)
    val agg = df
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast(DoubleType)))
      .groupBy(col(keyCol).cast(StringType).as("__k"))
      .agg(call_function("graft_sum128",
        floor(col(valueCol).cast(DoubleType) * lit(p)).cast(LongType), lit(0))
        .cast(DecimalType(38, 0)).cast(LongType).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = agg
      .repartitionByRange(parts, col("__v").desc, col("__k").asc)
      .sortWithinPartitions(col("__v").desc, col("__k").asc)
      .as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sorted.count()
    val partTotals = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
    }.collectBounded(1 << 20, "O(P) partition totals").sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val total = partTotals.sum
    val bcOff = spark.sparkContext.broadcast(offsets)
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bcOff.value(pid)
      it.map { case (k, v) =>
        val before = cum
        cum += v
        // integer threshold tests: before·100 < pct·total
        val cls =
          if (before * 100L < aPct.toLong * total) "A"
          else if (before * 100L < bPct.toLong * total) "B"
          else "C"
        (k, v, cum, cls)
      }
    }.toDF("__k", "value", "cum", "abc_class")
      .withColumnRenamed("__k", keyCol)
    val ret = out.cache()
    ret.count()
    sorted.unpersist(); agg.unpersist()
    ret
  }

  /** Weighted quantiles per group: for each level of `groupCol`, the
    * smallest value v with cumWeight(≤ v) ≥ q·totalWeight — the
    * lower-weighted-rank pick, tested as the exact integer
    * cross-multiplication den·cum ≥ num·W (quantile q = num/den; no float
    * share is ever compared), so the picked values are actual data values
    * and the whole result replays bit-for-bit in SQL. Weights must be
    * non-negative integers (cast to long). Returns
    * (groupCol [string], total_w, <one column per named quantile>).
    *
    * Plan: one keyed (group, value) weight aggregation — the only
    * data-sized pass — then the [[abcClassification]]-shaped
    * range-partitioned prefix sum over the AGGREGATED frame ordered by
    * (group, value): O(partitions) totals to the driver, no global or
    * per-group data-sized window. Per-group offsets come from the tiny
    * per-group totals frame (O(groups) rows, stratifiedRank precedent).
    * A 10⁹-row group costs one range shuffle of its distinct values. */
  def weightedQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: Column,
      qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, num, den) =>
      den > 0 && num > 0 && num <= den })
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val perVal = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast(DoubleType)) && weightCol.cast(LongType) > 0L)
      .groupBy(col(groupCol).cast(StringType).as("__g"),
        col(valueCol).cast(DoubleType).as("__x"))
      .agg(sum(weightCol.cast(LongType)).as("__w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = perVal
      .repartitionByRange(parts, col("__g").asc, col("__x").asc)
      .sortWithinPartitions(col("__g").asc, col("__x").asc)
      .as[(String, Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sorted.count()
    val partTotals = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(s += _._3); Iterator((pid, s))
    }.collectBounded(1 << 20, "O(P) partition totals").sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bcOff = spark.sparkContext.broadcast(offsets)
    val cum = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = bcOff.value(pid)
      it.map { case (g, x, w) => c += w; (g, x, w, c) }
    }.toDF("__g", "__x", "__w", "__cum")
    // per-group totals + global cumulative offset BEFORE each group —
    // O(groups) rows, the one unpartitioned window is bounded by construction
    val perGroup = perVal.groupBy(col("__g")).agg(sum(col("__w")).as("__tw"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__g"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = perGroup.withColumn("__goff",
      coalesce(sum(col("__tw")).over(w), lit(0L)))
    val joined = cum.join(broadcast(offs), "__g")
      .withColumn("__cin", col("__cum") - col("__goff"))
    val picks = qs.map { case (name, num, den) =>
      val hit = (lit(den.toLong) * col("__cin") >= lit(num.toLong) * col("__tw")) &&
        (lit(den.toLong) * (col("__cin") - col("__w")) < lit(num.toLong) * col("__tw"))
      max(when(hit, col("__x"))).as(name)
    }
    val out = joined.groupBy(col("__g"))
      .agg(max(col("__tw")).as("total_w"), picks: _*)
      .withColumnRenamed("__g", groupCol)
    val ret = out.cache(); ret.count()
    sorted.unpersist(); perVal.unpersist()
    ret
  }

  /** MEDIAN WITH ORDER-STATISTIC CONFIDENCE INTERVAL per group: the
    * distribution-free CI (no bootstrap, no normality) — the interval
    * endpoints are the values at ranks
    * l = max(1, ⌈(n − 1.96√n)/2⌉), u = min(n, ⌈(n + 1.96√n)/2⌉ + 1),
    * the normal approximation to the binomial order-statistic bounds.
    * Returns (group, n, median, ci_lo, ci_hi). Value-at-rank is
    * tie-permutation-invariant, so the [[graft.ops.TableOps.stratifiedRank]]
    * build (range-partitioned, no per-group sort window) replays in SQL
    * row_number form exactly. One rank pass + one keyed aggregation. */
  def medianWithCI(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    import graft.ops.TableOps._
    val vals = df
      .select(col(groupCol).as("__g"),
        col(valueCol).cast(DoubleType).as("__x"))
      .filter(col("__g").isNotNull && col("__x").isNotNull &&
        !isnan(col("__x")))
    val ranked = vals.stratifiedRank("__g", Seq(col("__x")), "__r", "__n")
    val nD = col("__n").cast(DoubleType)
    val loR = greatest(lit(1L),
      ceil((nD - lit(1.96) * sqrt(nD)) / lit(2.0)).cast(LongType))
    val hiR = least(col("__n"),
      ceil((nD + lit(1.96) * sqrt(nD)) / lit(2.0)).cast(LongType) + 1L)
    val zero = col("__r") - 1
    val pM = lit(0.5) * (col("__n") - 1).cast(DoubleType)
    val keep = zero === floor(pM).cast(LongType) ||
      zero === ceil(pM).cast(LongType) ||
      col("__r") === loR || col("__r") === hiR
    val picked = ranked.filter(keep)
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("n"),
        max(when(zero === floor(pM).cast(LongType), col("__x")))
          .as("__mlo"),
        max(when(zero === ceil(pM).cast(LongType), col("__x")))
          .as("__mhi"),
        max(when(col("__r") === loR, col("__x"))).as("ci_lo"),
        max(when(col("__r") === hiR, col("__x"))).as("ci_hi"))
    val p = lit(0.5) * (col("n") - 1).cast(DoubleType)
    val lo = floor(p); val hi = ceil(p)
    picked.select(col("__g").as(groupCol), col("n"),
      when(hi === lo, col("__mlo"))
        .otherwise((hi.cast(DoubleType) - p) * col("__mlo") +
          (p - lo.cast(DoubleType)) * col("__mhi")).as("median"),
      col("ci_lo"), col("ci_hi"))
  }

  /** ECONOMIC GINI COEFFICIENT of a non-negative integer metric (cents,
    * counts), EXACT: G = Σᵢ(2i − n − 1)·x₍ᵢ₎ / (n·Σx) with i the sorted
    * position. The numerator is tie-invariant (equal values make block
    * order irrelevant), so it collapses to the per-DISTINCT-value form
    * v·(2cp + c(c+1) − c(n+1)) with p = values-before count — computed
    * from the range-partitioned distinct-value frame with O(partitions)
    * prefix offsets (the [[globalPercentRank]] shape; NO global window,
    * no data-sized single task). Block terms are exact BigIntegers
    * carried as Decimal(38,0); the final ratio is the exact integer
    * (num·10⁹) div (n·total) followed by one /1e9 so it replays
    * bit-exactly against a HUGEINT SQL mirror. Returns one
    * row (n, total, gini). */
  def giniCoefficient(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val grouped = df
      .select(col(valueCol).cast(LongType).as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= 0)
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      .as[(Long, Long)]
    val sorted = grouped
      .repartitionByRange(parts, col("__v"))
      .sortWithinPartitions(col("__v"))
      .as[(Long, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sorted.count()
    val partTotals = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L; var s = java.math.BigInteger.ZERO
      it.foreach { case (v, k) =>
        c += k
        s = s.add(java.math.BigInteger.valueOf(v)
          .multiply(java.math.BigInteger.valueOf(k)))
      }
      Iterator((pid, c, s))
    }.collectBounded(1 << 20, "O(P) partition totals").sortBy(_._1)
    val offsets = partTotals.map(_._2).scanLeft(0L)(_ + _)
    val n = partTotals.map(_._2).sum
    val total = partTotals.map(_._3)
      .foldLeft(java.math.BigInteger.ZERO)(_ add _)
    val bcOff = spark.sparkContext.broadcast(offsets)
    val terms = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var p = bcOff.value(pid)
      it.map { case (v, c) =>
        // Σ_{i=p+1..p+c}(2i − n − 1)·v = v·(2cp + c(c+1) − c(n+1))
        val cB = java.math.BigInteger.valueOf(c)
        val w = java.math.BigInteger.valueOf(2L * p).multiply(cB)
          .add(cB.multiply(java.math.BigInteger.valueOf(c + 1)))
          .subtract(cB.multiply(java.math.BigInteger.valueOf(n + 1)))
        p += c
        // ship as string: the default java-BigDecimal encoder is
        // (38,18) and would overflow big numerators before the cast
        java.math.BigInteger.valueOf(v).multiply(w).toString
      }
    }.toDF("__t")
    val num = terms.agg(sum(col("__t").cast(DecimalType(38, 0))).as("__num"))
    // total as BIGINT on both sides (a Decimal(38,0) column arrives in
    // pandas as object-of-Decimal from Spark parquet but float64 from
    // DuckDB — the driver's hash is dtype-sensitive); cents totals stay
    // far under 2⁶³ even at 100 TB
    val out = num.select(lit(n).as("n"),
      lit(new java.math.BigDecimal(total)).cast(LongType).as("total"),
      // exact integer ratio (num·10⁹) div (n·total) then ONE /1e9 — the
      // direct num/(n·total) double division rounds total → double in an
      // engine-specific order and diverged from DuckDB's HUGEINT replay
      // in the last ulp
      when(lit(n) > 0 && lit(total.signum()) > 0,
        expr("CAST((__num * CAST(1000000000 AS DECIMAL(38,0))) div " +
          s"(CAST($n AS DECIMAL(38,0)) * " +
          s"CAST('${total.toString}' AS DECIMAL(38,0))) AS DOUBLE)") /
          lit(1e9))
        .as("gini"))
    val ret = out.cache(); ret.count()
    sorted.unpersist()
    ret
  }

  /** PORTABLE COUNT-MIN SKETCH frequency estimates: the d×w counter
    * table built from md5-derived row hashes (`h60(d || '|' || key) mod
    * w` — deterministic on any engine, like the KMV/MinHash family), and
    * point estimates min_d(cell) for `probes`. Overestimates only —
    * est ≥ exact always; the sketch table is O(d·w) no matter the key
    * cardinality, which is the whole point at 100 TB (billions of keys
    * → 4·2¹⁶ counters). Returns (key, est, exact) per probe key, exact
    * counted in the same pass for the error audit.
    *
    * Plan: one explode(d) + keyed count builds the table (the data-sized
    * pass); probes broadcast against the O(d·w) table. */
  def cmsFrequency(df: DataFrame, keyCol: String, probes: Seq[String],
                   depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    def cell(d: Column, key: Column): Column =
      pmod(graft.llm.TextDedup.h60(
        concat(d.cast(StringType), lit("|"), key.cast(StringType))),
        lit(width.toLong))
    val keyed = df.select(col(keyCol).cast(StringType).as("__k"))
      .filter(col("__k").isNotNull)
    val table = keyed
      .select(explode(array((0 until depth).map(lit): _*)).as("__d"),
        col("__k"))
      .groupBy(col("__d"), cell(col("__d"), col("__k")).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val probeDf = probes.toDF("key")
      .select(col("key"),
        explode(array((0 until depth).map(lit): _*)).as("__d"))
      .withColumn("__b", cell(col("__d"), col("key")))
    val est = probeDf.join(table, Seq("__d", "__b"), "left")
      .na.fill(0L, Seq("__c"))
      .groupBy(col("key")).agg(min(col("__c")).as("est"))
    val exact = keyed.groupBy(col("__k").as("key"))
      .agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("key"), "left").na.fill(0L, Seq("exact"))
      .orderBy(col("key"))
  }
}
