package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Bounded._

/** Modelling / feature-engineering surface (reference SURVEY §2.9):
  * fit/transform objects — std-scale, min-max, PCA, train/test split, k-fold —
  * mirroring the reference's PDatasetTransform contract
  * (reference src/tech/v3/dataset/protocols.clj:68-70, math.clj:235-344,
  * modelling.clj:26-260).
  *
  * Fit = one aggregation job producing a tiny stats row; transform = pure
  * column expressions parameterized by it (broadcast-free: the stats ride in
  * the plan as literals). Deterministic via exact scaled-integer sums.
  */
object Ml {

  import Reductions.isum

  /** The PDatasetTransform contract (reference protocols.clj:68-70): a
    * fitted object that maps datasets to datasets. Every fitted model here
    * implements it, so stages compose into [[Pipeline]]s the way the
    * reference's metamorph pipelines thread fitted state. */
  trait DatasetTransform {
    def transform(df: DataFrame): DataFrame
  }

  /** Fitted pipeline: stages applied in order (itself a stage). */
  case class FittedPipeline(stages: Seq[DatasetTransform]) extends DatasetTransform {
    def transform(df: DataFrame): DataFrame =
      stages.foldLeft(df)((d, s) => s.transform(d))
  }

  /** metamorph-style pipeline fit (reference metamorph_api.clj): each
    * fitter sees the OUTPUT of the previously fitted stages — so a PCA
    * stage fits on scaled columns, a classifier on projected ones — and
    * the fitted stages replay as one pure transform on any frame. */
  object Pipeline {
    def fit(df: DataFrame,
            fitters: Seq[DataFrame => DatasetTransform]): FittedPipeline = {
      var cur = df
      val fitted = fitters.map { f =>
        val stage = f(cur)
        cur = stage.transform(cur)
        stage
      }
      FittedPipeline(fitted)
    }
  }

  /** Fitted standard-scaler: (mean, stddev_pop) per column, exact. */
  case class ScalerModel(stats: Map[String, (Double, Double)]) extends DatasetTransform {
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (mu, sigma))) =>
        d.withColumn(s"${c}_z", (col(c) - lit(mu)) / lit(if (sigma == 0) 1.0 else sigma))
      }
  }

  /** squareScale: per-column x² floor-scale (default 4 keeps small-magnitude
    * data meaningful; drop to 2 for columns whose squares reach ~1e10 — see
    * Reductions.descriptiveStats). Variance clamped at 0 so numerically
    * degenerate columns give sd=0 (and the transform's sd==0 guard), not NaN. */
  def fitStandardScaler(df: DataFrame, cols: Seq[String],
                        squareScale: Map[String, Int] = Map.empty): ScalerModel = {
    val aggs = cols.flatMap { c0 =>
      val c = col(c0)
      val n = count(c).cast(DoubleType)
      val sx = isum(c, 4)
      val sxx = isum(c * c, squareScale.getOrElse(c0, 4))
      Seq((sx / count(c)).as(s"${c0}__mu"),
        sqrt(greatest((sxx - sx * sx / n) / n, lit(0.0))).as(s"${c0}__sd"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collectBounded(1, "one-row fit agg")(0)
    ScalerModel(cols.map { c =>
      c -> (row.getDouble(row.fieldIndex(s"${c}__mu")),
        row.getDouble(row.fieldIndex(s"${c}__sd")))
    }.toMap)
  }

  /** WINSORIZE at global [pLow, pHigh] percentile cutoffs — the standard
    * robust-preprocessing clip for heavy-tailed features (fares, latencies,
    * token counts). The fit is ONE tiny aggregation (2·|cols| doubles)
    * broadcast back; the clip itself is codegen least/greatest. Spark's
    * exact interpolating `percentile` matches DuckDB `quantile_cont`
    * bit-for-bit (the q21 precedent), so the whole op replays in SQL.
    * Nulls pass through (least/greatest would otherwise absorb them into
    * the cutoff). */
  def winsorize(df: DataFrame, cols: Seq[String],
                pLow: Double = 0.01, pHigh: Double = 0.99): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh)
    // fit = distributed rank-selection per column (the former single
    // `percentile` aggregation buffered every value in the agg buffer —
    // an executor OOM at scale and 6s at sf0.1; the rank pick is two
    // small jobs per column and bit-identical)
    cols.foldLeft(df) { (d, c) =>
      val Seq(lo, hi) = exactQuantilesRankPick(df, c, Seq(pLow, pHigh))
      d.withColumn(c, when(col(c).isNotNull,
        least(greatest(col(c).cast(DoubleType), lit(lo)), lit(hi))))
    }
  }

  /** Fitted robust scaler: (x − median) / IQR per column — the outlier-proof
    * sibling of the standard scaler. Zero-IQR (constant-ish) columns map to
    * x − median (divisor 1), mirroring fitMinMax's degenerate-span rule. */
  case class RobustModel(stats: Map[String, (Double, Double)]) extends DatasetTransform {
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (med, iqr))) =>
        val span = if (iqr == 0.0) 1.0 else iqr
        d.withColumn(s"${c}_rs", (col(c) - lit(med)) / lit(span))
      }
  }

  def fitRobustScaler(df: DataFrame, cols: Seq[String]): RobustModel = {
    // rank-selection fit (see winsorize) — med/q1/q3 from one sort pass
    // per column, iqr = q3 − q1 in the same op order as the SQL mirror
    RobustModel(cols.map { c =>
      val Seq(med, q1, q3) =
        exactQuantilesRankPick(df, c, Seq(0.5, 0.25, 0.75))
      c -> (med, q3 - q1)
    }.toMap)
  }

  /** Fitted min-max scaler to [0,1]. */
  case class MinMaxModel(ranges: Map[String, (Double, Double)]) extends DatasetTransform {
    def transform(df: DataFrame): DataFrame =
      ranges.foldLeft(df) { case (d, (c, (lo, hi))) =>
        val span = if (hi == lo) 1.0 else hi - lo
        d.withColumn(s"${c}_mm", (col(c) - lit(lo)) / lit(span))
      }
  }

  def fitMinMax(df: DataFrame, cols: Seq[String]): MinMaxModel = {
    val aggs = cols.flatMap { c0 =>
      Seq(min(col(c0)).cast(DoubleType).as(s"${c0}__lo"),
        max(col(c0)).cast(DoubleType).as(s"${c0}__hi"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collectBounded(1, "one-row fit agg")(0)
    MinMaxModel(cols.map { c =>
      c -> (row.getDouble(row.fieldIndex(s"${c}__lo")),
        row.getDouble(row.fieldIndex(s"${c}__hi")))
    }.toMap)
  }

  /** Fitted equal-frequency discretizer: k quantile bins per column.
    * `cuts(c)` holds the k−1 interior cutpoints (exact interpolated
    * percentiles at i/k); transform assigns bin = 1 + Σ_i [x > cut_i] —
    * a codegen CASE chain, ties at a cutpoint go to the lower bin, nulls
    * stay null. The inverse of one-hot-style bucketing skew: every bin
    * gets ≈ n/k rows regardless of the distribution's shape. */
  case class QuantileBinModel(cuts: Map[String, Seq[Double]]) extends DatasetTransform {
    def transform(df: DataFrame): DataFrame =
      cuts.foldLeft(df) { case (d, (c, cs)) =>
        val x = col(c).cast(DoubleType)
        d.withColumn(s"${c}_bin", when(x.isNotNull,
          cs.map(ct => when(x > lit(ct), 1).otherwise(0)).reduce(_ + _) + 1))
      }
  }

  /** Quantile-binner fit WITHOUT Spark's exact `percentile` (whose agg
    * buffer holds every value — an executor OOM at 100 TB): per column,
    * one count aggregate, then ONE distributed range-partitioned sort +
    * `zipWithIndex` filter picks the ≤ 2(k−1) order statistics the
    * interpolation needs (the briefStats shape) — O(k) scalars reach the
    * driver. Interpolation reproduces `percentile`'s
    * `(hi−p)·v_lo + (p−lo)·v_hi` at p = q·(n−1) bit-for-bit, which DuckDB's
    * `quantile_cont` agrees with on these inputs (q106/q147 precedent). */
  /** Exact interpolated quantiles of one column by distributed
    * rank-selection (count + range sort + zipWithIndex pick of the
    * ≤ 2·|qs| needed order statistics — O(qs) scalars to the driver, no
    * O(n) agg buffer). Reproduces Spark `percentile` / DuckDB
    * `quantile_cont` bit-for-bit (q106 precedent). Empty input → NaNs. */
  private[graft] def exactQuantilesRankPick(df: DataFrame, c0: String,
                                            qs: Seq[Double]): Seq[Double] = {
    // r19: the filtered column is scanned twice (count, then the range
    // sort) — cache it for the pair; and give the sort the session's
    // shuffle width explicitly (sortBy inherits the parent's partition
    // count, which for a single-row-group parquet scan is ~1 real task —
    // the 600k-row sort at sf0.1 ran effectively single-core).
    val vals = df.select(col(c0).cast(DoubleType))
      .filter(col(c0).isNotNull && !isnan(col(c0).cast(DoubleType)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val n = vals.count()
      if (n == 0) qs.map(_ => Double.NaN)
      else {
        val targets: Set[Long] = qs.flatMap { q =>
          val p = q * (n - 1); Seq(p.floor.toLong, p.ceil.toLong)
        }.toSet
        val parts = df.sparkSession.sessionState.conf.numShufflePartitions
        val picked: Map[Long, Double] = vals.rdd.map(_.getDouble(0))
          .sortBy(identity, ascending = true, numPartitions = parts)
          .zipWithIndex()
          .filter { case (_, i) => targets.contains(i) }
          .map(_.swap)
          .collectBounded(64, "O(quantile targets)").toMap
        qs.map { q =>
          val p = q * (n - 1)
          val lo = p.floor.toLong; val hi = p.ceil.toLong
          if (hi == lo) picked(lo)
          else (hi - p) * picked(lo) + (p - lo) * picked(hi)
        }
      }
    } finally { vals.unpersist(); () }
  }

  /** QUANTILE NORMALIZATION across groups — the cross-source curation
    * primitive: each group's value distribution is mapped onto the POOLED
    * distribution, so one global threshold afterwards treats every source
    * fairly (a quality score of "top 10%" means top 10% *within* CommonCrawl
    * and *within* arXiv, not whatever the raw scales happened to be). The
    * sklearn-QuantileTransformer shape: within-group empirical CDF position
    * → pooled quantile via a k-point interpolation grid.
    *
    * Determinism: the within-group position uses the MAX rank of a tied
    * value block ((count of rows ≤ x) − 1)/(n − 1) — partition-invariant,
    * unlike per-row tie ranks; singleton groups map to p = 0.5. The pooled
    * grid is the exact rank-selection quantile fit (== quantile_cont, the
    * q154 precedent), interpolated with the same (hi−t)·lo + (t−lo)·hi
    * two-product form as the fit itself; t landing on a grid point takes
    * the point value exactly.
    *
    * Scale: one range-sort rank pass + one (group, value) aggregation +
    * one join back to rows — all keyed, no per-group window over row-sized
    * partitions (a 10 TB source is NOT one window partition); the grid is
    * O(k) literals compiled into codegen. Appends `<valueCol>_qn`; rows
    * with null/NaN value or null group get null. */
  def quantileNormalizeByGroup(df: DataFrame, groupCol: String,
                               valueCol: String, gridK: Int = 21)
      : DataFrame = {
    require(gridK >= 2 && gridK <= 1001, s"gridK=$gridK out of [2, 1001]")
    import graft.ops.TableOps._
    val vals = df.select(col(groupCol).as("__g"),
        col(valueCol).cast(DoubleType).as("__x"))
      .filter(col("__g").isNotNull && col("__x").isNotNull &&
        !isnan(col("__x")))
    // pooled grid over exactly the rows being normalized (null-group rows
    // are excluded from the pool, matching their null output)
    val grid = exactQuantilesRankPick(vals, "__x",
      (0 until gridK).map(_.toDouble / (gridK - 1)))
    val gridArr = array(grid.map(lit): _*)
    val ecdf = vals.stratifiedRank("__g", Seq(col("__x")), "__r", "__n")
      .groupBy(col("__g"), col("__x"))
      .agg(max(col("__r")).as("__r"), max(col("__n")).as("__n"))
    val p = when(col("__n") === 1, lit(0.5))
      .otherwise((col("__r") - 1).cast(DoubleType) /
        (col("__n") - 1).cast(DoubleType))
    val t = p * lit((gridK - 1).toDouble)
    val lo = floor(t).cast(IntegerType)
    val hi = ceil(t).cast(IntegerType)
    val glo = element_at(gridArr, lo + 1)
    val ghi = element_at(gridArr, hi + 1)
    val qn = when(lo === hi, glo)
      .otherwise((hi.cast(DoubleType) - t) * glo +
        (t - lo.cast(DoubleType)) * ghi)
    val mapped = ecdf.select(col("__g"), col("__x"),
      qn.as(s"${valueCol}_qn"))
    df.join(mapped,
      col(groupCol) === col("__g") &&
        col(valueCol).cast(DoubleType) === col("__x"), "left")
      .drop("__g", "__x")
  }

  /** MURPHY DECOMPOSITION of the Brier score over fixed-width forecast
    * bins — the "is my probability model honest" triple:
    *   reliability  Σ (n_k/N)(f̄_k − ō_k)²   (calibration error — lower better)
    *   resolution   Σ (n_k/N)(ō_k − ō)²     (discrimination — higher better)
    *   uncertainty  ō(1 − ō)                 (the data's own entropy floor)
    * and brier = reliability − resolution + uncertainty (the identity is
    * exact when forecasts are constant within a bin; with binned f̄ it is
    * the standard binned estimate), plus ECE — the L1 form of the same
    * per-bin gap, Σ (n_k/N)·|f̄_k − ō_k|, the headline calibration
    * scalar. `probCol` must lie in [0, 1]; bin k = min(bins, ⌊p·bins⌋+1).
    * Complete-case. Returns one row
    * (n, k_bins, reliability, resolution, ece, uncertainty, brier).
    *
    * Plan: one keyed bin aggregation (exact label counts + floor-scaled
    * forecast sums) → an O(bins) term frame, floor-scaled (10⁹) sums —
    * the q168 calibration table's quality-scalar companion. */
  def brierDecomposition(df: DataFrame, probCol: String, labelCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins=$bins out of [2, 1000]")
    val p = col(probCol).cast(DoubleType)
    val y = col(labelCol).cast(LongType)
    val clean = df.filter(p.isNotNull && !isnan(p) && y.isNotNull)
      .select(least(lit(bins), (floor(p * bins) + 1).cast(IntegerType))
          .as("__bin"),
        p.as("__p"), y.as("__y"))
    val per = clean.groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nk"),
        graft.ops.Reductions.isum(col("__p"), 9).as("__sp"),
        sum(col("__y")).as("__sy"))
    val tot = per.agg(sum(col("__nk")).as("__n"), sum(col("__sy")).as("__syt"))
    val nD = col("__n").cast(DoubleType)
    val nkD = col("__nk").cast(DoubleType)
    val fbar = col("__sp") / nkD
    val obark = col("__sy").cast(DoubleType) / nkD
    val obar = col("__syt").cast(DoubleType) / nD
    val rel = (nkD / nD) * (fbar - obark) * (fbar - obark)
    val res = (nkD / nD) * (obark - obar) * (obark - obar)
    // ECE — the headline calibration scalar: the same per-bin gap as
    // reliability but L1-weighted, Σ (n_k/N)·|f̄_k − ō_k|
    val ece = (nkD / nD) * abs(fbar - obark)
    per.crossJoin(broadcast(tot))
      .groupBy(col("__n"), col("__syt"))
      .agg(count(lit(1)).as("k_bins"),
        graft.ops.Reductions.isum(rel, 9).as("reliability"),
        graft.ops.Reductions.isum(res, 9).as("resolution"),
        graft.ops.Reductions.isum(ece, 9).as("ece"))
      .select(col("__n").as("n"), col("k_bins"),
        col("reliability"), col("resolution"), col("ece"),
        (col("__syt").cast(DoubleType) / col("__n").cast(DoubleType) *
          (lit(1.0) - col("__syt").cast(DoubleType) /
            col("__n").cast(DoubleType))).as("uncertainty"),
        (col("reliability") - col("resolution") +
          col("__syt").cast(DoubleType) / col("__n").cast(DoubleType) *
            (lit(1.0) - col("__syt").cast(DoubleType) /
              col("__n").cast(DoubleType))).as("brier"))
  }

  /** CUMULATIVE GAINS / LIFT TABLE — "if we act on the top k % by model
    * score, what share of the positives do we capture?" (the targeting
    * readout behind every campaign/triage threshold): rows band into
    * `buckets` score deciles (descending score — bucket 1 is the top),
    * then per band (n, n_pos, cum share of rows, cum share of positives,
    * lift = gain ratio). Banding rides the distributed percent-rank
    * (ties share a band, replays as SQL percent_rank); cumulative sums
    * run over the O(buckets) frame. Complete-case. Returns per bucket
    * (bucket, n, n_pos, cum_n, cum_pos, gain, lift). */
  def cumulativeGains(df: DataFrame, scoreCol: String, labelCol: String,
                      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, s"buckets=$buckets")
    import org.apache.spark.sql.expressions.Window
    val s = col(scoreCol).cast(DoubleType)
    val y = col(labelCol).cast(LongType)
    val clean = df.filter(s.isNotNull && !isnan(s) && y.isNotNull)
      .select((-s).as("__neg"), y.as("__y"))
    val banded = Reductions.globalPercentRank(clean, "__neg", "__p")
      .withColumn("bucket",
        least(lit(buckets), (floor(col("__p") * buckets) + 1).cast("int")))
    val per = banded.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val tot = per.agg(sum(col("n")).as("__tn"), sum(col("n_pos")).as("__tp"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.crossJoin(broadcast(tot))
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("bucket").cast(LongType).as("bucket"), col("n"),
        col("n_pos"), col("cum_n"), col("cum_pos"),
        when(col("__tp") > 0, col("cum_pos").cast(DoubleType) /
          col("__tp").cast(DoubleType)).as("gain"),
        when(col("__tp") > 0 && col("cum_n") > 0,
          col("cum_pos").cast(DoubleType) / col("cum_n").cast(DoubleType) /
            (col("__tp").cast(DoubleType) / col("__tn").cast(DoubleType)))
          .as("lift"))
      .orderBy(col("bucket"))
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVAL for a simple regression — the
    * distribution-free "how wide must the band be to cover 1−α of new
    * points" guarantee (Vovk et al.; the modern ML-uncertainty staple):
    * rows split by a content-derived md5 bit (deterministic, engine- and
    * partition-invariant), OLS fit on the train half from exact moment
    * sums, and q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on
    * the calibration half — an EXACT order statistic (no interpolation:
    * conformal validity needs the k-th value itself), found by
    * distributed rank selection. [ŷ ± q̂] then covers ≥ 1−α of exchangeable
    * new rows. Returns one row
    * (n_train, n_cal, slope, intercept, k_rank, q_hat).
    *
    * Plan: one aggregation (train moments) + one range-sort rank pick on
    * the calibration residuals — O(1) scalars to the driver. `splitCols`
    * must be integer-typed (their string rendering feeds md5). */
  def splitConformal(df: DataFrame, xCol: String, yCol: String,
                     splitCols: Seq[String], alpha: Double = 0.1)
      : DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha=$alpha")
    require(splitCols.nonEmpty)
    val x = col(xCol).cast(DoubleType); val y = col(yCol).cast(DoubleType)
    val side = pmod(conv(substring(md5(concat_ws("#",
      splitCols.map(col): _*)), 1, 15), 16, 10).cast(LongType), lit(2L))
    // r19: the cleaned frame feeds the train fit AND the calibration
    // residuals — un-persisted, each re-ran the md5 split over the whole
    // single-row-group scan on one core (two ~1.4 s jobs at sf0.1). A
    // deterministic key repartition spreads the hash work across the
    // session's shuffle width, and one materialized cache serves both.
    val clean = df.filter(x.isNotNull && !isnan(x) && y.isNotNull && !isnan(y))
      .repartition(col(splitCols.head))
      .select(x.as("__x"), y.as("__y"), side.as("__side"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val tr = clean.filter(col("__side") === 0L)
      .agg(count(lit(1)).as("__n"),
        Reductions.isum(col("__x"), 6).as("__sx"),
        Reductions.isum(col("__y"), 6).as("__sy"),
        Reductions.isum(col("__x") * col("__x"), 6).as("__sxx"),
        Reductions.isum(col("__x") * col("__y"), 6).as("__sxy"))
    val nD = col("__n").cast(DoubleType)
    val slopeC = (nD * col("__sxy") - col("__sx") * col("__sy")) /
      (nD * col("__sxx") - col("__sx") * col("__sx"))
    // materialize-once: the fit is 3 scalars consumed by every downstream
    // pass — left lazy, the train aggregation re-executes per consumer
    val f = tr.select(col("__n"), slopeC.as("__slope"),
        ((col("__sy") - slopeC * col("__sx")) / nD).as("__icept"))
      .collectBounded(1, "O(1) fit readout")(0)
    val nTrain = f.getLong(0)
    // an empty or constant-x train half leaves the OLS readout null
    // (0/0 in the slope) — fail with the actual contract violation
    // instead of an opaque NPE from Row.getDouble
    require(!f.isNullAt(1) && !f.isNullAt(2),
      s"splitConformal: degenerate train half (n_train=$nTrain, " +
        "x constant or empty) — the OLS fit is undefined")
    val slope = f.getDouble(1); val icept = f.getDouble(2)
    val cal = clean.filter(col("__side") === 1L)
      .select(abs(col("__y") - (lit(slope) * col("__x") + lit(icept)))
        .as("__r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCal = cal.count()
    val k = math.min(nCal, math.ceil((nCal + 1) * (1.0 - alpha)).toLong)
    val qHat: Double =
      if (nCal == 0L) Double.NaN
      else cal.rdd.map(_.getDouble(0))
        .sortBy(identity, ascending = true,
          numPartitions = df.sparkSession.sessionState.conf.numShufflePartitions)
        .zipWithIndex()
        .filter(_._2 == k - 1).map(_._1)
        .collectBounded(1, "one order statistic")(0)
    cal.unpersist()
    clean.unpersist()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((nTrain, nCal, slope, icept, k)).toDF(
        "n_train", "n_cal", "slope", "intercept", "k_rank")
      .withColumn("q_hat",
        if (qHat.isNaN) lit(null).cast(DoubleType) else lit(qHat))
  }

  def fitQuantileBinner(df: DataFrame, cols: Seq[String], k: Int)
      : QuantileBinModel = {
    require(k >= 2, s"need k ≥ 2 bins, got $k")
    val qs = (1 until k).map(_.toDouble / k)
    QuantileBinModel(cols.map { c0 =>
      val cuts = exactQuantilesRankPick(df, c0, qs)
      c0 -> (if (cuts.exists(_.isNaN)) Seq.empty[Double] else cuts)
    }.toMap)
  }

  /** Calibration/reliability table for a score against a binary label:
    * equal-frequency score deciles (via [[fitQuantileBinner]] — no
    * percentile buffer), then per-bin n, exact-sum mean score, and
    * positive fraction. The plot every classifier eval draws; also the
    * quality-score audit for curation filters ("does the score's top
    * decile actually contain the good documents?"). One fit pass + one
    * keyed aggregation. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      k: Int = 10): DataFrame = {
    val m = fitQuantileBinner(df, Seq(scoreCol), k)
    m.transform(df)
      .filter(col(s"${scoreCol}_bin").isNotNull)
      .groupBy(col(s"${scoreCol}_bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        (isum(col(scoreCol), 6) / count(lit(1))).as("mean_score"),
        sum(col(labelCol)).as("n_pos"),
        (sum(col(labelCol)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("frac_pos"))
      .orderBy(col("bin"))
  }

  /** ISOTONIC CALIBRATION over the [[calibrationBins]] reliability table:
    * the pool-adjacent-violators fit computed by its minimax closed form
    * f(i) = max_{j≤i} min_{k≥i} Ā(j,k), with Ā(j,k) the positive rate of
    * bins j..k pooled — the standard monotone probability calibrator
    * (Zadrozny & Elkan 2002), no iteration needed. Returns one row per
    * bin: (bin, n, mean_score, frac_pos, iso_prob) with iso_prob
    * non-decreasing in bin.
    *
    * Plan: the data-sized work is all inside [[calibrationBins]]; the PAV
    * itself runs on the O(k²) segment frame (k = 10 deciles → 55 rows).
    * Segment rates come from prefix-sum DIFFS, so numerators/denominators
    * stay exact integers until one division — the whole table replays
    * bit-exactly in SQL (min/max over identical doubles is
    * order-independent). */
  def isotonicCalibration(df: DataFrame, scoreCol: String, labelCol: String,
                          k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = calibrationBins(df, scoreCol, labelCol, k)
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins.select(col("bin"), col("n"), col("n_pos"))
      .withColumn("__cn", sum(col("n")).over(wCum))
      .withColumn("__cp", sum(col("n_pos")).over(wCum))
    val js = pre.select(col("bin").as("__jb"),
      (col("__cn") - col("n")).as("__cnj"),
      (col("__cp") - col("n_pos")).as("__cpj"))
    val ks = pre.select(col("bin").as("__kb"), col("__cn").as("__cnk"),
      col("__cp").as("__cpk"))
    val segs = js.join(ks, col("__jb") <= col("__kb"))
      .select(col("__jb"), col("__kb"),
        ((col("__cpk") - col("__cpj")).cast(DoubleType) /
          (col("__cnk") - col("__cnj")).cast(DoubleType)).as("__a"))
    val ids = pre.select(col("bin").as("__i"))
    val iso = segs
      .join(ids, col("__jb") <= col("__i") && col("__i") <= col("__kb"))
      .groupBy(col("__i"), col("__jb")).agg(min(col("__a")).as("__mn"))
      .groupBy(col("__i")).agg(max(col("__mn")).as("iso_prob"))
    bins.join(iso, bins("bin") === iso("__i"))
      .select(col("bin"), col("n"), col("mean_score"), col("frac_pos"),
        col("iso_prob"))
      .orderBy(col("bin"))
  }

  /** Per-group winsorize: [[winsorize]]'s clip with PER-GROUP percentile
    * cutoffs from [[graft.ops.Reductions.groupQuantiles]] (no percentile
    * agg buffer, no per-group sort window) broadcast-joined back. Nulls
    * pass through. */
  def winsorizeByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       pLow: Double, pHigh: Double): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh)
    val cuts = graft.ops.Reductions.groupQuantiles(df, groupCol, valueCol,
        Seq("__lo" -> pLow, "__hi" -> pHigh))
      .select(col(groupCol), col("__lo"), col("__hi"))
    df.join(broadcast(cuts), groupCol)
      .withColumn(valueCol, when(col(valueCol).isNotNull,
        least(greatest(col(valueCol).cast(DoubleType), col("__lo")),
          col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Fitted PCA: top-k eigenvectors (rows of `components`, descending
    * eigenvalue) of the covariance — or, for the :corr method, the
    * correlation — matrix. Transform = pure column arithmetic
    * (pc_j = Σ_i v_ji·x_i, the MLlib convention: RAW values projected,
    * covariance computed about the mean; the corr method divides each
    * column by its fitted stddev first, so the projection is
    * scale-invariant) — no vector UDT, no UDF, stays in whole-stage
    * codegen. `scale` holds the per-column stddev divisors when fitted
    * with method="corr", None otherwise. */
  case class PcaModel(cols: Seq[String], components: Array[Array[Double]],
                      eigenvalues: Array[Double],
                      scale: Option[Array[Double]] = None) extends DatasetTransform {
    def transform(df: DataFrame): DataFrame =
      df.withColumn("pc", array(components.map { v =>
        cols.zip(v).zipWithIndex.map { case ((c, w), i) =>
          val x = col(c).cast(DoubleType)
          scale.fold(x * lit(w))(sd => x / lit(sd(i)) * lit(w))
        }.reduce(_ + _)
      }.toIndexedSeq: _*))
  }

  /** PCA fit from ONE exact-sum aggregation: all d means + d(d+1)/2 centered
    * co-moments in a single Int128-sum pass (deterministic across partition
    * counts — MLlib's treeAggregate covariance is float-order-dependent),
    * then a driver-side cyclic-Jacobi eigendecomposition of the tiny d×d
    * matrix (deterministic op order — see jacobiEigen; reference math.clj
    * delegates the same step to a library eigensolver). Eigenvectors are
    * sorted by descending eigenvalue with a deterministic sign convention
    * (largest-|component| entry positive, first index on ties).
    * `colScale`: per-column floor-scale for the product sums (default 4;
    * use 2 for columns whose pairwise products reach ~1e10). */
  /** Deterministic cyclic-Jacobi eigendecomposition of a symmetric d×d
    * matrix (driver-side; d = column count, so this is O(d³) on scalars, not
    * data). Fixed row-major sweep order, explicit zeroing of each annihilated
    * entry, relative-threshold skip for already-negligible entries. Every
    * rotation is a fixed IEEE-double op sequence
    * (tau → t → cos → sin → rank-2 update), so for d = 2 the whole
    * decomposition is ONE closed-form rotation that an external engine can
    * replay bit-for-bit — q48's DuckDB oracle does exactly that.
    * Replaces commons-math's EigenDecomposition (QL with implicit shifts),
    * whose op sequence is not practically mirrorable.
    * Returns (eigenvalues, eigenvector matrix with vectors as COLUMNS). */
  private[graft] def jacobiEigen(m0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = Array.tabulate(d, d)((i, j) => m0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var rotating = true
    while (rotating && sweep < 50) {
      rotating = false
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (apq != 0.0 &&
            math.abs(apq) <= 1e-15 * (math.abs(a(p)(p)) + math.abs(a(q)(q)))) {
          a(p)(q) = 0.0; a(q)(p) = 0.0 // negligible: converged for this pair
        } else if (apq != 0.0) {
          rotating = true
          val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
          val t = if (tau >= 0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
                  else 1.0 / (tau - math.sqrt(1.0 + tau * tau))
          val c = 1.0 / math.sqrt(1.0 + t * t)
          val s = t * c
          val app = a(p)(p) - t * apq
          val aqq = a(q)(q) + t * apq
          a(p)(p) = app; a(q)(q) = aqq; a(p)(q) = 0.0; a(q)(p) = 0.0
          for (r <- 0 until d if r != p && r != q) {
            val arp = a(r)(p); val arq = a(r)(q)
            a(r)(p) = c * arp - s * arq; a(p)(r) = a(r)(p)
            a(r)(q) = s * arp + c * arq; a(q)(r) = a(r)(q)
          }
          for (r <- 0 until d) {
            val vrp = v(r)(p); val vrq = v(r)(q)
            v(r)(p) = c * vrp - s * vrq
            v(r)(q) = s * vrp + c * vrq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** `method` (reference neanderthal.clj:73-150 fit-pca! options, plus the
    * correlation variant):
    *  - "cov" (default): eigen of the covariance matrix; eigenvalues are
    *    the post-projection variances.
    *  - "corr": eigen of the CORRELATION matrix — scale-invariant PCA
    *    (multiplying a column by 1000 does not change the components);
    *    transform standardizes by the fitted stddevs. The bias divisor
    *    cancels in correlations, so `covarianceBias` is irrelevant here.
    *  - "svd": same eigenvectors as "cov" (the reference notes both give
    *    an identical projection matrix); eigenvalues are reported as the
    *    SINGULAR VALUES of the mean-centered matrix, σ_i = sqrt(λ_i·divisor)
    *    — the reference's :svd readout shape.
    * `covarianceBias` = true divides by n (population — this engine's
    * historical default, pinned by the q48 oracle); false divides by n-1
    * (the reference's covariance-bias?=false default). */
  def fitPca(df: DataFrame, cols: Seq[String], k: Int,
             colScale: Map[String, Int] = Map.empty,
             method: String = "cov",
             covarianceBias: Boolean = true): PcaModel = {
    require(Set("cov", "corr", "svd")(method),
      s"pca method must be cov|corr|svd, got $method")
    val d = cols.size
    require(k >= 1 && k <= d, s"pca k must be in [1, $d], got $k")
    def scaleOf(a: String, b: String): Int =
      math.min(colScale.getOrElse(a, 4), colScale.getOrElse(b, 4))
    val pairs = for (i <- 0 until d; j <- i until d) yield (i, j)
    val aggs =
      count(lit(1)).cast(DoubleType).as("__n") +:
        (cols.map(c => isum(col(c), scaleOf(c, c)).as(s"__s_$c")) ++
          pairs.map { case (i, j) =>
            isum(col(cols(i)) * col(cols(j)), scaleOf(cols(i), cols(j)))
              .as(s"__p_${i}_$j")
          })
    val row = df.na.drop(cols).agg(aggs.head, aggs.tail: _*).collectBounded(1, "one-row moment agg")(0)
    val n = row.getDouble(row.fieldIndex("__n"))
    val divisor = if (covarianceBias) n else n - 1.0
    require(divisor > 0, s"pca needs ${if (covarianceBias) 1 else 2}+ rows")
    val s = cols.map(c => row.getDouble(row.fieldIndex(s"__s_$c"))).toArray
    val cov = Array.ofDim[Double](d, d)
    pairs.foreach { case (i, j) =>
      val p = row.getDouble(row.fieldIndex(s"__p_${i}_$j"))
      val c = (p - s(i) * s(j) / n) / divisor
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (matrix, sds) =
      if (method == "corr") {
        val sd = Array.tabulate(d)(i => math.sqrt(cov(i)(i)))
        sd.zipWithIndex.foreach { case (v, i) => require(v > 0,
          s"pca corr method: column ${cols(i)} is constant (stddev 0)") }
        val corr = Array.tabulate(d, d)((i, j) => cov(i)(j) / (sd(i) * sd(j)))
        (corr, Some(sd))
      } else (cov, None)
    val (evals, evecs) = jacobiEigen(matrix)
    val sorted = (0 until d).map(i => (evals(i),
        Array.tabulate(d)(r => evecs(r)(i))))
      .sortBy(-_._1).take(k)
    val comps = sorted.map { case (_, v) =>
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    val evalsOut = sorted.map(_._1).map { l =>
      if (method == "svd") math.sqrt(math.max(l, 0.0) * divisor) else l
    }.toArray
    PcaModel(cols, comps, evalsOut, sds)
  }

  def pcaProject(df: DataFrame, cols: Seq[String], k: Int,
                 colScale: Map[String, Int] = Map.empty): DataFrame =
    fitPca(df, cols, k, colScale).transform(df)

  /** train-test-split (reference modelling.clj:90-120) — seeded, partition-
    * parallel (randomSplit, no global shuffle). */
  def trainTestSplit(df: DataFrame, trainFraction: Double = 0.7,
                     seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(a, b) = df.randomSplit(Array(trainFraction, 1 - trainFraction), seed)
    (a, b)
  }

  /** k-fold assignment (reference modelling.clj:26-88): deterministic fold id
    * from a stable hash of the key column — reproducible on any cluster AND
    * any engine (md5 of the key's decimal string, not JVM-specific xxhash),
    * so fold assignments can be recomputed outside Spark. */
  def withFold(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.withColumn("fold",
      pmod(conv(substring(md5(col(keyCol).cast(StringType)), 1, 15), 16, 10)
        .cast(LongType), lit(k)).cast(IntegerType))

  /** EXACT stratified train/test split: within every stratum (language,
    * domain, label…), rows rank by md5(key) — a deterministic pseudo-random
    * shuffle, same device as [[trainTestSplit]]/[[withFold]] — and the first
    * ⌊n_stratum · trainFrac⌋ go to train. Unlike the hash-threshold split
    * (stratified only in expectation), the per-stratum proportions are exact
    * to the row, which is what curation recipes fixing a domain mixture
    * need.
    *
    * The per-stratum rank routes through
    * [[graft.ops.TableOps.DatasetExt.stratifiedRank]] (distributed range
    * sort + O(strata) broadcast offsets) — NOT `Window.partitionBy(stratum)`,
    * which would funnel each stratum through one task. Replayable verbatim
    * as `row_number() OVER (PARTITION BY stratum ORDER BY md5(key), key)`
    * vs ⌊count·frac⌋ in any SQL engine. */
  def stratifiedSplit(df: DataFrame, keyCol: String, strataCol: String,
                      trainFrac: Double): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1,
      s"trainFrac must be in (0,1), got $trainFrac")
    import graft.ops.TableOps.DatasetExt
    df.stratifiedRank(strataCol,
        Seq(md5(col(keyCol).cast(StringType)), col(keyCol)), "__rk", "__ns")
      .withColumn("split",
        when(col("__rk") <=
          floor(col("__ns").cast(DoubleType) * lit(trainFrac)).cast(LongType),
          lit("train")).otherwise(lit("test")))
      .drop("__rk", "__ns")
  }

  /** set-inference-target (reference modelling.clj:26): records the target
    * in column metadata, like the reference stores it on the column. */
  def setInferenceTarget(df: DataFrame, target: String): DataFrame = {
    val meta = new MetadataBuilder().putBoolean("inference-target", true).build()
    df.withColumn(target, col(target).as(target, meta))
  }

  /** probability-distributions->label-column (reference modelling.clj:225-260):
    * each row of `probCols` is a probability distribution over
    * columns-as-labels; emit the argmax column's NAME. Ties go to the FIRST
    * column in order (argops/argmax semantics); non-finite probabilities
    * raise, mirroring the reference's finite check. Pure column expressions —
    * stays in codegen, no UDF. */
  def probDistToLabel(df: DataFrame, probCols: Seq[String],
                      out: String): DataFrame = {
    val vals = array(probCols.map(c => col(c).cast(DoubleType)): _*)
    val finite = forall(vals, x =>
      !isnan(x) && abs(x) < lit(Double.PositiveInfinity) && x.isNotNull)
    val idx = array_position(vals, array_max(vals)) // 1-based FIRST max
    val names = array(probCols.map(lit(_)): _*)
    df.withColumn(out,
      when(finite, element_at(names, idx.cast(IntegerType)))
        .otherwise(raise_error(
          lit("Nan/infinite values not allowed in probability distributions"))))
  }

  /** labels (reference modelling.clj:212-222): the inference-target column
    * reverse-mapped through its fitted categorical map. The reference reads
    * the map off column metadata; here the fitted map is an explicit small
    * DataFrame (the engine's fit/transform convention — see
    * Categorical.fitLabelMap), broadcast on the inverse join. */
  def labels(df: DataFrame, labelMap: DataFrame, codeName: String): DataFrame =
    graft.Categorical.invert(df, labelMap, codeName)

  // ─── Model training / prediction (reference tribuo.clj:1-326:
  //     train-regression / predict-regression / train-classification /
  //     predict-classification / evaluate-regression). The reference
  //     delegates training to the Tribuo JVM library; here the closed-form
  //     models (linear regression, nearest-centroid classification) are
  //     native exact-sum aggregations — deterministic, partition-invariant,
  //     and SQL-replayable — and the iterative path (logistic) delegates to
  //     MLlib the way the reference delegates to Tribuo. Prediction is
  //     always pure column expressions (model parameters ride the plan as
  //     literals; whole-stage codegen, no UDF, nothing shipped per-task). ───

  /** Fitted linear model: prediction = intercept + Σᵢ coefᵢ·xᵢ, evaluated
    * left-to-right in `features` order (pinned so an external engine can
    * replay predictions bit-for-bit). */
  case class LinearModel(features: Seq[String], intercept: Double,
                         coefficients: Array[Double]) extends DatasetTransform {
    require(features.size == coefficients.length,
      s"${features.size} features but ${coefficients.length} coefficients")
    def predict(df: DataFrame, out: String = "prediction"): DataFrame =
      df.withColumn(out,
        features.zip(coefficients.toIndexedSeq).foldLeft(lit(intercept): Column) {
          case (acc, (c, w)) => acc + col(c).cast(DoubleType) * lit(w)
        })
    def transform(df: DataFrame): DataFrame = predict(df)
  }

  /** The shared simple-regression arithmetic, pinned op-for-op (the DuckDB
    * oracle mirrors this exact sequence — see q105/q110):
    * denom = n·sxx − sx·sx; slope = (n·sxy − sx·sy)/denom (0 when denom=0);
    * intercept = (sy − slope·sx)/n; sse = max(syy − intercept·sy − slope·sxy, 0);
    * sst = syy − sy·sy/n; r2 = 1 − sse/sst (0 when sst=0); rmse = √(sse/n).
    * Sums are pairwise-complete exact floor-scaled Int128 sums (isum):
    * x and x² at `xDigits`, y / x·y / y² at `yDigits`. */
  private def simpleRegressionAggs(x: String, y: String, xDigits: Int,
                                   yDigits: Int): Seq[Column] = {
    val xc = col(x).cast(DoubleType)
    val yc = col(y).cast(DoubleType)
    val both = xc.isNotNull && yc.isNotNull
    def s(c: Column, d: Int) = isum(when(both, c), d)
    Seq(
      count(when(both, lit(1))).cast(DoubleType).as("n"),
      s(xc, xDigits).as("sx"), s(yc, yDigits).as("sy"),
      s(xc * xc, xDigits).as("sxx"), s(xc * yc, yDigits).as("sxy"),
      s(yc * yc, yDigits).as("syy"))
  }

  private def simpleRegressionFinish(df: DataFrame): DataFrame = {
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxx = col("sxx"); val sxy = col("sxy"); val syy = col("syy")
    val denom = n * sxx - sx * sx
    val slope = when(denom === 0, lit(0.0))
      .otherwise((n * sxy - sx * sy) / denom)
    df.withColumn("slope", slope)
      .withColumn("intercept", (sy - col("slope") * sx) / n)
      .withColumn("sse",
        greatest(syy - col("intercept") * sy - col("slope") * sxy, lit(0.0)))
      .withColumn("sst", syy - sy * sy / n)
      .withColumn("r2",
        when(col("sst") === 0, lit(0.0)).otherwise(lit(1.0) - col("sse") / col("sst")))
      .withColumn("rmse", sqrt(col("sse") / n))
      .drop("sx", "sy", "sxx", "sxy", "syy", "sse", "sst")
  }

  /** Simple (one-feature) linear regression, closed form from ONE exact-sum
    * aggregation — the driver reads back six scalars, nothing else.
    * Reference: train-regression/predict-regression tribuo.clj:285-301. */
  def fitSimpleLinearRegression(df: DataFrame, x: String, y: String,
                                xDigits: Int = 4, yDigits: Int = 2): LinearModel = {
    val aggs = simpleRegressionAggs(x, y, xDigits, yDigits)
    val row = simpleRegressionFinish(df.agg(aggs.head, aggs.tail: _*))
      .select(col("intercept"), col("slope"), col("n")).collectBounded(1, "one-row fit readout")(0)
    require(!row.isNullAt(2) && row.getDouble(2) >= 2,
      s"fitSimpleLinearRegression needs >= 2 complete ($x, $y) rows, got " +
        (if (row.isNullAt(2)) 0 else row.getDouble(2).toLong))
    LinearModel(Seq(x), row.getDouble(0), Array(row.getDouble(1)))
  }

  /** K-FOLD CROSS-VALIDATED simple regression in ONE data pass + one
    * scoring pass: per-fold EXACT integer moment partials (floored
    * fixed-point, decimal-summed), each fold's TRAIN moments obtained by
    * SUBTRACTING its partial from the totals — the leave-one-fold-out
    * fit costs k closed forms on an O(k) frame instead of k rescans
    * (moments are associative; this is [[graft.ops.Reductions.aggPartials]]'
    * lesson applied to model fitting). The second pass broadcasts the k
    * models back and accumulates test-fold squared errors exactly.
    * Returns one row per fold: (fold, n_train, n_test, slope, intercept,
    * rmse) — deterministic on any layout and replayed add-for-add by the
    * SQL oracle. */
  def crossValidateSimpleRegression(df: DataFrame, keyCol: String,
                                    x: String, y: String, k: Int)
      : DataFrame = {
    require(k >= 2, s"need k ≥ 2 folds, got $k")
    val xC = col(x).cast(DoubleType); val yC = col(y).cast(DoubleType)
    // r19: the fold-tagged base feeds THREE consumers (per-fold moments,
    // the models broadcast, the scoring pass); un-persisted, each re-ran
    // the md5 fold hash over the whole single-row-group scan on one core
    // (three ~1.2–1.7 s jobs at sf0.1). The deterministic key repartition
    // first spreads the hash work across the session's shuffle width
    // (the scan itself cannot split — one row group), then ONE
    // materialized cache serves all three consumers.
    val base = withFold(
      df.filter(xC.isNotNull && yC.isNotNull && !isnan(xC) && !isnan(yC))
        .repartition(col(keyCol)),
      keyCol, k)
      .select(col("fold"), xC.as("__x"), yC.as("__y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    base.count()
    def fsum(c: Column, p: Double): Column =
      sum(floor(c * lit(p)).cast(DecimalType(38, 0)))
    val perFold = base.groupBy(col("fold"))
      .agg(count(lit(1)).as("__n"),
        fsum(col("__x"), 1e4).as("__sx"), fsum(col("__y"), 1e2).as("__sy"),
        fsum(col("__x") * col("__x"), 1e4).as("__sxx"),
        fsum(col("__x") * col("__y"), 1e2).as("__sxy"))
    val tot = perFold.agg(sum(col("__n")).as("__tn"),
      sum(col("__sx")).as("__tsx"), sum(col("__sy")).as("__tsy"),
      sum(col("__sxx")).as("__tsxx"), sum(col("__sxy")).as("__tsxy"))
    // train moments = totals − the fold's own partial (exact decimals)
    val nT = (col("__tn") - col("__n")).cast(DoubleType)
    def d(c: Column, p: Double) = c.cast(DoubleType) / lit(p)
    val sx = d(col("__tsx") - col("__sx"), 1e4)
    val sy = d(col("__tsy") - col("__sy"), 1e2)
    val sxx = d(col("__tsxx") - col("__sxx"), 1e4)
    val sxy = d(col("__tsxy") - col("__sxy"), 1e2)
    val vx = nT * sxx - sx * sx
    val slope = when(vx > 0.0, (nT * sxy - sx * sy) / vx)
    val models = perFold.crossJoin(broadcast(tot))
      .select(col("fold"), (col("__tn") - col("__n")).as("n_train"),
        col("__n").as("n_test"), slope.as("slope"),
        when(vx > 0.0, (sy - (nT * sxy - sx * sy) / vx * sx) / nT)
          .as("intercept"))
    val scored = base.join(broadcast(models), "fold")
      .withColumn("__e",
        col("__y") - (col("intercept") + col("slope") * col("__x")))
    val out = scored.groupBy(col("fold"), col("n_train"), col("n_test"),
        col("slope"), col("intercept"))
      .agg(Reductions.isum(col("__e") * col("__e"), 6).as("__sse"))
      .select(col("fold"), col("n_train"), col("n_test"), col("slope"),
        col("intercept"),
        sqrt(col("__sse") / col("n_test").cast(DoubleType)).as("rmse"))
      .orderBy(col("fold"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize the O(k)-row result, then release the base
    base.unpersist()
    out
  }

  /** Per-group simple linear regression WITH evaluation metrics
    * (n/slope/intercept/r2/rmse — the reference's evaluate-regression
    * surface, tribuo.clj:302-315), fully distributed: one exact-sum
    * aggregation, model + metrics materialize per group with no driver
    * round-trip. Parity-plus: the reference fits one model per call. */
  def linearRegressionByGroup(df: DataFrame, groupCols: Seq[String],
                              x: String, y: String, xDigits: Int = 4,
                              yDigits: Int = 2): DataFrame = {
    val aggs = simpleRegressionAggs(x, y, xDigits, yDigits)
    simpleRegressionFinish(
      df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** Per-group TWO-FEATURE linear regression y ~ b0 + b1·x1 + b2·x2, FULLY
    * distributed and codegen-friendly: one exact-sum aggregation builds each
    * group's normal-equation moments, and the 3×3 solve happens as pure
    * column expressions in pinned Cramer cofactor order (first-row
    * expansion, fixed parenthesization — the q112 oracle replays it
    * op-for-op). Fitting a MILLION models — one per group — costs one
    * shuffle and no driver involvement; use fitLinearRegression for a
    * single model with d > 2.
    *
    * Output: groupCols, n, intercept, slope1, slope2, r2, rmse. Degenerate
    * groups (singular normal matrix: constant or collinear features) emit
    * 0-coefficients with intercept = mean(y), r2 = 0 — deterministic, no
    * NaN propagation. Digits: x1/x2 sums at `xDigits`, y and every product
    * involving y at `yDigits`, feature products at `xDigits`. */
  /** WEIGHTED least squares per group: simple regression y = a + b·x
    * under a per-row weight column — the heteroscedasticity /
    * importance-weighted fit. Closed form from floor-scaled exact
    * weighted moments (w, wx, wy, wxx, wxy — products of bounded-decimal
    * data stay exact at the combined scale):
    *   b = (Sw·Swxy − Swx·Swy) / (Sw·Swxx − Swx²),  a = (Swy − b·Swx)/Sw.
    * Zero-variance (or all-zero-weight) groups fall back to b = 0,
    * a = Swy/Sw, deterministically. One keyed aggregation; the oracle
    * replays moments and the final op sequence. Negative weights are
    * refused (they make XᵀWX indefinite). */
  def weightedRegressionByGroup(df: DataFrame, groupCols: Seq[String],
                                x: String, y: String, w: String,
                                digits: Int = 4): DataFrame = {
    val complete = col(x).isNotNull && col(y).isNotNull && col(w).isNotNull
    def sc(c: Column) = isum(when(complete, c), digits)
    val xd = col(x).cast(DoubleType); val yd = col(y).cast(DoubleType)
    val wd = col(w).cast(DoubleType)
    val agg = df
      .withColumn("__wneg", when(wd < 0, lit(1)).otherwise(lit(0)))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__wneg")).as("__neg"),
        count(when(complete, lit(1))).as("n"),
        sc(wd).as("sw"), sc(wd * xd).as("swx"), sc(wd * yd).as("swy"),
        sc(wd * xd * xd).as("swxx"), sc(wd * xd * yd).as("swxy"))
    val den = col("sw") * col("swxx") - col("swx") * col("swx")
    val b = (col("sw") * col("swxy") - col("swx") * col("swy")) / den
    // negative-weight refusal rides the SAME pass as the fit (assert_true
    // poisons the group row in the executor) — no second scan just for
    // the guard
    val guard = expr(
      "assert_true(__neg = 0, 'weightedRegressionByGroup: negative " +
        "weights present — WLS needs w >= 0')")
    agg
      .withColumn("slope",
        when(guard.isNull && col("sw") > 0 && den > 0, b).otherwise(0.0))
      .withColumn("intercept",
        when(col("sw") > 0,
          (col("swy") - col("slope") * col("swx")) / col("sw")))
      .drop("swx", "swy", "swxx", "swxy", "__neg")
  }

  def linearRegressionByGroup2(df: DataFrame, groupCols: Seq[String],
                               x1: String, x2: String, y: String,
                               xDigits: Int = 4, yDigits: Int = 2): DataFrame = {
    val c1 = col(x1).cast(DoubleType); val c2 = col(x2).cast(DoubleType)
    val cy = col(y).cast(DoubleType)
    val complete = c1.isNotNull && c2.isNotNull && cy.isNotNull
    def s(c: Column, d: Int) = isum(when(complete, c), d)
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(when(complete, lit(1))).cast(DoubleType).as("n"),
      s(c1, xDigits).as("s1"), s(c2, xDigits).as("s2"),
      s(c1 * c1, xDigits).as("p11"), s(c1 * c2, xDigits).as("p12"),
      s(c2 * c2, xDigits).as("p22"),
      s(cy, yDigits).as("sy"), s(c1 * cy, yDigits).as("q1"),
      s(c2 * cy, yDigits).as("q2"), s(cy * cy, yDigits).as("syy"))
    val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
    val p11 = col("p11"); val p12 = col("p12"); val p22 = col("p22")
    val sy = col("sy"); val q1 = col("q1"); val q2 = col("q2")
    val syy = col("syy")
    // Cramer by first-row cofactors on A = [[n,s1,s2],[s1,p11,p12],[s2,p12,p22]]
    val det = n * (p11 * p22 - p12 * p12) - s1 * (s1 * p22 - p12 * s2) +
      s2 * (s1 * p12 - p11 * s2)
    val det0 = sy * (p11 * p22 - p12 * p12) - s1 * (q1 * p22 - p12 * q2) +
      s2 * (q1 * p12 - p11 * q2)
    val det1 = n * (q1 * p22 - p12 * q2) - sy * (s1 * p22 - p12 * s2) +
      s2 * (s1 * q2 - q1 * s2)
    val det2 = n * (p11 * q2 - q1 * p12) - s1 * (s1 * q2 - q1 * s2) +
      sy * (s1 * p12 - p11 * s2)
    val sing = det === 0
    val withB = agg
      .withColumn("intercept", when(sing, sy / n).otherwise(det0 / det))
      .withColumn("slope1", when(sing, lit(0.0)).otherwise(det1 / det))
      .withColumn("slope2", when(sing, lit(0.0)).otherwise(det2 / det))
    val sse = greatest(
      syy - col("intercept") * sy - col("slope1") * q1 - col("slope2") * q2,
      lit(0.0))
    withB
      .withColumn("sse", sse)
      .withColumn("sst", syy - sy * sy / n)
      .withColumn("r2", when(col("sst") === 0, lit(0.0))
        .otherwise(lit(1.0) - col("sse") / col("sst")))
      .withColumn("rmse", sqrt(col("sse") / n))
      .drop("s1", "s2", "p11", "p12", "p22", "sy", "q1", "q2", "syy",
        "sse", "sst")
  }

  /** Per-group multivariate regression for ARBITRARY d — the general form
    * of [[linearRegressionByGroup2]]: one exact-sum aggregation builds each
    * group's normal-equation moments (O(d²) scalars per group), then the
    * (d+1)×(d+1) pivot-free Cholesky solve runs INSIDE the executors via
    * mapPartitions over the tiny moment rows — no driver round-trip, no
    * per-group job, so a million groups still fit a million models in one
    * shuffle plus an embarrassingly parallel solve pass. Cholesky is both
    * numerically preferable for SPD systems AND replayable: its fixed
    * left-to-right op order lets the q116 oracle mirror the d=3 case in SQL
    * bit-for-bit (the q112 pattern). Singular groups (collinear or constant
    * features → non-positive pivot) fall back to intercept = mean(y) with
    * zero slopes, deterministically. Also spec-verified against the
    * driver-side fitLinearRegression and the d=2 Cramer plan.
    * Output: groupCols…, n, intercept, coefficients array<double> (feature
    * order). */
  def linearRegressionByGroupN(df: DataFrame, groupCols: Seq[String],
                               features: Seq[String], target: String,
                               colScale: Map[String, Int] = Map.empty,
                               ridgeLambda: Double = 0.0): DataFrame = {
    require(ridgeLambda >= 0.0, "ridgeLambda must be ≥ 0")
    val d = features.size
    require(d >= 1, "need at least one feature")
    def sc(a: String, b: String): Int =
      math.min(colScale.getOrElse(a, 4), colScale.getOrElse(b, 4))
    val complete = (features :+ target).map(c => col(c).isNotNull).reduce(_ && _)
    def s(c: Column, dig: Int) = isum(when(complete, c), dig)
    val pairs = for (i <- 0 until d; j <- i until d) yield (i, j)
    val aggs =
      count(when(complete, lit(1))).cast(DoubleType).as("__n") +:
        (features.map(c => s(col(c).cast(DoubleType), sc(c, c)).as(s"__s_$c")) ++
          pairs.map { case (i, j) =>
            s(col(features(i)).cast(DoubleType) * col(features(j)).cast(DoubleType),
              sc(features(i), features(j))).as(s"__p_${i}_$j") } ++
          (s(col(target).cast(DoubleType), sc(target, target)).as("__sy") +:
            features.zipWithIndex.map { case (c, i) =>
              s(col(c).cast(DoubleType) * col(target).cast(DoubleType),
                sc(c, target)).as(s"__q_$i") }))
    val moments = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val mSchema = moments.schema
    val outSchema = StructType(
      groupCols.map(mSchema(_)) ++ Seq(
        StructField("n", DoubleType, nullable = false),
        StructField("intercept", DoubleType, nullable = false),
        StructField("coefficients", ArrayType(DoubleType, containsNull = false),
          nullable = false)))
    val gIdx = groupCols.map(mSchema.fieldIndex)
    val nIdx = mSchema.fieldIndex("__n")
    val sIdx = features.map(c => mSchema.fieldIndex(s"__s_$c"))
    val pIdx = pairs.map { case (i, j) => mSchema.fieldIndex(s"__p_${i}_$j") }
    val syIdx = mSchema.fieldIndex("__sy")
    val qIdx = features.indices.map(i => mSchema.fieldIndex(s"__q_$i"))
    val rows = moments.rdd.mapPartitions { it =>
      it.map { r =>
        val n = r.getDouble(nIdx)
        val a = Array.ofDim[Double](d + 1, d + 1)
        val b = new Array[Double](d + 1)
        a(0)(0) = n
        sIdx.zipWithIndex.foreach { case (ix, i) =>
          a(0)(i + 1) = r.getDouble(ix); a(i + 1)(0) = a(0)(i + 1) }
        pairs.zip(pIdx).foreach { case ((i, j), ix) =>
          a(i + 1)(j + 1) = r.getDouble(ix); a(j + 1)(i + 1) = a(i + 1)(j + 1) }
        // ridge: L2 penalty on the feature weights only — the intercept
        // row (0) is never shrunk. XᵀX + λI stays SPD for any λ > 0, so
        // the same pivot-free Cholesky sequence (and its SQL mirror)
        // applies with p_kk + λ on the diagonal.
        if (ridgeLambda != 0.0)
          for (i <- 1 to d) a(i)(i) += ridgeLambda
        b(0) = r.getDouble(syIdx)
        qIdx.zipWithIndex.foreach { case (ix, i) => b(i + 1) = r.getDouble(ix) }
        val beta =
          if (n == 0) Array.fill(d + 1)(0.0)
          else try choleskySolve(a, b)
          catch { case _: IllegalArgumentException =>
            (b(0) / n) +: Array.fill(d)(0.0) }
        org.apache.spark.sql.Row.fromSeq(
          gIdx.map(r.get) ++ Seq(n, beta(0), beta.drop(1).toSeq))
      }
    }
    df.sparkSession.createDataFrame(rows, outSchema)
  }

  /** Pivot-free Cholesky solve of the SPD system Ax = b. Normal-equation
    * matrices XᵀX are symmetric positive-definite whenever the design has
    * full rank, so no pivoting is needed — and because the factorization and
    * both substitutions run in a FIXED left-to-right operation order
    * (subtract terms sequentially, lowest k first; each divide last), an
    * external engine can replay the arithmetic bit-for-bit as a flat
    * expression sequence. The q116 oracle mirrors the d=3 (4×4) sequence in
    * DuckDB SQL exactly the way q112 mirrors the d=2 Cramer expansion.
    * Throws IllegalArgumentException on a near-zero pivot (singular or not
    * positive-definite — e.g. collinear/constant features). The test is
    * RELATIVE — pivot > a(j)(j) / 2³⁰ (≈1e-9 relative) — because unlike
    * pivoted Gauss on exact floor-scaled moments, the sqrt/divide chain
    * leaves a truly-singular pivot at roundoff scale (±1e-10·diag) rather
    * than exactly 0. The divisor is a power of two so the comparison is
    * IEEE-exact and replayable in the SQL mirror. */
  private[graft] def choleskySolve(a: Array[Array[Double]],
                                   b: Array[Double]): Array[Double] = {
    val d = b.length
    val l = Array.ofDim[Double](d, d)
    for (j <- 0 until d) {
      var s = a(j)(j)
      for (k <- 0 until j) s = s - l(j)(k) * l(j)(k)
      if (!(s > a(j)(j) / 1073741824.0))
        throw new IllegalArgumentException(
          s"normal equations not positive-definite (pivot $j = $s): " +
            "features are linearly dependent or constant")
      l(j)(j) = math.sqrt(s)
      for (i <- j + 1 until d) {
        var t = a(i)(j)
        for (k <- 0 until j) t = t - l(i)(k) * l(j)(k)
        l(i)(j) = t / l(j)(j)
      }
    }
    val y = new Array[Double](d)
    for (i <- 0 until d) {
      var s = b(i)
      for (k <- 0 until i) s = s - l(i)(k) * y(k)
      y(i) = s / l(i)(i)
    }
    val x = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var s = y(i)
      for (k <- i + 1 until d) s = s - l(k)(i) * x(k)
      x(i) = s / l(i)(i)
    }
    x
  }

  /** Deterministic in-place Gaussian elimination with partial pivoting on a
    * small (d+1)×(d+1) driver-side system (scalar work only — the data never
    * leaves the executors). Ties in pivot selection go to the lowest row
    * index; singular systems raise. */
  private[graft] def gaussSolve(a0: Array[Array[Double]],
                                b0: Array[Double]): Array[Double] = {
    val d = b0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val b = b0.clone()
    for (k <- 0 until d) {
      var piv = k
      for (r <- k + 1 until d) if (math.abs(a(r)(k)) > math.abs(a(piv)(k))) piv = r
      if (a(piv)(k) == 0.0)
        throw new IllegalArgumentException(
          "singular normal equations: features are linearly dependent")
      if (piv != k) { val t = a(piv); a(piv) = a(k); a(k) = t
        val tb = b(piv); b(piv) = b(k); b(k) = tb }
      for (r <- k + 1 until d) {
        val f = a(r)(k) / a(k)(k)
        for (c <- k until d) a(r)(c) -= f * a(k)(c)
        b(r) -= f * b(k)
      }
    }
    val xs = new Array[Double](d)
    for (k <- d - 1 to 0 by -1) {
      var s = b(k)
      for (c <- k + 1 until d) s -= a(k)(c) * xs(c)
      xs(k) = s / a(k)(k)
    }
    xs
  }

  /** Multivariate linear regression by exact-sum normal equations: ONE pass
    * accumulates X'X (intercept column included) and X'y as Int128 sums —
    * partition-invariant, so refits are bit-identical on any cluster layout —
    * then the (d+1)×(d+1) solve runs driver-side (O(d³) on scalars).
    * `colScale` as fitPca: per-column floor-scale for product sums (default
    * 4; lower it for columns whose pairwise products reach ~1e10).
    * Reference: train-regression tribuo.clj:285-291 (multi-feature). */
  def fitLinearRegression(df: DataFrame, features: Seq[String], target: String,
                          colScale: Map[String, Int] = Map.empty): LinearModel = {
    val d = features.size
    require(d >= 1, "need at least one feature")
    def sc(a: String, b: String): Int =
      math.min(colScale.getOrElse(a, 4), colScale.getOrElse(b, 4))
    val cols = features :+ target
    val complete = cols.map(c => col(c).isNotNull).reduce(_ && _)
    def s(c: Column, dig: Int) = isum(when(complete, c), dig)
    val pairs = for (i <- 0 until d; j <- i until d) yield (i, j)
    val aggs =
      count(when(complete, lit(1))).cast(DoubleType).as("__n") +:
        (features.map(c => s(col(c).cast(DoubleType), sc(c, c)).as(s"__s_$c")) ++
          pairs.map { case (i, j) =>
            s(col(features(i)).cast(DoubleType) * col(features(j)).cast(DoubleType),
              sc(features(i), features(j))).as(s"__p_${i}_$j") } ++
          (s(col(target).cast(DoubleType), sc(target, target)).as("__sy") +:
            features.zipWithIndex.map { case (c, i) =>
              s(col(c).cast(DoubleType) * col(target).cast(DoubleType),
                sc(c, target)).as(s"__q_$i") }))
    val row = df.agg(aggs.head, aggs.tail: _*).collectBounded(1, "one-row normal-equations agg")(0)
    def g(name: String) = row.getDouble(row.fieldIndex(name))
    val n = g("__n")
    require(n > d, s"need more than ${d} complete rows, got ${n.toLong}")
    // normal equations with intercept: A = [[n, sxᵀ], [sx, X'X]], b = [sy, X'y]
    val a = Array.ofDim[Double](d + 1, d + 1)
    val b = new Array[Double](d + 1)
    a(0)(0) = n
    features.zipWithIndex.foreach { case (c, i) =>
      a(0)(i + 1) = g(s"__s_$c"); a(i + 1)(0) = a(0)(i + 1)
    }
    pairs.foreach { case (i, j) =>
      a(i + 1)(j + 1) = g(s"__p_${i}_$j"); a(j + 1)(i + 1) = a(i + 1)(j + 1)
    }
    b(0) = g("__sy")
    (0 until d).foreach(i => b(i + 1) = g(s"__q_$i"))
    val beta = gaussSolve(a, b)
    LinearModel(features, beta(0), beta.drop(1))
  }

  /** RMSE / MAE / R² of a prediction column (reference evaluate-regression
    * tribuo.clj:302-315 → RegressionEvaluator). Residual sums are floor-
    * scaled exact sums at `digits` (deterministic across partition layouts;
    * granularity 10^-digits — not an infinite-precision metric, a
    * reproducible one). Returns a 1-row frame (n, rmse, mae, r2). */
  def evaluateRegression(df: DataFrame, actual: String, predicted: String,
                         digits: Int = 6): DataFrame = {
    val y = col(actual).cast(DoubleType)
    val p = col(predicted).cast(DoubleType)
    val both = y.isNotNull && p.isNotNull
    val r = y - p
    val n = count(when(both, lit(1))).cast(DoubleType)
    val agg = df.agg(
      n.as("n"),
      isum(when(both, r * r), digits).as("__sse"),
      isum(when(both, abs(r)), digits).as("__sae"),
      isum(when(both, y), digits).as("__sy"),
      isum(when(both, y * y), digits).as("__syy"))
    agg.withColumn("rmse", sqrt(greatest(col("__sse"), lit(0.0)) / col("n")))
      .withColumn("mae", col("__sae") / col("n"))
      .withColumn("sst", col("__syy") - col("__sy") * col("__sy") / col("n"))
      .withColumn("r2", when(col("sst") === 0, lit(0.0))
        .otherwise(lit(1.0) - col("__sse") / col("sst")))
      .select(col("n"), col("rmse"), col("mae"), col("r2"))
  }

  /** Fitted nearest-centroid (Rocchio) classifier: per-class exact-mean
    * centroids, sorted by label. Predict = argmin of the squared euclidean
    * distance, computed per class in pinned feature order with ties going to
    * the FIRST (smallest) label — pure column expressions replayable by an
    * external engine (q109's oracle replays the same selection in SQL:
    * array_min + first-position ≡ the fold with strict <, because the min
    * IS its first occurrence and both visit labels in sorted order).
    * Selection is array-based — each score expression appears ONCE in the
    * plan (a nested best-so-far fold doubles the tree per class, 2^k at
    * 25+ classes). A row with a null feature yields a NULL prediction via
    * an EXPLICIT completeness gate, matching fit's exclusion of incomplete
    * rows rather than silently assigning a label. (The gate must be
    * explicit: Spark's element_at with a runtime-null index resolves to the
    * LAST array element, not null — only the literal-null form folds to
    * null — so relying on null-score propagation silently predicts the
    * last label.)
    * Reference surface: train-classification / predict-classification
    * tribuo.clj:232-273 (the reference delegates to Tribuo trainers; the
    * centroid rule is this engine's closed-form, shuffle-once equivalent). */
  case class CentroidModel(features: Seq[String],
                           centroids: Seq[(String, Array[Double])]) extends DatasetTransform {
    def predict(df: DataFrame, out: String = "prediction"): DataFrame = {
      val dists = centroids.map { case (_, mu) =>
        features.zip(mu.toIndexedSeq).map { case (c, m) =>
          val dcol = col(c).cast(DoubleType) - lit(m)
          dcol * dcol
        }.reduce(_ + _)
      }
      val labelsArr = array(centroids.map(c => lit(c._1)): _*)
      val scoreArr = array(dists: _*)
      val complete = features.map(col(_).isNotNull).reduce(_ && _)
      df.withColumn(out,
        when(complete, element_at(labelsArr,
          array_position(scoreArr, array_min(scoreArr)).cast(IntegerType))))
    }
    def transform(df: DataFrame): DataFrame = predict(df)
  }

  /** Categorical (multinomial) NAIVE BAYES — the count-based classifier
    * the reference's tribuo.clj surface exposes for discrete features.
    * Entirely integer at fit time: class priors n_c and per-(feature,
    * value, class) counts with add-one (Laplace) smoothing,
    * P(v|c) = (count + 1)/(n_c + V_f). Scoring is the LOG-FREE product
    * form (this engine's no-transcendental policy — log/exp would cost
    * cross-engine libm parity): score_c = (n_c/N)·Π_f V_f·P(v_f|c) as
    * ONE pinned multiplication sequence in feature order, so the oracle
    * replays every double bit-for-bit; argmax ties break to the
    * FIRST label in sorted order. Unseen values at predict time get the
    * pure-smoothing likelihood V_f/(n_c + V_f) (standard, rescaled).
    * The per-feature V_f rescale is constant across classes — argmax
    * identical to textbook NB in exact arithmetic — and keeps each
    * factor O(1) (a near-uniform feature contributes n_c/(n_c+V_f) ≈ 1),
    * so the product stays in double range for thousands of features
    * where the raw Π P(v|c) underflows to 0-for-every-class after a few
    * dozen.
    *
    * Scale: fit = one count aggregation per feature (driver reads
    * O(Σ cardinalities) rows, bounded); predict = one BROADCAST join per
    * feature against its O(V_f) value table + pure column arithmetic —
    * no shuffle of the scored frame at all. */
  case class NaiveBayesModel(features: Seq[String], labels: Seq[String],
                             priors: Seq[Long], total: Long,
                             cards: Seq[Long],
                             tables: Seq[Seq[(String, Seq[Long])]])
      extends DatasetTransform {
    def predict(df: DataFrame, out: String = "nb_pred"): DataFrame = {
      val spark = df.sparkSession
      val k = labels.length
      val joined = features.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
        val schema = StructType(StructField(s"__nbv_$i", StringType) +:
          labels.indices.map(j => StructField(s"__nbc_${i}_$j", LongType)))
        val rows = tables(i).map { case (v, cnts) =>
          org.apache.spark.sql.Row.fromSeq(v +: cnts)
        }
        val tbl = spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), schema)
        d.join(broadcast(tbl),
          col(f).cast(StringType) === col(s"__nbv_$i"), "left")
      }
      val scores = labels.indices.map { j =>
        features.indices.foldLeft(
          lit(priors(j).toDouble) / lit(total.toDouble)) { (acc, i) =>
          // each factor is V_f·P(v|c), not raw P(v|c): the V_f rescale
          // (constant across classes, so argmax is unchanged in exact
          // arithmetic) keeps factors O(1) — near-uniform features give
          // n_c/(n_c+V) ≈ 1 — so the log-free product survives thousands
          // of features instead of underflowing to 0-for-every-class
          // after a few dozen; the oracle replays the identical sequence
          acc * ((coalesce(col(s"__nbc_${i}_$j"), lit(0L))
            .cast(DoubleType) + lit(1.0)) * lit(cards(i).toDouble) /
            lit(priors(j).toDouble + cards(i).toDouble))
        }
      }
      // argmax, ties to the first (sorted) label: max on (score, −index)
      val best = array_max(array(scores.zipWithIndex.map { case (s, j) =>
        struct(s.as("s"), lit(-j).as("nj"))
      }: _*))
      val labelArr = array(labels.map(lit): _*)
      joined
        .withColumn(out,
          element_at(labelArr, (-best.getField("nj") + 1).cast(IntegerType)))
        .drop((features.indices.flatMap(i =>
          s"__nbv_$i" +: labels.indices.map(j => s"__nbc_${i}_$j"))): _*)
    }
    def transform(df: DataFrame): DataFrame = predict(df)
  }

  /** Fit: per feature one (value, class) count aggregation; classes and
    * priors from one more. Rows with a null label or any null feature are
    * excluded (the fitNearestCentroid contract). */
  def fitNaiveBayes(df: DataFrame, features: Seq[String],
                    labelCol: String): NaiveBayesModel = {
    require(features.nonEmpty, "fitNaiveBayes: no features")
    val complete = (col(labelCol).isNotNull +:
      features.map(c => col(c).isNotNull)).reduce(_ && _)
    val base = df.filter(complete)
      .select(col(labelCol).cast(StringType).as("__y") +:
        features.zipWithIndex.map { case (f, i) =>
          col(f).cast(StringType).as(s"__f$i") }: _*)
    val priorRows = base.groupBy(col("__y")).agg(count(lit(1)).as("n"))
      .collectBounded(1 << 16, "O(classes) prior frame")
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    require(priorRows.nonEmpty, "fitNaiveBayes: no complete training rows")
    val labels = priorRows.map(_._1).toSeq
    val priors = priorRows.map(_._2).toSeq
    val total = priors.sum
    val labelIdx = labels.zipWithIndex.toMap
    val tabs = features.indices.map { i =>
      val rows = base.groupBy(col(s"__f$i").as("v"), col("__y"))
        .agg(count(lit(1)).as("n"))
        .collectBounded(1 << 20, "O(cardinality × classes) count table")
      rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map { case (v, rs) =>
        val cnts = Array.fill(labels.length)(0L)
        rs.foreach(r => cnts(labelIdx(r.getString(1))) = r.getLong(2))
        v -> cnts.toSeq
      }
    }
    NaiveBayesModel(features, labels, priors, total,
      tabs.map(_.length.toLong), tabs)
  }

  /** Fit = one groupBy(label) exact-sum aggregation; the driver reads back
    * O(classes · d) scalars. Null-labeled or incomplete rows are excluded
    * (the reference's missing-label rows cannot form Tribuo examples either). */
  def fitNearestCentroid(df: DataFrame, features: Seq[String],
                         labelCol: String, digits: Int = 4): CentroidModel = {
    val complete = (col(labelCol).isNotNull +:
      features.map(c => col(c).isNotNull)).reduce(_ && _)
    val aggs = count(when(complete, lit(1))).cast(DoubleType).as("__n") +:
      features.map(c =>
        isum(when(complete, col(c).cast(DoubleType)), digits).as(s"__s_$c"))
    val rows = df.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol).cast(StringType).as("__label"))
      .agg(aggs.head, aggs.tail: _*)
      .collectBounded(1 << 16, "O(labels) centroid frame")
    val cents = rows.map { r =>
      val n = r.getDouble(r.fieldIndex("__n"))
      require(n > 0, s"class ${r.getString(0)} has no complete rows")
      (r.getString(r.fieldIndex("__label")),
        features.map(c => r.getDouble(r.fieldIndex(s"__s_$c")) / n).toArray)
    }.sortBy(_._1).toSeq
    CentroidModel(features, cents)
  }

  /** Per-class classification metrics from (actual, predicted) columns —
    * the evaluation half of the reference's classification surface
    * (tribuo.clj routes to Tribuo evaluators). One confusion-matrix
    * aggregation, then precision/recall/F1 as pinned column arithmetic
    * (0.0 when a denominator is empty — no NaN): fully distributed over
    * any number of classes, and exactly replayable (q114 oracle).
    * Output: (label, n_actual, tp, precision, recall, f1) per class. */
  def evaluateClassification(df: DataFrame, actual: String,
                             predicted: String): DataFrame = {
    val conf = df.groupBy(col(actual).cast(StringType).as("__a"),
        col(predicted).cast(StringType).as("__p"))
      .agg(count(lit(1)).as("__n"))
    val byActual = conf.groupBy(col("__a").as("label"))
      .agg(sum(col("__n")).as("n_actual"),
        sum(when(col("__a") === col("__p"), col("__n")).otherwise(0L)).as("tp"))
    val byPred = conf.groupBy(col("__p").as("label"))
      .agg(sum(col("__n")).as("n_pred"))
    // full outer: a class can appear only in predictions (precision row
    // with zero recall support) or only in actuals
    val m = byActual.join(byPred, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
    val p = when(col("n_pred") === 0, lit(0.0))
      .otherwise(col("tp").cast(DoubleType) / col("n_pred").cast(DoubleType))
    val r = when(col("n_actual") === 0, lit(0.0))
      .otherwise(col("tp").cast(DoubleType) / col("n_actual").cast(DoubleType))
    m.withColumn("precision", p).withColumn("recall", r)
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .drop("n_pred")
  }

  /** Fitted linear (softmax) classifier: per-class scores
    * score_c = intercept_c + Σᵢ w_ci·xᵢ as pure column expressions;
    * `predict` emits the argmax label (ties → first label) plus one
    * probability column PER LABEL — the reference's predict-classification
    * output shape (tribuo.clj:239-273: :prediction + a column per class).
    * Selection is array-based, same as CentroidModel: each score expression
    * appears ONCE in the plan (a nested best-so-far fold doubles the tree
    * per class — O(2^k) nodes at 20+ softmax classes). array_position finds
    * the FIRST occurrence of the max, so ties go to the first (smallest)
    * label exactly like the strict-> fold did. A row with any null feature
    * gets a NULL prediction via the explicit completeness gate (see
    * CentroidModel on why null-score propagation isn't enough). */
  case class LinearClassifierModel(features: Seq[String], labels: Seq[String],
                                   intercepts: Array[Double],
                                   weights: Array[Array[Double]]) extends DatasetTransform {
    def predict(df: DataFrame, out: String = "prediction"): DataFrame = {
      val scores = labels.indices.map { ci =>
        features.zipWithIndex.foldLeft(lit(intercepts(ci)): Column) {
          case (acc, (c, i)) => acc + col(c).cast(DoubleType) * lit(weights(ci)(i))
        }
      }
      // numerically-stable softmax: shift by the max score before exp
      val mx = scores.reduce((a, b) => greatest(a, b))
      val exps = scores.map(s => exp(s - mx))
      val z = exps.reduce(_ + _)
      val withProbs = labels.zip(exps).foldLeft(df) { case (d, (l, e)) =>
        d.withColumn(s"prob_$l", e / z)
      }
      val labelsArr = array(labels.map(lit): _*)
      val scoreArr = array(scores: _*)
      val complete = features.map(col(_).isNotNull).reduce(_ && _)
      withProbs.withColumn(out,
        when(complete, element_at(labelsArr,
          array_position(scoreArr, array_max(scoreArr)).cast(IntegerType))))
    }
    def transform(df: DataFrame): DataFrame = predict(df)
  }

  /** Multinomial logistic regression via MLlib (the iterative path — the
    * reference routes exactly this class of trainer to Tribuo,
    * tribuo.clj:232-238). Labels are indexed alphabetically (deterministic,
    * engine-independent); the fitted coefficient matrix is read back into a
    * plain LinearClassifierModel so prediction is codegen column arithmetic,
    * with no MLlib vector UDT or model object in the scoring plan.
    * L-BFGS on the convex multinomial objective with fixed tol/maxIter is
    * deterministic for a given aggregation order; exact refit equality is
    * spec-pinned (MlModelSpec) on a fixed layout, and coefficients are
    * layout-stable to optimizer tolerance. */
  def fitLogisticRegression(df: DataFrame, features: Seq[String],
                            labelCol: String, maxIter: Int = 100,
                            regParam: Double = 0.0,
                            tol: Double = 1e-9): LinearClassifierModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val labels = df.select(col(labelCol).cast(StringType)).na.drop()
      .distinct().collectBounded(1 << 16, "O(classes) label set").map(_.getString(0)).sorted.toSeq
    require(labels.size >= 2, s"need ≥2 classes, got ${labels.size}")
    val idx = labels.zipWithIndex.toMap
    val idxExpr = labels.foldLeft(lit(null).cast(DoubleType)) { (acc, l) =>
      when(col(labelCol).cast(StringType) === l, lit(idx(l).toDouble)).otherwise(acc)
    }
    val complete = (col(labelCol).isNotNull +:
      features.map(c => col(c).isNotNull)).reduce(_ && _)
    val train = new VectorAssembler().setInputCols(features.toArray)
      .setOutputCol("__fv")
      .transform(df.filter(complete).withColumn("__label", idxExpr))
    val lr = new LogisticRegression().setFamily("multinomial")
      .setFeaturesCol("__fv").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam).setTol(tol)
      .setStandardization(true).setFitIntercept(true)
    val m = lr.fit(train)
    val cm = m.coefficientMatrix
    val weights = Array.tabulate(labels.size, features.size)((r, c) => cm(r, c))
    LinearClassifierModel(features, labels,
      m.interceptVector.toArray, weights)
  }

  /** LOGISTIC REGRESSION (intercept + one feature) per group via IRLS
    * with a FIXED round count — the engine-portable replacement for an
    * iterate-to-tolerance solver (the [[graft.ops.Stats.huberMean]]
    * doctrine applied to classification): every round is one broadcast
    * join of the O(groups) coefficient frame + one keyed aggregation,
    * and the weighted normal-equation sums are floor-scaled exact, so
    * unrolled SQL replays each round bit-for-bit.
    *
    * The working response enters PRE-MULTIPLIED by the weight:
    * w·z = w·η + (y − p) — algebraically identical to the textbook
    * z = η + (y−p)/w but bounded (no 0/0 when p saturates), which is what
    * keeps the floor-scaled sums inside their addend budget. Rounds start
    * at β = 0; groups whose X'WX is singular keep their previous β.
    * Returns (group, n, n_pos, intercept, slope). */
  def logisticSimpleByGroup(df: DataFrame, groupCol: String, xCol: String,
                            labelCol: String, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters")
    val spark = df.sparkSession
    def fsum(c: Column, digits: Int): Column = {
      val p = math.pow(10, digits)
      call_function("graft_sum128", floor(c * lit(p)).cast(LongType), lit(0))
        .cast(DoubleType) / lit(p)
    }
    val x = col(xCol).cast(DoubleType)
    val y = col(labelCol).cast(DoubleType)
    val f = df
      .filter(col(groupCol).isNotNull && x.isNotNull && !isnan(x) &&
        y.isNotNull && !isnan(y))
      .select(col(groupCol), x.as("__x"), y.as("__y"))
    val nFrame = f.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__y").cast(LongType)).as("n_pos"))
    var beta = nFrame.select(col(groupCol), lit(0.0).as("__b0"),
      lit(0.0).as("__b1"))
    for (_ <- 1 to iters) {
      val bRows = beta.collectBounded(1 << 20, "O(groups) logistic β frame")
      val bLocal = spark.createDataFrame(
        java.util.Arrays.asList(bRows: _*), beta.schema)
      val eta = col("__b0") + col("__b1") * col("__x")
      val p = lit(1.0) / (lit(1.0) + exp(-eta))
      val w = p * (lit(1.0) - p)
      val u = w * eta + (col("__y") - p) // = w·z, bounded
      val agg = f.join(broadcast(bLocal), Seq(groupCol))
        .groupBy(col(groupCol))
        .agg(fsum(w, 9).as("__sw"), fsum(w * col("__x"), 6).as("__swx"),
          fsum(w * col("__x") * col("__x"), 4).as("__swxx"),
          fsum(u, 6).as("__su"), fsum(u * col("__x"), 4).as("__sux"))
      val det = col("__sw") * col("__swxx") - col("__swx") * col("__swx")
      beta = bLocal.join(agg, Seq(groupCol), "left")
        .select(col(groupCol),
          when(det > 0.0,
            (col("__swxx") * col("__su") - col("__swx") * col("__sux")) / det)
            .otherwise(col("__b0")).as("__b0"),
          when(det > 0.0,
            (col("__sw") * col("__sux") - col("__swx") * col("__su")) / det)
            .otherwise(col("__b1")).as("__b1"))
    }
    nFrame.join(beta, Seq(groupCol))
      .select(col(groupCol), col("n"), col("n_pos"),
        col("__b0").as("intercept"), col("__b1").as("slope"))
  }

  /** NEYMAN ALLOCATION — the optimal stratified-sampling design: given
    * a sample budget, allocate n_h ∝ N_h·S_h (stratum size × stratum
    * sd), which minimizes the variance of the stratified mean — the
    * planning readout BEFORE running [[stratifiedSplit]]-style draws
    * on a 100 TB corpus (sample the volatile strata hard, skim the
    * homogeneous ones). Zero-variance strata get share 0 (one row
    * represents them exactly; documented).
    *
    * One keyed moment pass (floor-scaled exact Σx, Σx² at 10⁶), sample
    * sd via the pinned (Σx² − Σx²/n)/(n−1) form, then the share and
    * floor(budget·share) allocation off the O(strata) frame (the Σw
    * normalizer is itself a floor-scaled window sum, reduce-order
    * free). Returns one row per stratum
    * (stratum, n_rows, sd, neyman_share, n_alloc). */
  def neymanAllocation(df: DataFrame, valueCol: String,
                       stratumCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget=$budget")
    import org.apache.spark.sql.expressions.Window
    val x = col(valueCol).cast(DoubleType)
    val per = df.filter(x.isNotNull && !isnan(x) &&
        col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast(StringType).as("stratum"))
      .agg(count(lit(1)).as("n_rows"), isum(x, 6).as("__sx"),
        isum(x * x, 6).as("__sxx"))
    def d(c: Column): Column = c.cast(DoubleType)
    val nD = d(col("n_rows"))
    val varS = (col("__sxx") - col("__sx") * col("__sx") / nD) /
      (nD - lit(1.0))
    val sd = when(col("n_rows") >= 2L && varS > 0.0, sqrt(varS))
      .otherwise(lit(0.0))
    val withW = per.withColumn("sd", sd)
      .withColumn("__w", nD * col("sd"))
      .withColumn("__tot",
        sum(floor(col("__w") * lit(1e6)).cast(DecimalType(30, 0)))
          .over(Window.partitionBy()).cast(DoubleType) / lit(1e6))
    val share = when(col("__tot") > 0.0, col("__w") / col("__tot"))
      .otherwise(lit(0.0))
    withW.select(col("stratum"), col("n_rows"), col("sd"),
      share.as("neyman_share"),
      floor(lit(budget.toDouble) * share).cast(LongType).as("n_alloc"))
  }

  /** DECISION STUMP — the optimal depth-1 tree for a binary label over
    * ONE ordered feature: among the candidate thresholds θ (every
    * distinct feature value except the maximum), pick the split
    * x ≤ θ / x > θ minimizing the weighted Gini impurity
    * (n_L/n)·g_L + (n_R/n)·g_R, g = 1 − p² − (1−p)² — the unit of
    * every tree ensemble and the standard "is this feature predictive
    * at all" readout next to [[Stats]]' correlation tier.
    *
    * Exactness & scale: ONE keyed aggregation reduces the data to the
    * per-distinct-value (count, positives) frame — O(distinct values),
    * [[graft.ops.Stats]]-style bounded in-plan at 4096 candidates (a
    * feature with more isn't a stump candidate grid; quantile-bucket it
    * first) — then cumulative counts via a window over that bounded
    * frame give every split's four exact BIGINTs, the impurities are
    * pinned IEEE expressions of those integers (bit-identical across
    * engines), and the argmin is (gini asc, θ asc) — deterministic.
    * Returns ONE row (or zero rows when no valid split exists):
    * (threshold, n, n_pos, n_left, pos_left, n_right, pos_right,
    * gini_left, gini_right, gini_split, gini_gain). */
  def decisionStump(df: DataFrame, featureCol: String, labelPos: Column,
                    maxCandidates: Long = 1L << 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = col(featureCol).cast(DoubleType)
    val perValue = df.filter(x.isNotNull && !isnan(x))
      .groupBy(x.as("__v"))
      .agg(count(lit(1)).as("__c"),
        coalesce(sum(when(labelPos, 1L)), lit(0L)).as("__p"))
    val wCum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = perValue
      // in-plan candidate-grid bound (the seriesBound doctrine — the
      // global cumulative window below is safe only on a bounded frame)
      .withColumn("__c", when(count(lit(1)).over(wAll) <= maxCandidates,
        col("__c")).otherwise(raise_error(concat(
          lit("decisionStump: feature has "),
          count(lit(1)).over(wAll).cast(StringType),
          lit(s" distinct values > the documented bound of " +
            s"$maxCandidates — quantile-bucket the feature first")))))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__np", sum(col("__p")).over(wAll))
      .withColumn("__nl", sum(col("__c")).over(wCum))
      .withColumn("__pl", sum(col("__p")).over(wCum))
      .filter(col("__nl") < col("__n")) // right side must be non-empty
    def d(c: Column): Column = c.cast(DoubleType)
    def gini(pos: Column, n: Column): Column = {
      val p = d(pos) / d(n)
      val q = (d(n) - d(pos)) / d(n)
      lit(1.0) - p * p - q * q
    }
    val nr = col("__n") - col("__nl")
    val pr = col("__np") - col("__pl")
    val gl = gini(col("__pl"), col("__nl"))
    val gr = gini(pr, nr)
    val split = d(col("__nl")) / d(col("__n")) * gl +
      d(nr) / d(col("__n")) * gr
    val scored = cum.select(col("__v").as("threshold"),
      col("__n").as("n"), col("__np").as("n_pos"),
      col("__nl").as("n_left"), col("__pl").as("pos_left"),
      nr.as("n_right"), pr.as("pos_right"),
      gl.as("gini_left"), gr.as("gini_right"), split.as("gini_split"),
      (gini(col("__np"), col("__n")) - split).as("gini_gain"))
    scored.orderBy(col("gini_split").asc, col("threshold").asc).limit(1)
  }

  /** SMOOTHED TARGET ENCODING (m-estimate) — the leakage-aware categorical
    * featurizer: enc(c) = (Σy_c + m·μ)/(n_c + m), shrinking rare
    * categories toward the global mean μ so a 3-row category can't memorize
    * its targets — the standard high-cardinality encoder a feature
    * pipeline applies before any tree/linear fit at 100 TB (category
    * count is unbounded; every frame here is keyed, never collected).
    *
    * One keyed moment pass per category (floor-scaled exact Σy) + one
    * 1-row global moment frame joined back as a broadcast literal — the
    * fit-frame idiom, no global window, no driver data. Returns one row
    * per category: (category, n, cat_mean, encoded). */
  def targetEncode(df: DataFrame, catCol: String, valueCol: String,
                   m: Double = 100.0): DataFrame = {
    require(m > 0.0, s"m=$m")
    val y = col(valueCol).cast(DoubleType)
    val base = df.filter(col(catCol).isNotNull && y.isNotNull && !isnan(y))
      .select(col(catCol).cast(StringType).as("category"), y.as("__y"))
    val glob = base.agg(count(lit(1)).as("__gn"), isum(col("__y"), 6)
      .as("__gs"))
    val per = base.groupBy(col("category"))
      .agg(count(lit(1)).as("n"), isum(col("__y"), 6).as("__s"))
    def d(c: Column): Column = c.cast(DoubleType)
    val mu = col("__gs") / d(col("__gn"))
    per.crossJoin(broadcast(glob))
      .select(col("category"), col("n"),
        (col("__s") / d(col("n"))).as("cat_mean"),
        ((col("__s") + lit(m) * mu) / (d(col("n")) + lit(m))).as("encoded"))
  }
}
