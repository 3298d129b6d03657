package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Fitted standard-scaler: (mean, stddev_pop) per column, exact. */
  case class ScalerModel(stats: Map[String, (Double, Double)]) {
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
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    ScalerModel(cols.map { c =>
      c -> (row.getDouble(row.fieldIndex(s"${c}__mu")),
        row.getDouble(row.fieldIndex(s"${c}__sd")))
    }.toMap)
  }

  /** Fitted min-max scaler to [0,1]. */
  case class MinMaxModel(ranges: Map[String, (Double, Double)]) {
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
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    MinMaxModel(cols.map { c =>
      c -> (row.getDouble(row.fieldIndex(s"${c}__lo")),
        row.getDouble(row.fieldIndex(s"${c}__hi")))
    }.toMap)
  }

  /** PCA fit/transform via MLlib (reference neanderthal.clj:73-331 →
    * ml.feature.PCA). Output: `pc` vector column with k components. */
  /** Fitted PCA: top-k eigenvectors (rows of `components`, descending
    * eigenvalue) of the population covariance matrix. Transform = pure column
    * arithmetic (pc_j = Σ_i v_ji·x_i, the MLlib convention: RAW values
    * projected, covariance computed about the mean) — no vector UDT, no UDF,
    * stays in whole-stage codegen. */
  case class PcaModel(cols: Seq[String], components: Array[Array[Double]],
                      eigenvalues: Array[Double]) {
    def transform(df: DataFrame): DataFrame =
      df.withColumn("pc", array(components.map { v =>
        cols.zip(v).map { case (c, w) => col(c).cast(DoubleType) * lit(w) }
          .reduce(_ + _)
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

  def fitPca(df: DataFrame, cols: Seq[String], k: Int,
             colScale: Map[String, Int] = Map.empty): PcaModel = {
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
    val row = df.na.drop(cols).agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getDouble(row.fieldIndex("__n"))
    val s = cols.map(c => row.getDouble(row.fieldIndex(s"__s_$c"))).toArray
    val cov = Array.ofDim[Double](d, d)
    pairs.foreach { case (i, j) =>
      val p = row.getDouble(row.fieldIndex(s"__p_${i}_$j"))
      val c = (p - s(i) * s(j) / n) / n
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (evals, evecs) = jacobiEigen(cov)
    val sorted = (0 until d).map(i => (evals(i),
        Array.tabulate(d)(r => evecs(r)(i))))
      .sortBy(-_._1).take(k)
    val comps = sorted.map { case (_, v) =>
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(cols, comps, sorted.map(_._1).toArray)
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
}
