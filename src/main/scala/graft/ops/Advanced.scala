package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's genuinely-sequential / numeric-kernel operators:
  * induction, LOESS smoothing, correlation table, crosstab.
  */
object Advanced {

  /** induction (reference dataset_api.clj:1402-1469): row-by-row accumulation
    * where each step sees the running state. Inherently sequential — executed
    * on a SINGLE partition by design (documented scale limit, as in SURVEY
    * §7.4; the reference is single-JVM here too).
    *
    * ESCAPE HATCH for scale: a LINEAR recurrence s_i = a·s_{i-1} + x_i (like
    * q54's decay-accumulate) is window-expressible as a weighted prefix sum —
    * s_i = Σ_j a^(i-j)·x_j = a^i · Σ_j x_j/a^j, i.e. a cumulative-sum window
    * over x_j·a^(-j) scaled by a^i — which distributes with an ordinary
    * partitioned window (beware a^(-j) overflow for long series: compute per
    * bounded segment, or carry segment offsets). Use induction only when the
    * step function is genuinely non-linear in the state. */
  def induction[T, S](ds: Dataset[T], zero: S)(step: (S, T) => S)
                     (implicit enc: Encoder[S]): Dataset[S] =
    ds.coalesce(1).mapPartitions(it => it.scanLeft(zero)(step).drop(1))

  /** interpolate-loess (reference src/tech/v3/dataset/math.clj:112-146):
    * Cleveland LOWESS re-implemented as a FIXED IEEE op sequence (sliding
    * bandwidth window advancing one step per point, tricube weights against
    * the farther window edge, closed-form pointwise weighted linear fit,
    * optional biweight robustness iterations). Algorithmically identical to
    * commons-math3's LoessInterpolator (which the reference wraps) —
    * AdvancedSpec pins bit-equality for robustnessIters = 0 — but with a
    * deterministic op order an external engine can replay add-for-add,
    * which is what lets q53's DuckDB oracle recompute the smooth exactly
    * via a recursive CTE. Groups are processed independently and in
    * parallel; each GROUP's points must fit in executor memory — identical
    * contract to the reference, which holds the whole dataset in one JVM.
    * Duplicate x values are averaged first (ascending-value sum order, so
    * the mean is partition-invariant). */
  def loessSmooth(df: DataFrame, groupCol: String, xCol: String, yCol: String,
                  bandwidth: Double = 0.3, robustnessIters: Int = 2): DataFrame = {
    require(bandwidth > 0 && bandwidth <= 1,
      s"bandwidth must be in (0, 1], got $bandwidth")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast(LongType).as("g"),
      col(xCol).cast(DoubleType).as("x"), col(yCol).cast(DoubleType).as("y"))
      // primitives in the encoder are non-nullable: drop null/uncastable
      // rows up front instead of crashing mid-job
      .filter(col("g").isNotNull && col("x").isNotNull && col("y").isNotNull)
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.toArray.groupBy(_._2).toArray
          .map { case (x, rows) => (x, rows.map(_._3).sorted.sum / rows.length) }
          .sortBy(_._1)
        if (pts.length < 3) pts.iterator.map(p => (g, p._1, p._2, p._2))
        else {
          val xs = pts.map(_._1); val ys = pts.map(_._2)
          val bw = math.max(bandwidth, math.min(1.0, 3.0 / pts.length))
          val sm = loessFit(xs, ys, bw, robustnessIters)
          pts.indices.iterator.map(i => (g, xs(i), ys(i), sm(i)))
        }
      }
      .toDF(groupCol, xCol, yCol, s"${yCol}_smooth")
  }

  /** LOESS over strictly increasing xs: one smoothing pass plus
    * `robustnessIters` biweight reweightings. The op sequence (window
    * slide test, tricube via (1−t³)³, five left-to-right running sums,
    * mean/beta/alpha forms, n/2-index median) mirrors commons-math3's
    * LoessInterpolator.smooth exactly so results are bit-identical where
    * both run — but every op here is explicit, which is the contract the
    * q53 DuckDB oracle replays. */
  private[graft] def loessFit(xs: Array[Double], ys: Array[Double],
                              bandwidth: Double, robustnessIters: Int)
      : Array[Double] = {
    val n = xs.length
    val q = math.min(math.max(2, (bandwidth * n).toInt), n)
    val res = new Array[Double](n)
    val robust = Array.fill(n)(1.0)
    var iter = 0
    var done = false
    while (!done) {
      var l = 0
      var r = q - 1
      var i = 0
      while (i < n) {
        val x = xs(i)
        // slide one step when the next right point is strictly closer than
        // the current left edge (commons-math updateBandwidthInterval with
        // all-ones user weights)
        if (i > 0 && r + 1 < n && xs(r + 1) - x < x - xs(l)) { l += 1; r += 1 }
        val edge = if (x - xs(l) > xs(r) - x) l else r
        val denom = math.abs(1.0 / (xs(edge) - x))
        var sumW = 0.0; var sumX = 0.0; var sumX2 = 0.0
        var sumY = 0.0; var sumXY = 0.0
        var k = l
        while (k <= r) {
          val xk = xs(k); val yk = ys(k)
          val dist = if (k < i) x - xk else xk - x
          val t = dist * denom // in [0, 1] by construction of edge
          val t3 = t * t * t
          val tmp = 1.0 - t3
          val w = tmp * tmp * tmp * robust(k)
          val xkw = xk * w
          sumW += w; sumX += xkw; sumX2 += xk * xkw
          sumY += yk * w; sumXY += yk * xkw
          k += 1
        }
        val mx = sumX / sumW; val my = sumY / sumW
        val mxy = sumXY / sumW; val mx2 = sumX2 / sumW
        val beta =
          if (math.sqrt(math.abs(mx2 - mx * mx)) < 1e-12) 0.0
          else (mxy - mx * my) / (mx2 - mx * mx)
        res(i) = beta * x + (my - beta * mx)
        i += 1
      }
      iter += 1
      if (iter > robustnessIters) done = true
      else {
        val absRes = Array.tabulate(n)(j => math.abs(ys(j) - res(j)))
        val sorted = absRes.sorted
        val med = sorted(n / 2)
        // commons-math stops when the median residual is below `accuracy`
        // (1e-12), not only at exactly 0 — near-interpolating fits (tiny
        // windows) hit this, and dividing by 6·med≈1e-16 would zero most
        // weights instead of stopping
        if (med < 1e-12) done = true
        else {
          var j = 0
          while (j < n) {
            val arg = absRes(j) / (6.0 * med)
            robust(j) =
              if (arg >= 1.0) 0.0 else { val w = 1.0 - arg * arg; w * w }
            j += 1
          }
        }
      }
    }
    res
  }

  /** correlation-table (reference math.clj:37-109): all-pairs Pearson over
    * the numeric columns, computed in ONE aggregation pass (every pair's
    * component sums are expressions in the same agg), then reshaped
    * driver-side into the square table. */
  def correlationTable(df: DataFrame, cols: Seq[String],
                       squareScale: Map[String, Int] = Map.empty): DataFrame = {
    import Reductions.isum
    // per-column square-sum scale, same rationale as descriptiveStats:
    // default 4 keeps small-magnitude data meaningful; large-magnitude
    // columns drop lower so floor(x²·10^s) stays exact in a double
    def sc(c: String): Int = squareScale.getOrElse(c, 4)
    val pairs = for (a <- cols; b <- cols if a < b) yield (a, b)
    // per-pair PAIRWISE-COMPLETE stats: each pair's n and all five sums share
    // one both-non-null predicate (a global count with per-sum null skipping
    // mixes mismatched counts and gives corr outside [-1,1])
    val aggs: Seq[Column] = pairs.flatMap { case (a, b) =>
      val both = col(a).isNotNull && col(b).isNotNull
      def s(c: Column, scale: Int) = isum(when(both, c), scale)
      Seq(
        count(when(both, 1)).cast(DoubleType).as(s"n_${a}__$b"),
        s(col(a), 4).as(s"sx_${a}__$b"), s(col(b), 4).as(s"sy_${a}__$b"),
        s(col(a) * col(a), sc(a)).as(s"sxx_${a}__$b"),
        s(col(b) * col(b), sc(b)).as(s"syy_${a}__$b"),
        s(col(a) * col(b), math.min(sc(a), sc(b))).as(s"sxy_${a}__$b"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def g(name: String): Double = row.getDouble(row.fieldIndex(name))
    def corr(a: String, b: String): Double =
      if (a == b) 1.0
      else {
        val (x, y) = if (a < b) (a, b) else (b, a)
        val k = s"${x}__$y"
        val n = g(s"n_$k")
        val sx = g(s"sx_$k"); val sy = g(s"sy_$k")
        (n * g(s"sxy_$k") - sx * sy) /
          (math.sqrt(n * g(s"sxx_$k") - sx * sx) * math.sqrt(n * g(s"syy_$k") - sy * sy))
      }
    val spark = df.sparkSession
    // wide scalar matrix (one column per input column): scalar-only output is
    // required by the oracle compare (array cells can't be sorted/hashed) and
    // reads like the reference's correlation table
    val schema = StructType(StructField("column", StringType, nullable = false) +:
      cols.map(c => StructField(c, DoubleType, nullable = false)))
    val rows = cols.map(a =>
      org.apache.spark.sql.Row.fromSeq(a +: cols.map(b => corr(a, b))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** crosstab (reference transpose-by-key usage): counts of a×b value
    * combinations as a wide table — explicit domain, no discovery scan. */
  def crosstab(df: DataFrame, rowCol: String, colCol: String,
               colValues: Seq[String]): DataFrame =
    Reshape.pivot(df, Seq(rowCol), colCol, colValues, count(lit(1)))
      .na.fill(0L, colValues)

  /** Distributed DOUBLED average rank (2·avg-rank — always an integer, so
    * downstream sums stay floor-exact) of column `c`'s values: equals the SQL
    * `2*rank() OVER (ORDER BY c) + count(*) OVER (PARTITION BY c) - 1`, but
    * with NO single-partition window. Plan: per-value counts (one shuffle),
    * range-partitioned sort of the DISTINCT values, per-partition totals →
    * driver prefix offsets (O(partitions) longs — not a data collect), then a
    * streaming per-partition cumulative sum. Returns the (value, rank) lookup
    * table and the persisted intermediate (persisted because the sorted
    * distinct-value table is consumed by TWO jobs: the offsets pass and the
    * rank pass) — the CALLER must unpersist it after its terminal action. */
  private[graft] def profRankTable(df: DataFrame, c: String, out: String) =
    doubledAvgRankTable(df, c, out)

  private[graft] def doubledAvgRankTable(df: DataFrame, c: String, out: String,
      smallMaxEntries: Long = SmallRankTableMaxEntries)
      : (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Persist the grouped (value, count) table FIRST: repartitionByRange
    // SAMPLES its child for the range partitioner, so an un-persisted child
    // would run the whole groupBy chain twice (sampling pass + shuffle pass).
    // The count() both materializes the cache and gives the exact distinct
    // cardinality, which picks the plan:
    //  - small (≤ 1M values): single-task cumulate over the tiny cached
    //    table + broadcast — no range machinery, and the rank-attach joins
    //    downstream become shuffle-free broadcast joins;
    //  - large: range-partitioned offsets path (the 100 TB shape), shuffle
    //    join downstream (a broadcast would be O(n) on the driver).
    val grouped = df.select(col(c).cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__n"))
      .as[(Double, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val distinctVals = grouped.count()
    if (distinctVals <= smallMaxEntries) {
      val ranks = grouped.repartition(1).sortWithinPartitions(col("__v"))
        .mapPartitions { it =>
          var cum = 0L
          it.map { case (v, n) => val dr = 2 * cum + n + 1; cum += n; (v, dr) }
        }.toDF("__v", out)
      (broadcast(ranks), () => { grouped.unpersist(); () })
    } else {
      val sorted = grouped
        .repartitionByRange(parts, col("__v"))
        .sortWithinPartitions(col("__v"))
        .as[(Double, Long)]
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val partTotals = sorted.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
        }.collect().sortBy(_._1).map(_._2)
      val offsets = partTotals.scanLeft(0L)(_ + _)
      val bc = spark.sparkContext.broadcast(offsets)
      val ranks = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var cum = bc.value(pid)
        it.map { case (v, n) => val dr = 2 * cum + n + 1; cum += n; (v, dr) }
      }.toDF("__v", out)
      (ranks, () => { sorted.unpersist(); grouped.unpersist(); () })
    }
  }

  /** ≤ 1M (value, rank) entries ≈ 16 MB — single-task cumulate + broadcast
    * territory (the join side stays shuffle-free, the cumulate is a trivial
    * streaming loop, and a 16 MB broadcast is well inside executor/driver
    * budgets — same order as a raised autoBroadcastJoinThreshold). Beyond
    * this the range-partitioned distributed offsets path runs with a shuffle
    * rank-attach join (a near-unique column over 10^9+ rows must not be
    * broadcast). */
  private val SmallRankTableMaxEntries = 1000000L

  /** correlation-table `:spearman` (reference math.clj:47-48,90-91): Pearson
    * over average ranks. Ranks are computed distributed (see
    * [[doubledAvgRankTable]]) and DOUBLED so every rank is an integer —
    * Pearson is invariant under positive affine maps, so τ_spearman(2r) =
    * τ_spearman(r), and integer ranks keep the floor-scaled component sums
    * bit-exact across engines. Rank-column magnitude bound: sums of r² stay
    * floor-exact while (2n)² < 2^53, i.e. n ≲ 4.7e7 rows per table — beyond
    * that the r² PRODUCT itself rounds in a double (same contract as plain
    * correlationTable on large-magnitude columns). */
  def spearmanCorrelationTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    // Each column's rank table is built from a SINGLE-COLUMN projection of
    // the source (never the join-chained frame — chaining makes rank build
    // k recompute joins 1..k-1, a quadratic lineage) and the k independent
    // builds are submitted concurrently: each needs its own small offsets
    // job, and Spark happily interleaves them.
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(cols.size, 8)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val built =
      try Await.result(Future.sequence(cols.map { c =>
        Future(doubledAvgRankTable(df.select(col(c)), c, s"__r_$c"))
      }), Duration.Inf)
      finally pool.shutdown()
    var ranked = df.select(cols.map(col): _*)
    cols.zip(built).foreach { case (c, (ranks, _)) =>
      ranked = ranked.join(ranks, ranked(c).cast(DoubleType) === ranks("__v"), "left")
        .drop("__v")
    }
    val rdf = ranked.select(cols.map(c => col(s"__r_$c").cast(DoubleType).as(c)): _*)
    // rank sums: sx floor-scale 4 is exact on integers; r² and r·r' at scale 0
    val out = correlationTable(rdf, cols, squareScale = cols.map(_ -> 0).toMap)
    built.foreach(_._2())  // cleanup: correlationTable collect()s — safe now
    out
  }

  /** correlation-table `:kendall` (reference math.clj:47-48,90-91): tau-b
    * over ALL ROW PAIRS — inherently O(n²); intended for BOUNDED blocks
    * (mirror of the reference, whose kendall also materializes pair
    * statistics). All concordant/discordant/tie counts are exact integers
    * from one aggregation over the pair frame; the final tau arithmetic is
    * plain IEEE doubles, identical on any engine. Rows with a null in any of
    * `cols` are dropped first (complete-case, like commons-math). `idCol`
    * must be unique per row (pair dedup via id_l < id_r).
    *
    * API SAFETY: because the pair frame is quadratic, inputs above
    * `maxRows` (default 100k ⇒ ≤5·10⁹ pair rows) are REFUSED rather than
    * silently launching an unbounded cartesian — sample or block the input
    * first, or use `spearmanCorrelationTable` (fully distributed) for
    * monotone association at scale. The count-check costs one pass over the
    * complete-case frame. */
  def kendallCorrelationTable(df: DataFrame, cols: Seq[String],
                              idCol: String,
                              maxRows: Long = 100000L): DataFrame = {
    val base = df.na.drop(cols)
    val n = base.count()
    require(n <= maxRows,
      s"kendallCorrelationTable is all-pairs (O(n^2)): got $n complete-case " +
        s"rows > maxRows=$maxRows. Sample/block the input, raise maxRows " +
        "deliberately, or use spearmanCorrelationTable for scale.")
    val l = base.select(col(idCol).as("__il") +:
      cols.map(c => col(c).cast(DoubleType).as(s"__l_$c")): _*)
    val r = base.select(col(idCol).as("__ir") +:
      cols.map(c => col(c).cast(DoubleType).as(s"__r_$c")): _*)
    val p = l.crossJoin(r).filter(col("__il") < col("__ir"))
    def d(c: String) = col(s"__l_$c") - col(s"__r_$c")
    val pairs = for (a <- cols; b <- cols if a < b) yield (a, b)
    val aggs: Seq[Column] =
      (count(lit(1)).as("n0") +:
        cols.map(c => count(when(d(c) === 0, 1)).as(s"t_$c"))) ++
        pairs.flatMap { case (a, b) =>
          val s = signum(d(a)) * signum(d(b))
          Seq(count(when(s > 0, 1)).as(s"c_${a}__$b"),
            count(when(s < 0, 1)).as(s"d_${a}__$b"))
        }
    val row = p.agg(aggs.head, aggs.tail: _*).collect()(0)
    def g(name: String): Double = row.getLong(row.fieldIndex(name)).toDouble
    def tau(a: String, b: String): Double =
      if (a == b) 1.0
      else {
        val (x, y) = if (a < b) (a, b) else (b, a)
        (g(s"c_${x}__$y") - g(s"d_${x}__$y")) /
          (math.sqrt(g("n0") - g(s"t_$x")) * math.sqrt(g("n0") - g(s"t_$y")))
      }
    val spark = df.sparkSession
    val schema = StructType(StructField("column", StringType, nullable = false) +:
      cols.map(c => StructField(c, DoubleType, nullable = false)))
    val rows = cols.map(a =>
      org.apache.spark.sql.Row.fromSeq(a +: cols.map(b => tau(a, b))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
