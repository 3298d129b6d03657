package graft.ops

import org.apache.commons.math3.analysis.interpolation.LoessInterpolator
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
    * §7.4; the reference is single-JVM here too). Use window cumulatives
    * instead whenever the accumulation is expressible as one. */
  def induction[T, S](ds: Dataset[T], zero: S)(step: (S, T) => S)
                     (implicit enc: Encoder[S]): Dataset[S] =
    ds.coalesce(1).mapPartitions(it => it.scanLeft(zero)(step).drop(1))

  /** interpolate-loess (reference src/tech/v3/dataset/math.clj:112-146) via
    * commons-math3 (ships with Spark). Groups are processed independently and
    * in parallel; each GROUP's points must fit in executor memory — identical
    * contract to the reference, which holds the whole dataset in one JVM.
    * Duplicate x values are averaged first (LoessInterpolator requires a
    * strictly increasing abscissa). */
  def loessSmooth(df: DataFrame, groupCol: String, xCol: String, yCol: String,
                  bandwidth: Double = 0.3): DataFrame = {
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
          .map { case (x, rows) => (x, rows.map(_._3).sum / rows.length) }
          .sortBy(_._1)
        if (pts.length < 3) pts.iterator.map(p => (g, p._1, p._2, p._2))
        else {
          val xs = pts.map(_._1); val ys = pts.map(_._2)
          val bw = math.max(bandwidth, math.min(1.0, 3.0 / pts.length))
          val sm = new LoessInterpolator(bw, 2).smooth(xs, ys)
          pts.indices.iterator.map(i => (g, xs(i), ys(i), sm(i)))
        }
      }
      .toDF(groupCol, xCol, yCol, s"${yCol}_smooth")
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
}
