package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Bounded._

/** Missing-data engine: the reference's replace-missing strategies
  * (reference src/tech/v3/dataset/missing.clj:209-293) on SQL-null semantics.
  *
  * TMD operates on positional row order; a distributed table has no implicit
  * order, so every directional strategy takes explicit ordering columns
  * (callers pass the natural key, e.g. event time). Each strategy is a window
  * computation: one shuffle on the partition keys, no collect.
  */
object Missing {

  /** drop-missing (reference base.clj:435-441). */
  def dropMissing(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame =
    if (cols.isEmpty) df.na.drop() else df.na.drop(cols)

  /** select-missing (reference base.clj:443-446). */
  def selectMissing(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _))

  /** replace-missing :value (missing.clj:268-273). A NULL fill value is
    * a no-op for that column — the reference's all-values-missing pin
    * (dataset_test.clj replace-missing-all-values-missing: filling with
    * a stat computed over an all-missing column leaves it missing). */
  def fillValue(df: DataFrame, values: Map[String, Any]): DataFrame = {
    val nonNull = values.filter(_._2 != null)
    if (nonNull.isEmpty) df else df.na.fill(nonNull)
  }

  private def wDown(order: Seq[Column], part: Seq[Column]) =
    Window.partitionBy(part: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def wUp(order: Seq[Column], part: Seq[Column]) =
    Window.partitionBy(part: _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

  /** :down — carry last valid value forward (missing.clj:218-231). */
  def fillDown(df: DataFrame, c: String, order: Seq[Column],
               part: Seq[Column] = Seq.empty): DataFrame =
    df.withColumn(c, coalesce(col(c),
      last(col(c), ignoreNulls = true).over(wDown(order, part))))

  /** :up — carry next valid value backward (missing.clj:233-243). */
  def fillUp(df: DataFrame, c: String, order: Seq[Column],
             part: Seq[Column] = Seq.empty): DataFrame =
    df.withColumn(c, coalesce(col(c),
      first(col(c), ignoreNulls = true).over(wUp(order, part))))

  /** :downup / :updown (missing.clj:245-255). */
  def fillDownUp(df: DataFrame, c: String, order: Seq[Column],
                 part: Seq[Column] = Seq.empty): DataFrame =
    df.withColumn(c, coalesce(col(c),
      last(col(c), ignoreNulls = true).over(wDown(order, part)),
      first(col(c), ignoreNulls = true).over(wUp(order, part))))

  def fillUpDown(df: DataFrame, c: String, order: Seq[Column],
                 part: Seq[Column] = Seq.empty): DataFrame =
    df.withColumn(c, coalesce(col(c),
      first(col(c), ignoreNulls = true).over(wUp(order, part)),
      last(col(c), ignoreNulls = true).over(wDown(order, part))))

  /** :lerp — linear interpolation between the surrounding valid values over an
    * index column (missing.clj:163-189). :midpoint is lerp with t=0.5
    * (missing.clj:186). Falls back to nearest edge value at the boundaries,
    * like the reference's :downup tail behavior. */
  def fillLerp(df: DataFrame, c: String, idx: Column,
               part: Seq[Column] = Seq.empty, midpoint: Boolean = false): DataFrame = {
    val down = wDown(Seq(idx.asc), part)
    val up = wUp(Seq(idx.asc), part)
    val pv = last(col(c), ignoreNulls = true).over(down)
    val px = last(when(col(c).isNotNull, idx), ignoreNulls = true).over(down)
    val nv = first(col(c), ignoreNulls = true).over(up)
    val nx = first(when(col(c).isNotNull, idx), ignoreNulls = true).over(up)
    val t =
      if (midpoint) lit(0.5)
      else (idx.cast("double") - px.cast("double")) /
        (nx.cast("double") - px.cast("double"))
    val interp = pv + (nv - pv) * t
    df.withColumn(c,
      when(col(c).isNotNull, col(c))
        .when(pv.isNotNull && nv.isNotNull, interp)
        .otherwise(coalesce(pv, nv)))
  }

  /** :nearest — value from the closest valid neighbor by index distance
    * (missing.clj:256-261); ties go down(previous), like the reference. */
  def fillNearest(df: DataFrame, c: String, idx: Column,
                  part: Seq[Column] = Seq.empty): DataFrame = {
    val down = wDown(Seq(idx.asc), part)
    val up = wUp(Seq(idx.asc), part)
    val pv = last(col(c), ignoreNulls = true).over(down)
    val px = last(when(col(c).isNotNull, idx), ignoreNulls = true).over(down)
    val nv = first(col(c), ignoreNulls = true).over(up)
    val nx = first(when(col(c).isNotNull, idx), ignoreNulls = true).over(up)
    val dp = abs(idx.cast("double") - px.cast("double"))
    val dn = abs(nx.cast("double") - idx.cast("double"))
    df.withColumn(c,
      when(col(c).isNotNull, col(c))
        .when(pv.isNotNull && (nv.isNull || dp <= dn), pv)
        .otherwise(nv))
  }

  /** :abb — approximate Bayesian bootstrap (missing.clj:99-109): each missing
    * slot is filled by a with-replacement draw from the observed values.
    * Distributed: observed values are indexed once, missing rows draw a
    * seeded-random index and join — two shuffles, no collect, reproducible
    * for a fixed seed and input partitioning. */
  def fillAbb(df: DataFrame, c: String, seed: Long): DataFrame = {
    val spark = df.sparkSession
    // distributed dense index over the observed values: rdd.zipWithIndex is
    // a per-partition count + offset (no single-task global window, no
    // broadcast of the observed set — the join shuffles on the drawn index)
    val obsRdd = df.filter(col(c).isNotNull).select(col(c)).rdd
      .map(_.get(0)).zipWithIndex()
    val nObs = obsRdd.count()
    if (nObs == 0) df
    else {
      val obsDf = spark.createDataFrame(
        obsRdd.map { case (v, i) => org.apache.spark.sql.Row(i, v) },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("__abb_i",
            org.apache.spark.sql.types.LongType),
          df.schema(c).copy(name = "__abb_v"))))
      df.withColumn("__abb_i",
          when(col(c).isNull, floor(rand(seed) * nObs).cast("long")))
        .join(obsDf, Seq("__abb_i"), "left")
        .withColumn(c, coalesce(col(c), col("__abb_v")))
        .drop("__abb_i", "__abb_v")
    }
  }

  /** `:abb` with CONTENT-DERIVED draws — same bootstrap semantics as
    * [[fillAbb]] but every random choice is an md5 fold of the row's key, so
    * the result is a pure function of the data (engine-portable, DuckDB
    * oracle-checkable — the q29/q52 determinism technique). The observed
    * values are indexed by their sorted position: ties get arbitrary index
    * assignment, but index→value is still a well-defined function (i-th
    * smallest of the multiset), so the OUTPUT is deterministic. Index build
    * is the distributed range-sort + zipWithIndex path — no single-task
    * window, two shuffles total, scales. */
  def fillAbbDeterministic(df: DataFrame, c: String, keyCols: Seq[String],
                           seed: Long): DataFrame = {
    import graft.ops.TableOps._
    val obs = df.filter(col(c).isNotNull)
      .select(col(c).as("__abb_v"))
      .withRowIndexDistributed(Seq(col("__abb_v")), "__abb_i")
    val nObs = obs.count()
    if (nObs == 0) df
    else {
      df.withColumn("__abb_i",
          when(col(c).isNull,
            pmod(conv(substring(md5(concat_ws("#",
              (lit(seed) +: keyCols.map(col)): _*)), 1, 15), 16, 10)
              .cast(org.apache.spark.sql.types.LongType), lit(nObs))))
        .join(obs, Seq("__abb_i"), "left")
        .withColumn(c, coalesce(col(c), col("__abb_v")))
        .drop("__abb_i", "__abb_v")
    }
  }

  /** remove-empty-columns (reference dataset_api.clj:218-236): drop columns
    * that are entirely null — one counting pass, then a driver-side select. */
  def removeEmptyColumns(df: DataFrame): DataFrame = {
    val counts = df.agg(count(lit(1)).as("__n"),
      df.columns.map(c => count(col(c)).as(c)).toSeq: _*).collectBounded(1, "one-row count agg")(0)
    val keep = df.columns.filter(c => counts.getAs[Long](c) > 0L)
    df.select(keep.map(col).toSeq: _*)
  }

  /** fill-range-replace (reference src/tech/v3/dataset/math.clj:160-232):
    * densify a numeric axis so consecutive gaps are ≤ maxSpan, then other
    * columns can be imputed. sequence() + explode generates the grid
    * distributively; the original rows are preserved exactly.
    *
    * Pass `partitionBy` (e.g. the series/user key) to densify each group's
    * axis independently — the window then shuffles on the key and scales.
    * The KEYLESS form distributes too: the axis is quantile-cut into P
    * value-derived buckets ([[ValueBuckets]]), `lead` runs per bucket, and
    * each bucket's last row takes its successor from an O(P)-row frame of
    * bucket minima (first non-null minimum among FOLLOWING buckets) — no
    * single global-window task. */
  def fillRange(df: DataFrame, axis: String, maxSpan: Double,
                partitionBy: Seq[String] = Nil): DataFrame = {
    val withNext =
      if (partitionBy.isEmpty) keylessLead(df, axis)
      else {
        val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(axis))
        df.withColumn("__next", lead(col(axis), 1).over(w))
      }
    val inserted = withNext
      // per-gap: number of inserted points so every step ≤ maxSpan
      // (materialized before the filter+generate — window exprs can't sit
      // inside a generator)
      .withColumn("__steps",
        ceil((col("__next") - col(axis)) / lit(maxSpan)).cast("int"))
      .filter(col("__next").isNotNull && col("__next") - col(axis) > lit(maxSpan))
      .withColumn("__k", explode(sequence(lit(1), col("__steps") - 1)))
      // inserted rows keep their group's partition-key values — they belong
      // to that series; only the remaining columns are padded with null
      .select(((col(axis) + (col("__next") - col(axis)) * col("__k") / col("__steps").cast("double")).as(axis)
        +: partitionBy.map(col)): _*)
    val padded = df.columns.filterNot(c => c == axis || partitionBy.contains(c))
      .foldLeft(inserted)(
        (d, c) => d.withColumn(c, lit(null).cast(df.schema(c).dataType)))
    df.unionByName(padded.select(df.columns.map(col): _*))
      .orderBy((partitionBy.map(col) :+ col(axis)): _*)
  }

  /** Global (keyless) `lead(axis, 1)` without a global window: per-bucket
    * lead + the bucket-boundary successor patched in from an O(P)-row
    * frame. Only each bucket's LAST row has a null in-bucket lead; its true
    * successor is the first non-null bucket-minimum among following buckets
    * (empty and all-null-axis buckets fall through via ignoreNulls). The
    * overall last row keeps a null `__next`, exactly like the global
    * window. Ids come from [[ValueBuckets]], so every branch of this plan
    * agrees on them by construction. */
  private def keylessLead(df: DataFrame, axis: String): DataFrame = {
    val bucketed = ValueBuckets.assign(df, col(axis), "__pid")
    val wB = Window.partitionBy("__pid").orderBy(col(axis))
    val local = bucketed.withColumn("__next",
      lead(col(axis), 1).over(wB))
    val mins = local.groupBy(col("__pid").as("__bpid"))
      .agg(min(col(axis)).as("__bmin"))
    val wNext = Window.orderBy(col("__bpid"))
      .rowsBetween(1, Window.unboundedFollowing)
    val succ = mins
      .withColumn("__succ", first(col("__bmin"), ignoreNulls = true).over(wNext))
      .select(col("__bpid"), col("__succ"))
    local.join(broadcast(succ), col("__pid") === col("__bpid"), "left")
      .withColumn("__next", coalesce(col("__next"), col("__succ")))
      .drop("__pid", "__bpid", "__succ")
  }

  /** replace-missing :mode — fill nulls with the group's MOST FREQUENT
    * non-null value (ties → lowest value, a total deterministic rule).
    * The categorical imputation the :value/:down/:lerp family can't
    * express. One (group, value) count aggregation + a per-GROUP
    * row_number pick over the count frame (bounded by the group's
    * distinct values, not its rows) broadcast back; groups that are
    * entirely null stay null. */
  def fillModeByGroup(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__c").desc, col("__v").asc)
    val modes = counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__g"), col("__v").as("__mode"))
    df.join(modes, col(groupCol) === col("__g"), "left")
      .withColumn(valueCol, coalesce(col(valueCol), col("__mode")))
      .drop("__g", "__mode")
  }
}
