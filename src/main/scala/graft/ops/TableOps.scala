package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core verb facade: the reference's dataset-as-map API re-expressed as a thin,
  * typed layer over DataFrame transforms.
  *
  * Reference surface covered here (all `path:line` cites into /root/reference):
  *  - select/drop/rename columns   — src/tech/v3/dataset/base.clj:231-358
  *  - filter / filter-column       — src/tech/v3/dataset/base.clj:464-504
  *  - head/tail/sample/shuffle     — src/tech/v3/dataset_api.clj:381-445
  *  - sort-by-column               — src/tech/v3/dataset/base.clj:570-616
  *  - unique-by-column             — src/tech/v3/dataset/base.clj:760-794
  *  - concat (union + widening)    — src/tech/v3/dataset/base.clj:619-750
  *  - column-cast                  — src/tech/v3/dataset_api.clj:1026-1123
  *  - column filters (by type)     — src/tech/v3/dataset/column_filters.clj:22-149
  *
  * Everything stays declarative (a LogicalPlan transform), so Catalyst keeps
  * pushdown/pruning working: none of these verbs force an action or collect.
  */
object TableOps {

  implicit class DatasetExt(val df: DataFrame) extends AnyVal {

    /** select-columns (reference base.clj:301-319). */
    def selectColumns(names: String*): DataFrame = df.select(names.map(col): _*)

    /** select-columns with a Map = select + rename in one step
      * (reference base.clj:311 "Map argument"). */
    def selectRename(mapping: (String, String)*): DataFrame =
      df.select(mapping.map { case (from, to) => col(from).as(to) }: _*)

    /** drop-columns (reference base.clj:328-340). */
    def dropColumns(names: String*): DataFrame = df.drop(names: _*)

    /** rename-columns (reference base.clj:343-358). */
    def renameColumns(mapping: (String, String)*): DataFrame =
      df.withColumnsRenamed(mapping.toMap)

    /** filter-column with a predicate Column (reference base.clj:474-504). */
    def filterColumn(name: String, pred: Column => Column): DataFrame =
      df.filter(pred(col(name)))

    /** filter-column 2-arity: keep rows where the column is truthy
      * (reference base.clj:497-504 — non-nil / non-false / non-zero). */
    def filterColumnTruthy(name: String): DataFrame = {
      val c = col(name)
      df.schema(name).dataType match {
        case BooleanType => df.filter(c)
        case FloatType | DoubleType =>
          // reference treats NaN as falsy alongside 0 (base.clj:497-504)
          df.filter(c.isNotNull && !isnan(c) && c =!= lit(0))
        case _: NumericType => df.filter(c.isNotNull && c =!= lit(0))
        case _ => df.filter(c.isNotNull)
      }
    }

    /** Positional row index over an explicit total order — the bridge to the
      * reference's index-space ops (select-rows/drop-rows, base.clj:397-425).
      * A distributed table has no implicit order, so the caller names one;
      * the index is then stable and reproducible.
      *
      * This default is the SCALE PATH: distributed range sort (orderBy) +
      * zipWithIndex (one extra O(partitions) offsets job) — no single-task
      * stage anywhere. Costs an RDD round-trip, so the plan below it is a
      * fresh scan barrier; withRowIndexLocal keeps the pure-plan window
      * form for small frames. */
    def withRowIndex(order: Seq[Column], name: String = "row_idx"): DataFrame = {
      val sorted = df.orderBy(order: _*)
      val schema = sorted.schema.add(name, LongType, nullable = false)
      val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }
      df.sparkSession.createDataFrame(rdd, schema)
    }

    /** Window-based row index — stays a pure Catalyst plan (no RDD barrier)
      * but the partition-less window funnels the WHOLE table through one
      * task. SCALE WARNING: small/medium frames only (the reference's
      * single-JVM index space has the same bound); withRowIndex is the
      * distributed default. */
    def withRowIndexLocal(order: Seq[Column], name: String = "row_idx"): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn(name,
        row_number().over(Window.orderBy(order: _*)) - lit(1L))
    }

    /** Former name of the distributed default; kept for source compatibility. */
    def withRowIndexDistributed(order: Seq[Column],
                                name: String = "row_idx"): DataFrame =
      withRowIndex(order, name)

    /** Per-stratum positional rank (1-based) over an explicit in-stratum
      * order, DISTRIBUTED: one global range sort on (stratum, order…) +
      * zipWithIndex (via [[withRowIndex]]), then per-stratum start offsets
      * subtracted through a broadcast of the O(strata) count frame. The
      * obvious `row_number().over(Window.partitionBy(stratum))` funnels each
      * stratum through a SINGLE task — with a handful of languages over
      * 100 TB that is a handful of tasks for the whole corpus — so this is
      * the scale path for stratified splits and per-stratum quantile
      * bucketing. Strata values must be non-null; `order` must be a total
      * order within each stratum (callers append an id tiebreak). Adds
      * `rankName` (1-based rank within stratum) and `nName` (stratum size). */
    def stratifiedRank(strataCol: String, order: Seq[Column],
                       rankName: String = "stratum_rank",
                       nName: String = "stratum_n"): DataFrame = {
      val idx = df.withRowIndex(col(strataCol) +: order, "__g_idx")
      val counts = df.groupBy(col(strataCol))
        .agg(count(lit(1)).as(nName))
      // cumulative offsets over the tiny per-stratum frame: O(strata) rows,
      // the unpartitioned window is bounded by construction
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(strataCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offs = counts.withColumn("__off",
        coalesce(sum(col(nName)).over(w), lit(0L)))
      idx.join(broadcast(offs), strataCol)
        .withColumn(rankName, col("__g_idx") - col("__off") + lit(1L))
        .drop("__g_idx", "__off")
    }

    /** [[stratifiedRank]] with a CALLER-SUPPLIED per-stratum count frame
      * (strataCol, nName columns): skips the counts scan of `df`, leaving
      * the range sort as df's ONLY consumer. Use when the counts are
      * already known from an earlier pass over the same rows (e.g. MAD's
      * second selection — |x−median| has exactly the first pass's
      * complete-case counts). The caller owns count correctness: wrong
      * counts silently mis-rank. */
    def stratifiedRankPrecounted(strataCol: String, order: Seq[Column],
                                 counts: DataFrame,
                                 rankName: String = "stratum_rank",
                                 nName: String = "stratum_n"): DataFrame = {
      val idx = df.withRowIndex(col(strataCol) +: order, "__g_idx")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(strataCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val offs = counts.select(col(strataCol), col(nName))
        .withColumn("__off", coalesce(sum(col(nName)).over(w), lit(0L)))
      idx.join(broadcast(offs), strataCol)
        .withColumn(rankName, col("__g_idx") - col("__off") + lit(1L))
        .drop("__g_idx", "__off")
    }

    /** take-nth (reference dataset_api.clj:99 re-export of base take-nth):
      * every n-th row of the named total order, distributed (see
      * withRowIndex). */
    def takeNth(n: Int, order: Seq[Column]): DataFrame =
      withRowIndex(order, "__takeN_idx")
        .filter(col("__takeN_idx") % n === 0).drop("__takeN_idx")

    /** rand-nth (reference dataset_api.clj:504-507): one uniformly-chosen
      * row. Seeded like sampleRows — stable for a fixed partitioning (the
      * reference's single-JVM rand-nth is likewise run-local randomness). */
    def randNth(seed: Long = 42L): DataFrame =
      df.orderBy(rand(seed)).limit(1)

    /** select-rows by index list; NEGATIVE indices count from the end
      * (reference dataset_test.clj `negative-index-on-columns-gets-last`:
      * −1 = last row). Requires a row index column from withRowIndex.
      * The from-end resolution stays in-plan: row count rides a 1-row
      * broadcast aggregate (never a driver readout), so the positive
      * fast path's single codegen'd IN filter is unchanged. */
    def selectRows(idxCol: String, indices: Seq[Long]): DataFrame =
      filterByIndex(idxCol, indices, keep = true)

    /** drop-rows by index list (negative = from end, as selectRows). */
    def dropRows(idxCol: String, indices: Seq[Long]): DataFrame =
      filterByIndex(idxCol, indices, keep = false)

    private def filterByIndex(idxCol: String, indices: Seq[Long],
                              keep: Boolean): DataFrame = {
      val (neg, pos) = indices.partition(_ < 0)
      val posHit =
        if (pos.isEmpty) lit(false) else col(idxCol).isin(pos: _*)
      if (neg.isEmpty)
        return df.filter(if (keep) posHit else !posHit)
      // n = max index + 1 as a 1-row broadcast aggregate (never a
      // driver readout): idx − n ∈ negs ⇔ idx is the |neg|-th from end
      val nf = broadcast(df.agg((max(col(idxCol)) + lit(1L)).as("__n")))
      val hit = posHit || (col(idxCol) - col("__n")).isin(neg: _*)
      df.crossJoin(nf)
        .filter(if (keep) hit else !hit)
        .drop("__n")
    }

    /** head (reference dataset_api.clj:381-389). */
    def head(n: Int): DataFrame = df.limit(n)

    /** tail (reference dataset_api.clj:392-404): needs a total order to be
      * meaningful on a distributed table; callers pass the ordering columns. */
    def tail(n: Int, orderCols: Seq[Column]): DataFrame =
      df.orderBy(orderCols.map(_.desc): _*).limit(n)
        .orderBy(orderCols: _*)

    /** shuffle (reference base.clj:797-800) — seeded for reproducibility. */
    def shuffleRows(seed: Long): DataFrame = df.orderBy(rand(seed))

    /** sample ± replacement (reference dataset_api.clj:407-445). */
    def sampleRows(fraction: Double, withReplacement: Boolean = false,
                   seed: Long = 42L): DataFrame =
      df.sample(withReplacement, fraction, seed)

    /** Deterministic hash sample: keep rows whose md5-derived key hash falls
      * in the first `percent` of 100 buckets. Unlike seeded `sample` (stable
      * only for a fixed partitioning), the kept set depends ONLY on key
      * values — identical on any cluster size, engine, or file split, which
      * is what a reproducible 100 TB pipeline actually needs. */
    def hashSampleRows(percent: Int, keyCols: Seq[String]): DataFrame =
      df.filter(
        pmod(conv(substring(md5(concat_ws("#", keyCols.map(col): _*)), 1, 15),
          16, 10).cast(LongType), lit(100L)) < percent)

    /** Deterministic WEIGHTED Bernoulli sample: row kept with probability
      * ∝ its (non-negative integer) weight — P(keep) = w / max(w), decided
      * by the same md5-derived per-key uniform as hashSampleRows, so the
      * kept set is a pure function of key + weight values (engine/layout/
      * rescale-invariant; an incremental rebuild keeps its sample). The
      * comparison u·maxW < w·10⁶ is pure integer arithmetic — no float
      * threshold to drift. maxW comes from a 1-row broadcast aggregate,
      * not a collect. Bound: maxW < 2^53/10⁶ ≈ 9·10⁹ per-row weight. */
    def hashSampleRowsWeighted(weightCol: String, keyCols: Seq[String])
        : DataFrame = {
      val mx = df.agg(max(col(weightCol).cast(LongType)).as("__maxw"))
      df.crossJoin(broadcast(mx))
        .filter(
          pmod(conv(substring(md5(concat_ws("#", keyCols.map(col): _*)), 1, 15),
            16, 10).cast(LongType), lit(1000000L)) * col("__maxw") <
            col(weightCol).cast(LongType) * lit(1000000L))
        .drop("__maxw")
    }

    /** WEIGHTED SAMPLE WITHOUT REPLACEMENT, exactly k rows
      * (Efraimidis–Spirakis 2006 exponential race): each row draws a
      * deterministic uniform u from the md5 of its key columns (the q158
      * hash-uniform, offset to (0,1) as (h+½)/10⁶) and races with key
      * ln(u)/w — the k largest win, which IS the weighted
      * without-replacement draw (P(row first) = wᵢ/Σw, then recurse).
      * Unlike [[hashSampleRowsWeighted]] (independent Bernoulli, random
      * output size), this returns exactly min(k, eligible) rows. Rows
      * with null/zero/negative weight never win. Race keys are
      * floor-scaled (10⁹) to integers and tie-broken by the key columns,
      * so the winning set is engine- and partition-invariant.
      *
      * Plan: one codegen pass computes the race key; the selection is a
      * TakeOrderedAndProject (per-partition top-k heaps + one O(k) merge
      * — no global sort, no shuffle of the losers). */
    def hashSampleTopKWeighted(weightCol: String, k: Int,
                               keyCols: Seq[String]): DataFrame = {
      require(k > 0, s"k=$k must be positive")
      val h = pmod(conv(substring(md5(concat_ws("#", keyCols.map(col): _*)),
        1, 15), 16, 10).cast(LongType), lit(1000000L))
      val u = (h.cast(DoubleType) + 0.5) / lit(1e6)
      val w = col(weightCol).cast(DoubleType)
      df.filter(w.isNotNull && !isnan(w) && w > 0.0)
        .withColumn("__race", floor(log(u) / w * lit(1e9)).cast(LongType))
        .orderBy(col("__race").desc +: keyCols.map(c => col(c).asc): _*)
        .limit(k)
        .drop("__race")
    }

    /** sort-by-column with TMD nulls-first default (reference base.clj:596-616;
      * :nan-strategy handled by normalizeNan below). */
    def sortByColumn(name: String, descending: Boolean = false,
                     nullsFirst: Boolean = true): DataFrame = {
      val c = (descending, nullsFirst) match {
        case (false, true)  => col(name).asc_nulls_first
        case (false, false) => col(name).asc_nulls_last
        case (true, true)   => col(name).desc_nulls_first
        case (true, false)  => col(name).desc_nulls_last
      }
      df.orderBy(c)
    }

    /** TMD `:nan-strategy` bridge (reference base.clj:583-588): map NaN→null so
      * null-ordering flags control NaN placement like the reference's
      * :first/:last. */
    def normalizeNan(names: String*): DataFrame =
      names.foldLeft(df)((d, n) =>
        d.withColumn(n, when(isnan(col(n)), lit(null)).otherwise(col(n))))

    /** unique-by-column, keeping the row with the smallest tiebreaker —
      * deterministic version of reference base.clj:760-794 (whose keep-fn
      * defaults to "first seen"). Implemented as a window row_number filter so
      * it is one shuffle on the key, no global sort. */
    def uniqueByColumn(key: Seq[String], tiebreak: Seq[Column]): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(key.map(col): _*).orderBy(tiebreak: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

    /** Plain distinct rows (unique-by identity). */
    def uniqueRows: DataFrame = df.distinct()

    /** concat = union-all by name with TMD type widening
      * (reference base.clj:619-750: missing columns become all-null, numeric
      * types widen via widest-datatype). Spark's unionByName does not widen, so
      * we pre-compute the common schema and cast both sides. */
    def concatWidening(others: DataFrame*): DataFrame = {
      val all = df +: others
      val widened = Concat.commonSchema(all.map(_.schema))
      val casted = all.map { d =>
        val withAll = widened.fields.foldLeft(d) { (acc, f) =>
          if (acc.columns.contains(f.name)) acc.withColumn(f.name, col(f.name).cast(f.dataType))
          else acc.withColumn(f.name, lit(null).cast(f.dataType))
        }
        withAll.select(widened.fieldNames.map(col): _*)
      }
      casted.reduce(_.unionByName(_))
    }

    /** column-cast (reference dataset_api.clj:1026-1123): strict cast. */
    def columnCast(name: String, to: DataType): DataFrame =
      df.withColumn(name, col(name).cast(to))

    /** parse-column `:relaxed?` (reference src/tech/v3/dataset/column.clj:139-165):
      * try_cast semantics — parse failures become null and are recorded in a
      * boolean side column `<name>_unparsed` instead of failing the job.
      * String→date goes through the reference's multi-pattern local-date
      * ladder ([[graft.sources.Io.parseLocalDateFlex]]) so "Jan 1 2000"
      * columns parse as the reference's `[:packed-local-date :relaxed?]`
      * does (parse_test.clj bad-csv-relaxed-1/2). */
    def columnCastRelaxed(name: String, to: DataType): DataFrame = {
      val casted =
        if (to == DateType && df.schema(name).dataType == StringType)
          graft.sources.Io.parseLocalDateFlex(col(name))
        else col(name).try_cast(to)
      df.withColumn(s"${name}_unparsed", col(name).isNotNull && casted.isNull)
        .withColumn(name, casted)
    }

    /** add-or-update-column with scalar broadcast (reference base.clj:115-228,
      * impl/dataset.clj:47-110): a literal becomes a constant column. */
    def addColumn(name: String, value: Any): DataFrame = value match {
      case c: Column => df.withColumn(name, c)
      case v => df.withColumn(name, lit(v))
    }

    /** update-columns / update-columnwise (reference base.clj:173-212,
      * dataset_api.clj:560-651): apply one column→column transform to every
      * selected column. */
    def updateColumns(names: Seq[String], f: Column => Column): DataFrame =
      names.foldLeft(df)((d, n) => d.withColumn(n, f(col(n))))

    /** update-columnwise over a schema predicate (e.g. all numeric). */
    def updateColumnsWhere(pred: StructField => Boolean, f: Column => Column): DataFrame =
      updateColumns(df.schema.fields.filter(pred).map(_.name).toSeq, f)

    /** filter-dataset / column-filters (reference column_filters.clj:22-149):
      * pure driver-side schema manipulation — select columns by datatype class. */
    def selectColumnsWhere(pred: StructField => Boolean): DataFrame = {
      val keep = df.schema.fields.filter(pred).map(f => col(f.name))
      df.select(keep.toSeq: _*)
    }

    def numericColumns: DataFrame =
      selectColumnsWhere(f => f.dataType.isInstanceOf[NumericType])

    def stringColumns: DataFrame =
      selectColumnsWhere(f => f.dataType == StringType)

    def datetimeColumns: DataFrame = selectColumnsWhere(f =>
      f.dataType == DateType || f.dataType == TimestampType)
  }
}

/** Schema widening for concat (reference base.clj:643-655 widest-datatype). */
object Concat {
  private val numericRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 4, DoubleType -> 5)

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x: DecimalType, y: DecimalType) =>
      // keep BOTH integer-digit capacity and fractional capacity:
      // precision = max int digits + max scale (capped at 38) — taking max
      // precision and max scale independently can shrink int capacity and
      // overflow the cast (throws under Spark 4's ANSI default)
      val scale = math.max(x.scale, y.scale)
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      DecimalType(math.min(38, intDigits + scale), scale)
    case (x: DecimalType, y) if integralTypes.contains(y) =>
      widen(x, DecimalType(20, 0)) // any long fits 20 integer digits
    case (x, y: DecimalType) if integralTypes.contains(x) => widen(y, x)
    case (_: DecimalType, FloatType | DoubleType) => DoubleType
    case (FloatType | DoubleType, _: DecimalType) => DoubleType
    case (x, y) if numericRank.contains(x) && numericRank.contains(y) =>
      // int64 + float32 must widen to float64, not float32
      if ((x == LongType && y == FloatType) || (x == FloatType && y == LongType)) DoubleType
      else if (numericRank(x) >= numericRank(y)) x else y
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case _ => StringType // last-resort common supertype, like TMD's :object→print
  }

  def commonSchema(schemas: Seq[StructType]): StructType = {
    val order = schemas.flatMap(_.fieldNames).distinct
    StructType(order.map { n =>
      val dts = schemas.flatMap(s => s.fields.find(_.name == n)).map(_.dataType)
      StructField(n, dts.reduce(widen), nullable = true)
    })
  }
}
