package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality audits — the checks a pipeline runs over every ingested
  * batch before the data is allowed downstream (the reference's users do
  * this by hand with filter/group-by; a 100 TB pipeline needs it as a
  * first-class, one-pass operator family).
  *
  * Everything here is declarative aggregation: violation COUNTS travel,
  * never violating rows (those are a filter away if wanted), so each
  * audit costs one scan + a scalar/group reduction regardless of table
  * size.
  */
object Quality {

  /** One foreign-key relationship to audit: `child`.`childKey` must hit
    * `parent`.`parentKey`. */
  final case class FkRelation(name: String, child: DataFrame, childKey: String,
                              parent: DataFrame, parentKey: String)

  /** Referential-integrity audit over a set of FK relationships. Returns
    * one row per relation:
    * (relation, child_rows, null_keys, orphan_rows, orphan_keys).
    *
    * Plan per relation: the child ships ONLY its key column; the parent
    * side is `select(parentKey).distinct` — at 100 TB the distinct key
    * frame is what shuffles (or broadcasts, for dimension parents, which
    * Catalyst/AQE decides from real sizes), never either table's payload.
    * The orphan check is a left-anti join on the key frame; counts
    * aggregate map-side. */
  def fkAudit(relations: Seq[FkRelation]): DataFrame = {
    require(relations.nonEmpty, "fkAudit needs at least one relation")
    relations.map { r =>
      val childKeys = r.child.select(col(r.childKey).as("__k"))
      val parentKeys = r.parent.select(col(r.parentKey).as("__p")).distinct()
      val orphans = childKeys.filter(col("__k").isNotNull)
        .join(parentKeys, col("__k") === col("__p"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("orphan_rows"),
          coalesce(countDistinct(col("__k")), lit(0L)).as("orphan_keys"))
        .withColumn("relation", lit(r.name))
      val base = childKeys
        .agg(count(lit(1)).as("child_rows"),
          sum(when(col("__k").isNull, 1L).otherwise(0L)).as("null_keys"))
        .withColumn("relation", lit(r.name))
      base.join(orphans, "relation")
        .select(col("relation"), col("child_rows"), col("null_keys"),
          col("orphan_rows"), col("orphan_keys"))
    }.reduce(_.unionByName(_))
  }

  /** A declarative row-level or table-level expectation. `name` keys the
    * audit row; violation semantics per rule type:
    *  - [[NotNull]]: rows where the column is null (or NaN for floats)
    *  - [[InRange]]: non-null rows outside [lo, hi]
    *  - [[MatchesRegex]]: non-null rows NOT fully matching the pattern
    *  - [[InSet]]: non-null rows whose value is not in the accepted set
    *  - [[Unique]]: rows beyond the first per key tuple
    *    (n_rows − n_distinct_keys; null keys participate as a key) */
  sealed trait Expectation { def name: String }
  final case class NotNull(name: String, column: String) extends Expectation
  final case class InRange(name: String, column: String, lo: Double, hi: Double)
      extends Expectation
  final case class MatchesRegex(name: String, column: String, pattern: String)
      extends Expectation
  final case class InSet(name: String, column: String, values: Seq[String])
      extends Expectation
  final case class Unique(name: String, columns: Seq[String]) extends Expectation

  /** Run an expectation suite in as few passes as the rules allow: ALL
    * row-level rules fuse into ONE conditional aggregation over a single
    * scan (violations are `sum(when(...))` columns side by side); each
    * [[Unique]] rule adds one distinct-count aggregation over its key
    * tuple (distinct-counts can't share the row-level pass without
    * expanding the scan per rule). Returns one row per rule:
    * (rule, violations, n_rows, pass), in suite order.
    *
    * The 100 TB shape: k row-level rules = one scan, u uniqueness rules
    * = u key-shuffles of the key columns only. */
  def checkExpectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "empty expectation suite")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation names must be unique")
    val spark = df.sparkSession
    import spark.implicits._

    def isNullish(c: String): Column = {
      val isFloat = df.schema(c).dataType match {
        case DoubleType | FloatType => true
        case _ => false
      }
      if (isFloat) col(c).isNull || isnan(col(c)) else col(c).isNull
    }
    def violation(r: Expectation): Column = r match {
      case NotNull(_, c) => isNullish(c)
      case InRange(_, c, lo, hi) =>
        !isNullish(c) && (col(c).cast(DoubleType) < lo ||
          col(c).cast(DoubleType) > hi)
      case MatchesRegex(_, c, p) =>
        !isNullish(c) && !col(c).cast(StringType).rlike("^(?:" + p + ")$")
      case InSet(_, c, vs) =>
        !isNullish(c) && !col(c).cast(StringType).isin(vs: _*)
      case Unique(_, _) =>
        throw new IllegalStateException("Unique handled separately")
    }

    val rowRules = rules.collect {
      case r if !r.isInstanceOf[Unique] => r
    }
    val uniqueRules = rules.collect { case u: Unique => u }

    val rowAudit: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else Some {
        val aggCols = count(lit(1)).as("__n") +:
          rowRules.map(r =>
            sum(when(violation(r), 1L).otherwise(0L)).as(s"__v_${r.name}"))
        val one = df.agg(aggCols.head, aggCols.tail: _*)
        // unpivot the single wide row into (rule, violations, n_rows)
        val pairs = rowRules.map(r =>
          struct(lit(r.name).as("rule"), col(s"__v_${r.name}").as("violations"),
            col("__n").as("n_rows")))
        one.select(explode(array(pairs: _*)).as("p"))
          .select(col("p.rule"), col("p.violations"), col("p.n_rows"))
      }

    val uniqueAudits = uniqueRules.map { u =>
      df.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) -
            // null-safe tuple distinct: count_distinct skips all-null rows,
            // so count nulls separately via a canonical struct
            countDistinct(struct(u.columns.map(col): _*))).as("violations"))
        .select(lit(u.name).as("rule"), col("violations"), col("n_rows"))
    }

    val all = (rowAudit.toSeq ++ uniqueAudits).reduce(_.unionByName(_))
    // suite-order sort key as a literal CASE chain (builtins, not a UDF)
    val orderCol = rules.zipWithIndex
      .foldLeft(lit(Int.MaxValue)) { case (acc, (r, i)) =>
        when(col("rule") === r.name, i).otherwise(acc)
      }
    all.withColumn("pass", col("violations") === 0L)
      .withColumn("__o", orderCol)
      .orderBy(col("__o")).drop("__o")
  }

  /** Partition-skew report for a prospective shuffle key: the ops check
    * run BEFORE keying a 100 TB shuffle on a column. Returns the top-K
    * heaviest keys with the totals alongside:
    * (key_rank, key, key_rows, n_keys, n_rows, skew_factor) where
    * skew_factor = key_rows·n_keys/n_rows (1 = perfectly even; the
    * heaviest key's factor is how much slower its reducer runs than
    * average — the number that decides salting).
    *
    * Plan: one keyed count (the only data-sized pass), a 1-row totals
    * aggregate broadcast back, and a TakeOrdered top-K — the rank window
    * runs on the K-row frame only. */
  def skewReport(df: DataFrame, keyCols: Seq[String], topK: Int = 5)
      : DataFrame = {
    require(topK >= 1)
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(concat_ws("#", keyCols.map(col(_).cast(StringType)): _*)
        .as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("key_rows"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("key_rows")).as("n_rows"))
    val top = counts
      .orderBy(col("key_rows").desc, col("key").asc)
      .limit(topK)
    val w = Window.orderBy(col("key_rows").desc, col("key").asc)
    val out = top.crossJoin(broadcast(tot))
      .withColumn("key_rank", row_number().over(w))
      .select(col("key_rank"), col("key"), col("key_rows"),
        col("n_keys"), col("n_rows"),
        (col("key_rows").cast(DoubleType) * col("n_keys").cast(DoubleType) /
          col("n_rows").cast(DoubleType)).as("skew_factor"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    counts.unpersist()
    out
  }

  /** Distribution-drift report between a REFERENCE batch and a CURRENT
    * batch of the same metric (the log-free sibling of PSI — PSI's ln
    * would break cross-engine exactness): equal-frequency bins are
    * fitted on the reference ([[Ml.fitQuantileBinner]]'s rank-selection,
    * no percentile buffer), both sides are counted per bin, and the
    * report carries total-variation distance ½·Σ|p−q| plus the
    * chi-square drift statistic n_cur·Σ(q−p)²/p (p>0 bins). Returns one
    * row (bins, n_ref, n_cur, tvd, chi2_drift). All sums over the
    * O(bins) frame are floor-scaled exact; two data-sized passes total
    * (one per side) after the fit. */
  def driftReport(reference: DataFrame, current: DataFrame, valueCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val model = Ml.fitQuantileBinner(reference, Seq(valueCol), bins)
    val binCol = s"${valueCol}_bin"
    def counts(df: DataFrame, name: String) =
      model.transform(df)
        .filter(col(valueCol).isNotNull &&
          !isnan(col(valueCol).cast(DoubleType)))
        .groupBy(col(binCol).as("bin")).agg(count(lit(1)).as(name))
    val shell = reference.sparkSession.range(1, bins + 1)
      .select(col("id").cast(IntegerType).as("bin"))
    val both = shell
      .join(counts(reference, "__nr"), Seq("bin"), "left")
      .join(counts(current, "__nc"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__nr"), lit(0L)).as("__nr"),
        coalesce(col("__nc"), lit(0L)).as("__nc"))
    val tot = both.agg(sum(col("__nr")).as("__tr"), sum(col("__nc")).as("__tc"))
    val terms = both.crossJoin(broadcast(tot))
      .withColumn("__p", col("__nr").cast(DoubleType) / col("__tr").cast(DoubleType))
      .withColumn("__q", col("__nc").cast(DoubleType) / col("__tc").cast(DoubleType))
      .withColumn("__ad", abs(col("__p") - col("__q")))
      .withColumn("__chi",
        when(col("__p") > 0.0,
          (col("__q") - col("__p")) * (col("__q") - col("__p")) / col("__p"))
          .otherwise(lit(0.0)))
    terms.agg(
      first(col("__tr")).as("n_ref"), first(col("__tc")).as("n_cur"),
      (Reductions.isum(col("__ad"), 12) * lit(0.5)).as("tvd"),
      (first(col("__tc")).cast(DoubleType) *
        Reductions.isum(col("__chi"), 9)).as("chi2_drift"))
      .select(lit(bins).as("bins"), col("n_ref"), col("n_cur"), col("tvd"),
        col("chi2_drift"))
  }

  /** Benford first-significant-digit audit of a positive numeric column:
    * observed digit frequencies vs the Benford expectation
    * log10(1 + 1/d) — fabricated or truncated financial/measurement data
    * departs loudly. Returns 9 rows
    * (digit, n, frac, benford_frac, abs_dev). One keyed aggregation; the
    * Benford constants are fixed literals (no libm log in either engine,
    * so results are bit-identical everywhere). |x| must stay < 9·10⁶ for
    * the scale-12 fixed-point rendering to fit a BIGINT. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    // log10(1 + 1/d), d = 1..9, as fixed decimal literals (17 sig digits
    // round-trips double exactly)
    val benford = Map(
      1 -> 0.30102999566398120, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829993, 4 -> 0.09691001300805642,
      5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
      9 -> 0.04575749056067514)
    val x = col(valueCol).cast(DoubleType)
    // first significant digit via string form of the absolute value:
    // digits-only projection of the decimal rendering's first nonzero
    // char — avoids libm log10 while staying engine-replayable
    // (both engines see the same double; we extract from a fixed-point
    // rendering, not the engine's float formatter: scale by 10^12 into a
    // BIGINT first so the string is pure digits)
    val scaled = floor(abs(x) * lit(1e12)).cast(LongType).cast(StringType)
    val firstChar = substring(regexp_replace(scaled, "^0+", ""), 1, 1)
    // values below 10^-12 render as "" — null them out instead of letting
    // ANSI cast("") throw
    val firstDigit =
      when(length(firstChar) > 0, firstChar).cast(IntegerType)
    val counts = df
      .filter(x.isNotNull && !isnan(x) && abs(x) > lit(0.0))
      .select(firstDigit.as("digit"))
      .filter(col("digit").isNotNull && col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__t"))
    val bf = benford.toSeq.sortBy(_._1)
      .map { case (d, f) => struct(lit(d).as("digit"), lit(f).as("bf")) }
    val bfDf = df.sparkSession.range(1).select(
        explode(array(bf: _*)).as("b"))
      .select(col("b.digit").as("digit"), col("b.bf").as("benford_frac"))
    bfDf.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(col("n"), lit(0L)).cast(DoubleType) /
          col("__t").cast(DoubleType)).as("frac"),
        col("benford_frac"))
      .withColumn("abs_dev", abs(col("frac") - col("benford_frac")))
      .orderBy(col("digit"))
  }
}
