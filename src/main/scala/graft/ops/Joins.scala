package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join surface. The reference implements ONE algorithm — a single-JVM parallel
  * hash join (reference src/tech/v3/dataset/join.clj:204-266) — plus a sorted
  * merge-scan as-of join (join.clj:615-799). On Spark the equi joins are pure
  * declarations (Catalyst picks broadcast / shuffled-hash / sort-merge, AQE
  * re-plans at runtime), so the only algorithmic work here is the as-of join.
  */
object Joins {

  /** Column-collision handling: the reference prefixes right-side duplicates
    * with "right." (nice-column-names, join.clj:66-100). */
  def prefixCollisions(left: DataFrame, right: DataFrame,
                       exclude: Set[String] = Set.empty): DataFrame = {
    val dup = right.columns.toSet.intersect(left.columns.toSet) -- exclude
    dup.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"right.$c"))
  }

  /** pd-merge (reference join.clj:376-579): pandas-style multi-column merge.
    * `:outer` → "full"; shared key columns are deduplicated via the
    * usingColumns join form, exactly like pandas `on=`. */
  def pdMerge(left: DataFrame, right: DataFrame, on: Seq[String],
              how: String = "inner"): DataFrame = {
    val sparkHow = how match {
      case "outer" => "full"
      case h => h
    }
    if (sparkHow == "cross") left.crossJoin(right)
    else left.join(right, on, sparkHow)
  }

  /** hash-join with distinct lhs/rhs key names (join.clj:308-347): ALL right
    * columns colliding with a left name (keys included) get the `right.`
    * prefix, and renamed columns are referenced backtick-quoted (a bare
    * "right.k" parses as qualifier `right` + column `k`). Small right sides
    * should be wrapped in broadcast() by the caller; Catalyst/AQE otherwise
    * decides. */
  def keyJoin(left: DataFrame, right: DataFrame, leftOn: Seq[String],
              rightOn: Seq[String], how: String = "inner"): DataFrame = {
    val dup = right.columns.toSet.intersect(left.columns.toSet)
    val r = dup.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"right.$c"))
    val cond = leftOn.zip(rightOn).map { case (l, rn) =>
      val rcol = if (dup.contains(rn)) r(s"`right.$rn`") else r(rn)
      left(l) === rcol
    }.reduce(_ && _)
    left.join(r, cond, how)
  }

  /** Skew-resistant equi join (salting): the skewed left side gets a random
    * salt in [0, saltFactor); the right side is replicated saltFactor× with
    * every salt value, so one hot key spreads over saltFactor reducers. Use
    * when AQE's skew-join split isn't available or the skew is extreme; costs
    * saltFactor× replication of the (smaller) right side. */
  def saltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                 saltFactor: Int, how: String = "inner",
                 seed: Long = 42L): DataFrame = {
    // replicating the right side breaks right/full-outer semantics
    // (unmatched right rows would appear saltFactor times)
    require(how == "inner" || how == "left" || how == "left_semi",
      s"saltedJoin supports inner/left/left_semi, not $how")
    val l = left.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, on :+ "__salt", how).drop("__salt")
  }

  sealed trait AsofDirection
  /** match the greatest right time ≤ (or < if strict) left time — reference op `:<=` / `:<` */
  case object Backward extends AsofDirection
  /** match the smallest right time ≥ (or > if strict) left time — reference op `:>=` / `:>` */
  case object Forward extends AsofDirection
  /** match the closest right time either side — reference op `:nearest` */
  case object Nearest extends AsofDirection

  /** left-join-asof (reference join.clj:747-799; merge scans :615-744).
    *
    * Scale-first design — NOT the reference's two-pointer scan (which assumes
    * both tables sorted in one memory space). Instead: union both sides tagged,
    * then a single hash-partition shuffle on the `by` keys + one within-
    * partition sort on (by, t), then `last(value, ignoreNulls)` over the
    * running window carries the most recent right-side match onto each left
    * row. One shuffle, no join explosion, no driver involvement; survives any
    * skew AQE can split. With no `by` keys the carry DISTRIBUTES too
    * (value-derived time buckets + an O(P)-row boundary-carry frame — see
    * [[keylessCarryDirectional]]); no single-reducer window remains.
    *
    * Right payload columns come back null when no match exists (left join
    * padding, reference finalize-join-result join.clj:137-201).
    *
    * DETERMINISM CONTRACT: right-side (by, time) keys should be UNIQUE.
    * With duplicate right keys at the matched instant, SOME matching
    * row's payload is carried, but WHICH one depends on intra-key order
    * — partition layout here, insertion order in pandas/the reference,
    * tie-luck in DuckDB ASOF: no engine gives duplicates a portable
    * winner. Callers needing replayable output pre-reduce the right side
    * to one row per key (argmax/argmin by a payload column — see q101,
    * where the sf1.0 oracle sweep caught exactly this).
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftTime: String,
               rightTime: String, by: Seq[(String, String)] = Seq.empty,
               direction: AsofDirection = Backward,
               allowExactMatch: Boolean = true): DataFrame = {
    if (direction == Nearest)
      require(allowExactMatch,
        "Nearest implies exact matches allowed (reference :nearest semantics)")
    // KEYED as-of joins run through the first-class Catalyst merge
    // operator ([[graft.plans.AsofMerge]]): same output contract and
    // null semantics as the composed plan below (pinned by AsofMergeSpec
    // fuzz across all modes), but one SMJ-style shuffle+sort per side and
    // an O(n+m) two-pointer sweep instead of three extra full-width
    // passes over a tagged union. The composed plan remains the KEYLESS
    // path (a global merge has no by-key to distribute on; the composed
    // form distributes via value-derived time buckets).
    if (by.nonEmpty)
      graft.plans.AsofMerge.asofJoinMerge(left, right, leftTime,
        rightTime, by, forward = direction == Forward,
        allowExactMatch = allowExactMatch || direction == Nearest,
        nearest = direction == Nearest)
    else
      asofJoinComposed(left, right, leftTime, rightTime, by, direction,
        allowExactMatch)
  }

  /** The composed union+window as-of plan — the KEYLESS path (a global
    * merge has no by-key to distribute on; this form distributes via
    * value-derived time buckets), and the independent implementation the
    * merge exec is fuzz-pinned against (AsofMergeSpec). */
  private[graft] def asofJoinComposed(
      left: DataFrame, right: DataFrame, leftTime: String,
      rightTime: String, by: Seq[(String, String)] = Seq.empty,
      direction: AsofDirection = Backward,
      allowExactMatch: Boolean = true): DataFrame = {
    // reference semantics: missing matches nothing (join.clj:204-266 uses
    // object-space keys where nil ≠ nil). Right rows with a null time or a
    // null by-key are dropped; left rows with a null time or null by-key come
    // back with null payload — segregated up front so they can't absorb a
    // carried match through the window sort or null-partition grouping.
    // All branches stay lazy (no isEmpty probe): unioning an empty padded
    // frame is a no-op, and allowMissingColumns does the null padding.
    val rightValid = right.filter(
      by.map(b => col(b._2).isNotNull).fold(col(rightTime).isNotNull)(_ && _))
    val leftInvalid =
      by.map(b => col(b._1).isNull).fold(col(leftTime).isNull)(_ || _)
    val joined = asofJoinNonNull(left.filter(!leftInvalid), rightValid,
      leftTime, rightTime, by, direction, allowExactMatch)
    joined.unionByName(left.filter(leftInvalid), allowMissingColumns = true)
  }

  /** pandas `merge_asof(tolerance=...)` parity on top of [[asofJoin]]:
    * a carried match farther than `tolerance` from the left row (in the
    * time columns' units after cast to double — seconds for timestamps)
    * has its entire payload nulled, exactly as if no match existed. The
    * plan is the asofJoin plan plus a codegen conditional projection —
    * no extra shuffle. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, leftTime: String,
                        rightTime: String, by: Seq[(String, String)] = Seq.empty,
                        direction: AsofDirection = Backward,
                        allowExactMatch: Boolean = true,
                        tolerance: Double): DataFrame = {
    require(tolerance >= 0.0, "tolerance must be ≥ 0")
    val joined = asofJoin(left, right, leftTime, rightTime, by, direction,
      allowExactMatch)
    val byRight = by.map(_._2).toSet
    val payload = right.columns.filterNot(byRight.contains).toSeq
    def outName(p: String) =
      if (left.columns.contains(p)) s"right.$p" else p
    val rtOut = outName(rightTime)
    def ref(n: String) = col(s"`$n`")
    val tooFar = ref(rtOut).isNotNull &&
      abs(col(leftTime).cast("double") - ref(rtOut).cast("double")) >
        tolerance
    // materialize the verdict BEFORE nulling: the fold overwrites the
    // right-time column first, and a guard re-evaluated against the
    // already-nulled time would wave every later column through
    val flagged = joined.withColumn("__toofar", tooFar)
    payload.foldLeft(flagged) { (d, p) =>
      val o = outName(p)
      d.withColumn(o, when(!col("__toofar"), ref(o)))
    }.drop("__toofar")
  }

  private def asofJoinNonNull(left: DataFrame, right: DataFrame, leftTime: String,
               rightTime: String, by: Seq[(String, String)],
               direction: AsofDirection,
               allowExactMatch: Boolean): DataFrame = {
    direction match {
      case Backward => asofDirectional(left, right, leftTime, rightTime, by,
        forward = false, allowExactMatch)
      case Forward => asofDirectional(left, right, leftTime, rightTime, by,
        forward = true, allowExactMatch)
      case Nearest =>
        require(allowExactMatch,
          "Nearest implies exact matches allowed (reference :nearest semantics)")
        asofNearest(left, right, leftTime, rightTime, by)
    }
  }

  private def payloadCols(left: DataFrame, right: DataFrame,
                          rightTime: String, by: Seq[(String, String)]): Seq[String] = {
    val byRight = by.map(_._2).toSet
    right.columns.filterNot(byRight.contains).toSeq
  }

  /** Tag both sides into one schema. The right payload rides as ONE struct
    * column `__p` (null for left rows, non-null for every right row even
    * when its FIELDS are null): the whole matched row is carried atomically
    * — carrying columns independently with ignoreNulls would tear rows,
    * back-filling a matched row's null field from an older right row.
    * Struct field names are the right table's original (dot-free) names;
    * collision renaming to "right.<c>" happens only at the final select. */
  private def tagSides(left: DataFrame, right: DataFrame, leftTime: String,
                       rightTime: String, by: Seq[(String, String)],
                       payload: Seq[String]): DataFrame = {
    val byLeftNames = by.map(_._1)
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__t"), col("__side")) ++
        left.columns.map(col) :+
        lit(null).as("__p"): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__t"), col("__side")) ++
        by.map { case (ln, rn) => col(rn).as(ln) } ++
        left.columns.filterNot(byLeftNames.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)
    lTagged.unionByName(rTagged)
  }

  /** Unpack the carried struct into output columns, renaming collisions with
    * the reference's "right." prefix (backtick-safe: names are only ASSIGNED
    * with dots, never re-referenced). */
  private def unpackPayload(d: DataFrame, left: DataFrame, payload: Seq[String],
                            structCol: String): DataFrame = {
    val outCols = d.columns.filterNot(c => c == structCol || c.startsWith("__"))
      .map(col).toSeq ++
      payload.map { p =>
        val out = if (left.columns.contains(p)) s"right.$p" else p
        col(structCol).getField(p).as(out)
      }
    d.select(outCols: _*)
  }

  private def asofDirectional(left: DataFrame, right: DataFrame,
                              leftTime: String, rightTime: String,
                              by: Seq[(String, String)], forward: Boolean,
                              allowExact: Boolean): DataFrame = {
    val payload = payloadCols(left, right, rightTime, by)
    val unioned = tagSides(left, right, leftTime, rightTime, by, payload)
    val byLeftNames = by.map(_._1)

    // Sort: ascending time for backward, descending for forward — "last seen"
    // right row is always the directional match. Tie order between a left row
    // and a right row at the same time: right first (side 0 asc) when exact
    // matches count, left first (side desc) when strict.
    val tCol = if (forward) col("__t").desc else col("__t").asc
    val sideCol = if (allowExact) col("__side").asc else col("__side").desc
    val carried =
      if (byLeftNames.isEmpty)
        keylessCarryDirectional(unioned, forward, allowExact)
      else {
        val w = Window
          .partitionBy(byLeftNames.map(col): _*)
          .orderBy(tCol, sideCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__pc",
          last(col("__p"), ignoreNulls = true).over(w))
      }
    unpackPayload(carried.filter(col("__side") === 1), left, payload, "__pc")
  }

  /** Keyless (whole-table) as-of carry, DISTRIBUTED — the former global
    * single-reducer window is gone. The time axis is cut into P buckets and
    * the running `last(__p)` window runs PER BUCKET; an O(P)-row frame
    * holds each bucket's final carry, a tiny window over it builds
    * per-bucket carry-ins, and a broadcast join patches rows whose
    * bucket-local carry is still null.
    *
    * The bucket id is a PURE FUNCTION OF THE TIME VALUE (quantile
    * boundaries probed once up front, compiled into a balanced
    * comparison tree): the carry plan references the bucketed frame in two
    * branches, and a physical-partition id (`spark_partition_id` over a
    * range exchange) is only consistent between branches when the exchange
    * is literally reused — column pruning broke that and mis-carried rows
    * at partition boundaries. Value-derived ids make the branches agree by
    * construction, equal times can never straddle buckets, and the range
    * exchange disappears (one hash exchange on the bucket id). The probe
    * is one column-pruned pass (`approxQuantile` on the time axis) at
    * operator-construction time; boundary quality affects only balance,
    * never results. */
  private def keylessCarryDirectional(unioned: DataFrame, forward: Boolean,
                                      allowExact: Boolean): DataFrame = {
    val tOrd = if (forward) col("__t").desc else col("__t").asc
    val sOrd = if (allowExact) col("__side").asc else col("__side").desc
    val tRev = if (forward) col("__t").asc else col("__t").desc
    val sRev = if (allowExact) col("__side").desc else col("__side").asc
    val bucketed = withTimeBucket(unioned)
    val wLoc = Window.partitionBy("__pid").orderBy(tOrd, sOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__pc_l", last(col("__p"), ignoreNulls = true).over(wLoc))
      .withColumn("__rn_last",
        row_number().over(Window.partitionBy("__pid").orderBy(tRev, sRev)))
    val bounds = local.filter(col("__rn_last") === 1)
      .select(col("__pid").as("__bpid"), col("__pc_l").as("__pend"))
    // carry-in for bucket p = last non-null final carry among buckets
    // EARLIER IN THE SORT ORDER (ascending time → lower ids precede;
    // forward joins scan descending time → higher ids precede). O(P) rows —
    // the single-task window here is over bucket COUNT, not data.
    val bOrd = if (forward) col("__bpid").desc else col("__bpid").asc
    val wCarry = Window.orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bounds
      .withColumn("__cin", last(col("__pend"), ignoreNulls = true).over(wCarry))
      .select(col("__bpid"), col("__cin"))
    local.join(broadcast(carry), col("__pid") === col("__bpid"), "left")
      .withColumn("__pc", coalesce(col("__pc_l"), col("__cin")))
  }

  /** Quantile-bucket the tagged union's time axis via [[ValueBuckets]]
    * (dates lift through timestamp; the double conversion only positions
    * bucket CUTS — results never depend on it). */
  private def withTimeBucket(unioned: DataFrame): DataFrame = {
    val num = unioned.schema("__t").dataType match {
      case org.apache.spark.sql.types.DateType =>
        col("__t").cast("timestamp").cast("double")
      case _ => col("__t").cast("double")
    }
    ValueBuckets.assign(unioned, num, "__pid")
  }

  /** Keyless `:nearest` carries, same boundary-patch shape as
    * [[keylessCarryDirectional]] but BOTH directions ride one bucketed
    * layout: the backward running-last and forward running-first windows
    * share the bucket partitioning, and the O(P) boundary frame carries
    * each bucket's final backward payload AND first forward payload. */
  private def keylessCarryNearest(unioned: DataFrame): DataFrame = {
    val (tOrd, sOrd) = (col("__t").asc, col("__side").asc)
    val (tRev, sRev) = (col("__t").desc, col("__side").desc)
    val sorted = withTimeBucket(unioned)
    val base = Window.partitionBy("__pid").orderBy(tOrd, sOrd)
    val local = sorted
      .withColumn("__b_l", last(col("__p"), ignoreNulls = true)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__f_l", first(col("__p"), ignoreNulls = true)
        .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("__rn_a", row_number().over(base))
      .withColumn("__rn_d",
        row_number().over(Window.partitionBy("__pid").orderBy(tRev, sRev)))
    // exactly one row per pid has __rn_d===1 (resp. __rn_a===1), so the
    // ignoreNulls first() is deterministic despite agg ordering
    val bounds = local.groupBy(col("__pid").as("__bpid")).agg(
      first(when(col("__rn_d") === 1, col("__b_l")), ignoreNulls = true)
        .as("__pend"),
      first(when(col("__rn_a") === 1, col("__f_l")), ignoreNulls = true)
        .as("__pstart"))
    val wCin = Window.orderBy(col("__bpid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCout = Window.orderBy(col("__bpid"))
      .rowsBetween(1, Window.unboundedFollowing)
    val carry = bounds
      .withColumn("__cin", last(col("__pend"), ignoreNulls = true).over(wCin))
      .withColumn("__cout", first(col("__pstart"), ignoreNulls = true).over(wCout))
      .select(col("__bpid"), col("__cin"), col("__cout"))
    local.join(broadcast(carry), col("__pid") === col("__bpid"), "left")
      .withColumn("__b", coalesce(col("__b_l"), col("__cin")))
      .withColumn("__f", coalesce(col("__f_l"), col("__cout")))
  }

  /** :nearest (join.clj:716-744) in ONE pass: over the same tagged union and
    * the same keyed sort as the directional joins, carry the right payload
    * BOTH ways (last-before via a preceding frame, first-after via a
    * following frame — one exchange+sort, two frame scans), then per left row
    * keep the side with the smaller |Δt|; FORWARD wins equidistant ties,
    * matching the reference (join.clj abs-diff-bin-pred only keeps the
    * current right row when it is STRICTLY closer than the next — `<` on
    * the distance delta). No global window, no re-join. */
  private def asofNearest(left: DataFrame, right: DataFrame, leftTime: String,
                          rightTime: String,
                          by: Seq[(String, String)]): DataFrame = {
    val payload = payloadCols(left, right, rightTime, by)
    require(payload.contains(rightTime),
      s"asof Nearest: rightTime '$rightTime' must not also be a by-key")
    val unioned = tagSides(left, right, leftTime, rightTime, by, payload)
    val byLeftNames = by.map(_._1)

    // right rows first on time ties → exact matches arrive via the backward
    // carry at distance 0 (and therefore win; the reference's :nearest has no
    // strict variant — asofJoin rejects Nearest + allowExactMatch=false)
    val carried =
      if (byLeftNames.isEmpty) keylessCarryNearest(unioned)
      else {
        val base = Window.partitionBy(byLeftNames.map(col): _*)
          .orderBy(col("__t").asc, col("__side").asc)
        val wBack = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wFwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        unioned
          .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wBack))
          .withColumn("__f", first(col("__p"), ignoreNulls = true).over(wFwd))
      }

    // distance basis: DateType can't cast straight to double — lift to
    // timestamp first; numerics/timestamps cast directly
    def asNum(c: Column): Column = left.schema(leftTime).dataType match {
      case org.apache.spark.sql.types.DateType => c.cast("timestamp").cast("double")
      case _ => c.cast("double")
    }
    val lt = asNum(col("__t"))
    val bt = asNum(col("__b").getField(rightTime))
    val ft = asNum(col("__f").getField(rightTime))
    val useB = bt.isNotNull && (ft.isNull || abs(lt - bt) < abs(ft - lt))
    val resolved = carried.withColumn("__pc",
      when(useB, col("__b")).otherwise(col("__f")))
    unpackPayload(resolved.filter(col("__side") === 1), left, payload, "__pc")
  }

  /** Point-in-interval join (parity-plus: SURVEY §2.3 "theta/interval joins"
    * — absent in the reference; Spark accepts the raw non-equi condition but
    * plans it as a (Broadcast)NestedLoopJoin, O(|P|·|I|) comparisons).
    *
    * This is the binned reformulation that scales: every interval is
    * replicated into the fixed-width bins it overlaps
    * (`explode(sequence(...))`), every point hashes to its one bin, and the
    * range predicate runs AFTER an ordinary equi shuffle join on
    * (keys, bin). Cost: one shuffle of |P| + |I|·(len/binWidth + 1) rows —
    * choose `binWidth` near the typical interval length to keep the
    * replication factor O(1). Matches use `start <= point < end` (end
    * exclusive); empty intervals (end <= start) match nothing. Column names
    * must be disjoint across the two inputs (select/rename first).
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
                          point: Column, start: Column, end: Column,
                          binWidth: Long,
                          pointKeys: Seq[Column] = Nil,
                          intervalKeys: Seq[Column] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(pointKeys.size == intervalKeys.size,
      "pointKeys and intervalKeys must pair up")
    val p = points.withColumn("__bin",
      floor(point / binWidth).cast("long"))
    // Upper bin = ceil(end/W)-1: correct for both integral and fractional
    // bounds (floor((end-1)/W) under-replicates when end is fractional —
    // e.g. end=7.5, W=7 puts points in [7,7.5) in bin 1 but the interval
    // only in bin 0). For integral end the two forms coincide.
    val iv = intervals.filter(end > start).withColumn("__bin",
      explode(sequence(floor(start / binWidth).cast("long"),
        (ceil(end / binWidth) - lit(1)).cast("long"))))
    val cond = pointKeys.zip(intervalKeys)
      .foldLeft(p("__bin") === iv("__bin")) { case (c, (a, b)) => c && (a === b) }
    p.join(iv, cond)
      .filter(point >= start && point < end)
      .drop(p("__bin")).drop(iv("__bin"))
  }
}
