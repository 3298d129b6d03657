package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams: funnel conversion and
  * cohort retention — the two queries every product/telemetry dataset
  * answers daily, expressed as keyed aggregations (never a data-sized
  * window, never a collect).
  */
object Behavior {

  /** Funnel conversion: how many users performed `stages` IN ORDER
    * (each stage strictly after the previous one's first qualifying hit,
    * earliest-completion semantics). Returns (stage_idx, stage, n_users).
    *
    * Plan: stage 1 is one keyed aggregation (min ts per user); each later
    * stage joins the survivors (a frame that only SHRINKS) back to that
    * stage's events on the user key and re-aggregates — k−1 shuffles on
    * the same key for a k-stage funnel, each carrying (user, ts) pairs
    * only. Each survivor frame is eagerly checkpointed before its count
    * (each stage's count() is a driver action — on the raw lineage,
    * stage i would re-execute stages 1..i−1, the O(k²) iterative-lineage
    * trap the [[graft.ops.Graph.pageRank]] scaladoc documents); the
    * checkpoint makes every stage read the previous survivors as
    * node-sized blocks, one scan + one join per stage. At 100 TB the
    * event scan prunes to the stage types (PushedFilters on the type
    * column) and the survivor frames are tiny relative to the corpus. */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = df.sparkSession
    import spark.implicits._
    val ev = df.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var reached = ev.filter(col("__t") === stages.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__cur"))
      .localCheckpoint(true)
    val counts = scala.collection.mutable.ArrayBuffer[(Int, String, Long)](
      (1, stages.head, reached.count()))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = reached
      reached = ev.filter(col("__t") === st)
        .join(reached, "__u")
        .filter(col("__ts") > col("__cur"))
        .groupBy(col("__u")).agg(min(col("__ts")).as("__cur"))
        .localCheckpoint(true)
      // this stage's eager checkpoint materialized from `prev`; nothing
      // reads the superseded survivor frame again — free its blocks
      Checkpoints.releaseLocalCheckpoint(prev)
      counts += ((i + 1, st, reached.count()))
    }
    // the final survivor frame was only needed for its count
    Checkpoints.releaseLocalCheckpoint(reached)
    counts.toSeq.toDF("stage_idx", "stage", "n_users")
  }

  /** Funnel TIME-TO-CONVERT: for each consecutive stage pair, the
    * earliest-completion duration distribution (median and quartiles in
    * SECONDS) over users who reached the later stage — the "where do
    * users stall" companion to [[funnel]]'s counts. Same
    * strictly-after / earliest-completion semantics; durations come from
    * the identical keyed-join chain, quantiles from the rank-selection
    * [[Reductions.groupQuantiles]] (no percentile buffers). Returns
    * (stage_idx, from_stage, to_stage, n_users, p25_s, median_s, p75_s). */
  def funnelDurations(df: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnelDurations needs at least two stages")
    val spark = df.sparkSession
    import spark.implicits._
    val ev = df.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      unix_micros(col(tsCol)).as("__us"))
    var reached = ev.filter(col("__t") === stages.head)
      .groupBy(col("__u")).agg(min(col("__us")).as("__cur"))
    val pieces = stages.zipWithIndex.drop(1).map { case (st, i) =>
      // eager-checkpoint: `next` is consumed TWICE (this stage's durs
      // piece + the next stage's survivors) and the final union executes
      // every piece in one action — raw lineage would re-run the whole
      // prefix chain per branch, the same O(k²) trap as funnel's counts
      val next = ev.filter(col("__t") === st)
        .join(reached, "__u")
        .filter(col("__us") > col("__cur"))
        .groupBy(col("__u"), col("__cur").as("__prev"))
        .agg(min(col("__us")).as("__cur"))
        .localCheckpoint(true)
      val durs = next.select(lit(i).as("__stage"),
        ((col("__cur") - col("__prev")).cast("double") / lit(1e6))
          .as("__dur"))
      reached = next.select(col("__u"), col("__cur"))
      durs
    }
    val allDurs = pieces.reduce(_.unionByName(_))
    Reductions.groupQuantiles(allDurs, "__stage", "__dur",
        Seq("p25_s" -> 0.25, "median_s" -> 0.5, "p75_s" -> 0.75))
      .withColumn("from_stage",
        stages.zipWithIndex.drop(1).foldLeft(lit(null).cast("string")) {
          case (acc, (_, i)) =>
            when(col("__stage") === i, stages(i - 1)).otherwise(acc)
        })
      .withColumn("to_stage",
        stages.zipWithIndex.drop(1).foldLeft(lit(null).cast("string")) {
          case (acc, (st, i)) => when(col("__stage") === i, st).otherwise(acc)
        })
      .select(col("__stage").as("stage_idx"), col("from_stage"),
        col("to_stage"), col("n").as("n_users"),
        col("p25_s"), col("median_s"), col("p75_s"))
  }

  /** Dataset DIFF between two keyed snapshots — the data-versioning
    * primitive (what changed between yesterday's corpus build and
    * today's?). Emits one row per key present in either side:
    * status ∈ {added, removed, changed, unchanged} plus a comma-joined
    * list of the non-key columns whose values differ (null-safe
    * comparison, so null→value and value→null both count as changes).
    * Compared columns = the non-key columns the two frames SHARE, in the
    * left frame's order.
    *
    * Plan: ONE full-outer shuffle join on the key — both sides
    * hash-partition once; the per-column comparison is a codegen CASE
    * chain, no window, no collect. At 100 TB this is the same cost as
    * any key-equality join of the two snapshots. */
  def diffDatasets(a: DataFrame, b: DataFrame, keyCols: Seq[String])
      : DataFrame = {
    val shared = a.columns.filter(c => !keyCols.contains(c) &&
      b.columns.contains(c)).toSeq
    val al = a.select((keyCols ++ shared).map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__in_a", lit(1))
    val bl = b.select((keyCols ++ shared).map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__in_b", lit(1))
    val cond = keyCols.map(c => al(s"__a_$c") === bl(s"__b_$c")).reduce(_ && _)
    val joined = al.join(bl, cond, "full_outer")
    val changedCols = concat_ws(",", shared.map(c =>
      when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))): _*)
    joined.select(
      (keyCols.map(c => coalesce(col(s"__a_$c"), col(s"__b_$c")).as(c)) ++
        Seq(
          when(col("__in_a").isNull, "added")
            .when(col("__in_b").isNull, "removed")
            .when(shared.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
              .reduceOption(_ && _).getOrElse(lit(true)), "unchanged")
            .otherwise("changed").as("status"),
          when(col("__in_a").isNotNull && col("__in_b").isNotNull,
            changedCols).otherwise(lit("")).as("changed_cols"))): _*)
  }

  /** SCD2 (slowly-changing-dimension type 2) history build: collapse a
    * keyed, time-ordered attribute stream into validity intervals — one
    * row per (key, attribute-state run) with valid_from / valid_to /
    * is_current. A row opens an interval when ANY tracked attribute
    * null-safely differs from its predecessor (or it is the key's first
    * observation); valid_to = the next interval's valid_from (null while
    * current). One keyed window (hash shuffle on the key), no collect —
    * the standard warehouse dimension-history op at any scale. */
  def scd2History(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                  attrCols: Seq[String], tsCol: String,
                  carryCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(attrCols.nonEmpty, "scd2History needs at least one attribute")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val changed = attrCols.map(c =>
      !(col(c) <=> lag(col(c), 1).over(w))).reduce(_ || _)
    val opens = df
      .withColumn("__first", lag(col(orderCols.head), 1).over(w).isNull)
      .withColumn("__open", col("__first") || changed)
      .filter(col("__open"))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    opens
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ carryCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Cohort retention: users bucketed by the ISO week of their first event
    * (the cohort), counted by how many were active in each subsequent week.
    * Returns (cohort_week DATE, week_offset INT, n_users) — the classic
    * retention triangle in long form.
    *
    * Plan: first-event week = one keyed aggregation; activity weeks =
    * a distinct over (user, week); one broadcast-free join on the user key
    * (both sides already hash-partitioned on it) + one small aggregation.
    * Weeks are date_trunc('week') Mondays, so offsets are exact integer
    * day-diffs div 7 — engine-portable. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val ev = df.select(col(userCol).as("__u"),
      to_date(date_trunc("week", col(tsCol))).as("__wk"))
    val cohort = ev.groupBy(col("__u")).agg(min(col("__wk")).as("__cohort"))
    val active = ev.distinct()
    active.join(cohort, "__u")
      .select(col("__cohort").as("cohort_week"),
        (datediff(col("__wk"), col("__cohort")) / 7).cast("int")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** UNION-OF-INTERVALS coverage per key: total time covered by a set
    * of (possibly overlapping) [start, end) intervals — "how long was
    * the user actually active", sessions merged. The classic windowed
    * trick: with intervals sorted by (start, end), each one contributes
    * end − max(start, running-max-of-previous-ends) when positive; the
    * contributions sum to the union length EXACTLY (integer
    * microseconds). One keyed window pass + one keyed aggregation.
    * Returns (key, n_intervals, covered_us). */
  def intervalUnionCoverage(df: DataFrame, keyCol: String, startCol: String,
                            endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val s = col(startCol).cast("long"); val e = col(endCol).cast("long")
    df.filter(col(keyCol).isNotNull && s.isNotNull && e.isNotNull && e > s)
      .withColumn("__runMax", max(e).over(w))
      .withColumn("__contrib",
        greatest(lit(0L), e - greatest(s, coalesce(col("__runMax"), s))))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__contrib")).as("covered_us"))
  }

  /** First-order Markov TRANSITION MATRIX over per-key event sequences:
    * counts and row-normalized probabilities of state s → next state t
    * (sessions/journeys never cross keys). One keyed lead window + two
    * keyed aggregations; probabilities are one division from integer
    * counts. Returns (from_state, to_state, n, p). */
  def transitionMatrix(df: DataFrame, keyCol: String, orderCols: Seq[String],
                       stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = df
      .select(col(keyCol) +: col(stateCol).as("from_state") +:
        orderCols.map(col): _*)
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull && col("from_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val rowTot = pairs.groupBy(col("from_state")).agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(rowTot), "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        (col("n").cast("double") / col("__tot").cast("double")).as("p"))
  }

  /** Multi-touch ATTRIBUTION over event journeys — the marketing/growth
    * sibling of [[funnel]]: each conversion (`convType` event) distributes
    * credit over the touch events that preceded it, under the four
    * standard models at once (first-touch, last-touch, linear,
    * position-based 40/20/40). A touch credits the NEXT conversion of its
    * user (journeys reset at each conversion); touches after the user's
    * last conversion earn nothing.
    *
    * Credits are integer MICRO-credits (per-conversion budget 10⁶,
    * integer division — reduce-order invariant, so per-channel sums are
    * hash-exact; the driver can divide by 10⁶ for display):
    *   linear:   ⌊10⁶/n⌋ each of the n touches
    *   first/last: 10⁶ to the respective endpoint
    *   position: n=1 → 10⁶; n=2 → 5·10⁵ each; n≥3 → 4·10⁵ to each
    *             endpoint, middles split ⌊2·10⁵/(n−2)⌋
    * Returns (channel, touches, conversions_touched, first_micro,
    * last_micro, linear_micro, position_micro) per touch channel.
    *
    * Plan: ONE shuffle on the user key drives both keyed windows (the
    * conversion-counter cumsum and the per-journey rank/size), then a
    * tiny per-channel aggregation — per-user frames only, never a global
    * window. At 100 TB journeys are bounded by per-user event counts;
    * hot synthetic users are the caller's salting problem, as with
    * [[transitionMatrix]]. `orderCols` must totally order a user's
    * events (ts + a unique id) or journey boundaries are ambiguous. */
  def attribution(df: DataFrame, userCol: String, typeCol: String,
                  orderCols: Seq[String], convType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(userCol)).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(col(userCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val isConv = col("channel") === lit(convType)
    // pin the NULL contract explicitly: a row with no event type is
    // neither a touch nor a conversion (without this filter it would be
    // dropped anyway, but only incidentally — `!isConv` is NULL for a
    // NULL channel — and an oracle counting it as a NULL-channel touch
    // would silently diverge)
    val tagged = df
      .filter(col(typeCol).isNotNull)
      .select(col(userCol) +: col(typeCol).as("channel") +:
        orderCols.map(col): _*)
      .withColumn("__cum", sum(when(isConv, 1L).otherwise(0L)).over(wOrd))
      .withColumn("__tot", max(col("__cum")).over(wAll))
    // a touch with c conversions at-or-before it belongs to journey c+1
    val touches = tagged
      .filter(!isConv && col("__cum") + 1 <= col("__tot"))
      .withColumn("__j", col("__cum") + 1)
    val wJ = Window.partitionBy(col(userCol), col("__j"))
      .orderBy(orderCols.map(col): _*)
    val wJAll = Window.partitionBy(col(userCol), col("__j"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val M = lit(1000000L)
    val credited = touches
      .withColumn("__pos", row_number().over(wJ))
      .withColumn("__n", count(lit(1)).over(wJAll))
      .withColumn("__first", when(col("__pos") === 1, M).otherwise(0L))
      .withColumn("__last", when(col("__pos") === col("__n"), M).otherwise(0L))
      // ⌊10⁶/n⌋ via floor(double div): exact for these magnitudes (the
      // correctly-rounded quotient can't cross an integer — gap ≥ 1/n vs
      // error ≤ ½ulp), and both engines floor the same double
      .withColumn("__linear", floor(M / col("__n")).cast("long"))
      .withColumn("__position",
        when(col("__n") === 1, M)
          .when(col("__n") === 2, lit(500000L))
          .when(col("__pos") === 1 || col("__pos") === col("__n"),
            lit(400000L))
          .otherwise(floor(lit(200000L) / (col("__n") - 2)).cast("long")))
    credited.groupBy(col("channel"))
      .agg(count(lit(1)).as("touches"),
        countDistinct(col(userCol), col("__j")).as("conversions_touched"),
        sum(col("__first")).as("first_micro"),
        sum(col("__last")).as("last_micro"),
        sum(col("__linear")).as("linear_micro"),
        sum(col("__position")).as("position_micro"))
  }

  /** CDC MERGE (lakehouse SCD1 upsert): apply a change feed to a base
    * snapshot and return the next snapshot. Per key, the LATEST change
    * (by `orderCols`, ties broken by the full order tuple which must be
    * total) wins over the base row; a winning change with
    * `deleteCol = true` removes the key. Base rows with no change pass
    * through. `changes` must carry the base's columns plus `orderCols`
    * and `deleteCol`.
    *
    * Plan: one union (base tagged priority 0 / changes 1), ONE key
    * shuffle, a per-key row_number pick — the exact shape of a
    * Delta/Iceberg MERGE's shuffle stage. No driver round trips; the
    * window frame is per-key (change sets per key are small by nature —
    * a hot key's feed is still one group, never the table). */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   orderCols: Seq[String], deleteCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dataCols = base.columns.toSeq
    require(dataCols.forall(changes.columns.contains),
      "changes must carry every base column")
    val zeroOrder = orderCols.map(c =>
      lit(null).cast(changes.schema(c).dataType).as(c))
    val taggedBase = base.select(
      dataCols.map(col) ++ zeroOrder ++
        Seq(lit(false).as("__del"), lit(0).as("__pri")): _*)
    val taggedChanges = changes.select(
      dataCols.map(col) ++ orderCols.map(col) ++
        Seq(col(deleteCol).cast("boolean").as("__del"), lit(1).as("__pri")): _*)
    // priority first (any change beats base), then the change order —
    // nulls (the base sentinel) last under desc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__pri").desc +: orderCols.map(col(_).desc_nulls_last): _*)
    taggedBase.unionByName(taggedChanges)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__del"))
      .select(dataCols.map(col): _*)
  }

  /** RFM SEGMENTATION over a transactions frame: per customer, recency
    * (days since last order, against the dataset's max date), frequency
    * (order count) and monetary (exact 2-decimal sum), each scored into
    * quintiles 1–5 where 5 = best (most recent / most frequent / highest
    * spend). Returns the segment roll-up (r_score, f_score, m_score,
    * n_customers, avg_monetary) — the marketing-ops cut.
    *
    * Scores come from ONE fused
    * [[Reductions.globalPercentRankTable]] pass (range-partitioned
    * (metric, value) rank table, O(partitions·3) offsets — NO global
    * single-task window, and one persist/offset job chain where the
    * per-metric form pays three), bucketed as ⌊pct·5⌋+1 clamped to 5;
    * ties share a percent-rank and hence a score, exactly like SQL
    * percent_rank, so the scoring replays in any engine. The
    * per-customer frame is the only shuffle ancestor. */
  def rfm(df: DataFrame, custCol: String, dateCol: String,
          amountCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val ref = df.agg(max(to_date(col(dateCol))).as("__ref"))
    val per = df.crossJoin(broadcast(ref))
      .groupBy(col(custCol).as("__cust"))
      .agg(min(datediff(col("__ref"), to_date(col(dateCol)))).as("__rec"),
        count(lit(1)).cast("double").as("__freq"),
        sum(col(amountCol).cast(DecimalType(38, 2))).as("__mon"))
      // recency negated so pct 1 (=best score) is the MOST recent
      .withColumn("__recNeg", -col("__rec").cast(DoubleType))
      .withColumn("__monD", col("__mon").cast(DoubleType))
    val melted = per.select(col("__cust"), explode(array(
        struct(lit("r").as("__t"), col("__recNeg").as("__v")),
        struct(lit("f").as("__t"), col("__freq").as("__v")),
        struct(lit("m").as("__t"), col("__monD").as("__v")))).as("__e"))
      .select(col("__cust"), col("__e.__t").as("__t"), col("__e.__v").as("__v"))
    val ranks = Reductions.globalPercentRankTable(melted, "__t", "__v", "__p")
    val scores = melted.join(ranks, Seq("__t", "__v"), "left")
      .withColumn("__score",
        least(lit(5), (floor(col("__p") * 5.0) + 1).cast("int")))
      .groupBy(col("__cust"))
      .agg(max(when(col("__t") === "r", col("__score"))).as("r_score"),
        max(when(col("__t") === "f", col("__score"))).as("f_score"),
        max(when(col("__t") === "m", col("__score"))).as("m_score"))
    val scored = per.select(col("__cust"), col("__mon"))
      .join(scores, Seq("__cust"))
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("__mon")).cast(DoubleType) / count(lit(1)))
          .as("avg_monetary"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** CUPED variance reduction for A/B metrics (Deng et al. 2013): adjust
    * each user's post-period metric y by the pre-period covariate x,
    * y' = y − θ(x − x̄) with θ = cov(x,y)/var(x) fitted on the POOLED
    * users, then report per-cohort means before/after adjustment and the
    * pooled variance-reduction factor 1 − ρ². Returns one row per cohort:
    * (cohort, n, mean_x, mean_y, mean_y_cuped, theta, var_reduction).
    *
    * All moments are floor-scaled (10⁶) exact sums over the per-user
    * frame, so θ and every mean replay bit-exactly in SQL; the adjusted
    * mean needs no second pass (mean y' = ȳ_c − θ(x̄_c − x̄) by
    * linearity). Two keyed aggregations, one O(1) broadcast. */
  def cuped(users: DataFrame, cohortCol: String, preCol: String,
            postCol: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val x = col(preCol).cast(DoubleType)
    val y = col(postCol).cast(DoubleType)
    val clean = users
      .filter(col(cohortCol).isNotNull && x.isNotNull && y.isNotNull &&
        !isnan(x) && !isnan(y))
      .select(col(cohortCol).as("__g"), x.as("__x"), y.as("__y"))
    def fsum(c: org.apache.spark.sql.Column) = Reductions.isum(c, 6)
    val pooled = clean.agg(count(lit(1)).cast(DoubleType).as("__n"),
      fsum(col("__x")).as("__sx"), fsum(col("__y")).as("__sy"),
      fsum(col("__x") * col("__x")).as("__sxx"),
      fsum(col("__x") * col("__y")).as("__sxy"),
      fsum(col("__y") * col("__y")).as("__syy"))
    val vx = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("__n") * col("__syy") - col("__sy") * col("__sy")
    val cv = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val fit = pooled.select(col("__n"), col("__sx"),
      when(vx > 0.0, cv / vx).otherwise(lit(0.0)).as("__theta"),
      when(vx > 0.0 && vy > 0.0, lit(1.0) - (cv / sqrt(vx)) * (cv / sqrt(vx)) / vy)
        .as("var_reduction"))
    val perG = clean.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), fsum(col("__x")).as("__gx"),
        fsum(col("__y")).as("__gy"))
    perG.crossJoin(broadcast(fit))
      .select(col("__g").as("cohort"), col("n"),
        (col("__gx") / col("n")).as("mean_x"),
        (col("__gy") / col("n")).as("mean_y"),
        (col("__gy") / col("n") - col("__theta") *
          (col("__gx") / col("n") - col("__sx") / col("__n")))
          .as("mean_y_cuped"),
        col("__theta").as("theta"), col("var_reduction"))
      .orderBy(col("cohort"))
  }

  /** LORENZ CURVE / concentration table: rank units (e.g. customers) by
    * an exact integer-cents amount, cut into `buckets` percent-rank
    * bands, and report each band's share and cumulative share of the
    * total — "the top decile holds X% of revenue". Returns
    * (bucket, n_units, amount_cents, share, cum_share); shares are one
    * integer-to-double division each, the cumulative sum runs over the
    * O(buckets) frame. Banding uses [[Reductions.globalPercentRank]]
    * (ties share a band), so the table replays as SQL percent_rank. */
  def lorenz(df: DataFrame, unitCol: String, amountCol: String,
             buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val per = df.groupBy(col(unitCol).as("__u"))
      .agg((sum(col(amountCol).cast(DecimalType(38, 2))) * 100)
        .cast(LongType).as("__cents"))
      .withColumn("__centsD", col("__cents").cast(DoubleType))
    val banded = Reductions.globalPercentRank(per, "__centsD", "__p")
      .withColumn("bucket",
        least(lit(buckets), (floor(col("__p") * buckets) + 1).cast("int")))
    val byB = banded.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_units"), sum(col("__cents")).as("amount_cents"))
    val tot = byB.agg(sum(col("amount_cents")).as("__tot"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byB.crossJoin(broadcast(tot))
      .withColumn("__cum", sum(col("amount_cents")).over(wCum))
      .select(col("bucket"), col("n_units"), col("amount_cents"),
        (col("amount_cents").cast(DoubleType) /
          col("__tot").cast(DoubleType)).as("share"),
        (col("__cum").cast(DoubleType) /
          col("__tot").cast(DoubleType)).as("cum_share"))
      .orderBy(col("bucket"))
  }

  /** DWELL-TIME ANALYSIS: how long do users SIT in each state? Every
    * event opens a spell in its state that the user's next event closes
    * (the last event of a journey has no close and is excluded — open
    * spells are unknowable in a batch). Durations are exact microsecond
    * longs (unix_micros of the lead-ts difference); seconds appear only
    * in the final divisions. Returns per state
    * (state, n_spells, total_secs, mean_secs, max_secs).
    *
    * Plan: one keyed window pass (lead over the user exchange) + one
    * state aggregation — a single data shuffle. */
  def dwellTimes(df: DataFrame, userCol: String, orderCols: Seq[String],
                 tsCol: String, stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val w = Window.partitionBy(col(userCol))
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__next", lead(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__next").isNotNull && col(stateCol).isNotNull)
      .withColumn("__dw", col("__next") - unix_micros(col(tsCol)))
      .groupBy(col(stateCol).as("state"))
      .agg(count(lit(1)).as("n_spells"),
        sum(col("__dw")).as("__tus"),
        max(col("__dw")).as("__mus"))
      .select(col("state"), col("n_spells"),
        (col("__tus").cast(DoubleType) / lit(1e6)).as("total_secs"),
        (col("__tus").cast(DoubleType) / col("n_spells").cast(DoubleType) /
          lit(1e6)).as("mean_secs"),
        (col("__mus").cast(DoubleType) / lit(1e6)).as("max_secs"))
  }

  /** SEQUENTIAL PATTERN SUPPORT over per-user journeys — the length-2
    * slice of PrefixSpan that answers "does A lead to B?" at corpus
    * scale: for every ordered pair of distinct states, the number of
    * users whose FIRST A strictly precedes their FIRST B (first-occurrence
    * semantics — re-visits don't re-count), its support against the whole
    * user base, and its confidence against users who did A at all.
    * Returns (antecedent, consequent, n_users_ab, n_users_a, n_users,
    * support, confidence) for every pair with n_users_ab > 0.
    *
    * Plan: one keyed window pass assigns first-occurrence positions, one
    * (user, state) aggregation shrinks the data to ≤ |states| rows per
    * user, and the pair build is a PER-USER self-join of that tiny frame
    * — Σ_users k² with k = distinct states per user (bounded by the
    * event-type vocabulary, NOT the journey length), then one O(pairs)
    * aggregation. No cross-user pair explosion. */
  def sequenceSupport(df: DataFrame, userCol: String,
                      orderCols: Seq[String], stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val w = Window.partitionBy(col(userCol))
      .orderBy(orderCols.map(col): _*)
    val firsts = df
      .filter(col(stateCol).isNotNull)
      .withColumn("__pos", row_number().over(w))
      .groupBy(col(userCol).as("__u"), col(stateCol).as("__st"))
      .agg(min(col("__pos")).as("__fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val users = firsts.agg(countDistinct(col("__u")).as("__nu"))
    val perA = firsts.groupBy(col("__st").as("antecedent"))
      .agg(count(lit(1)).as("n_users_a"))
    val b = firsts.select(col("__u").as("__u2"), col("__st").as("__st2"),
      col("__fp").as("__fp2"))
    val ab = firsts.join(b,
        col("__u") === col("__u2") && col("__st") =!= col("__st2") &&
          col("__fp") < col("__fp2"))
      .groupBy(col("__st").as("antecedent"), col("__st2").as("consequent"))
      .agg(count(lit(1)).as("n_users_ab"))
    val out = ab.join(perA, "antecedent").crossJoin(broadcast(users))
      .select(col("antecedent"), col("consequent"),
        col("n_users_ab"), col("n_users_a"),
        col("__nu").cast(LongType).as("n_users"),
        (col("n_users_ab").cast(DoubleType) / col("__nu").cast(DoubleType))
          .as("support"),
        (col("n_users_ab").cast(DoubleType) /
          col("n_users_a").cast(DoubleType)).as("confidence"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    firsts.unpersist()
    out
  }

  /** CONTIGUOUS n-GRAM SEQUENCE PATTERNS — the top event-type runs of
    * length `n` by occurrence count (the contiguous complement of
    * [[sequenceSupport]]'s first-occurrence pair support; PrefixSpan's
    * bread-and-butter readout for short patterns): one window pass
    * builds the lead chain, a keyed count aggregates, TakeOrdered keeps
    * the top `topK` with a TOTAL (count DESC, pattern ASC) order.
    * Returns (pattern, n_occurrences, n_users). */
  def ngramPatterns(df: DataFrame, userCol: String, orderCols: Seq[String],
                    stateCol: String, n: Int = 3, topK: Int = 20)
      : DataFrame = {
    require(n >= 2 && topK >= 1, s"n=$n topK=$topK")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(userCol))
      .orderBy(orderCols.map(col): _*)
    val leads = (1 until n).foldLeft(
      df.filter(col(stateCol).isNotNull)
        .withColumn("__s0", col(stateCol).cast(org.apache.spark.sql.types.StringType))) {
      (d, i) => d.withColumn(s"__s$i", lead(col("__s0"), i).over(w))
    }
    val full = (1 until n).map(i => col(s"__s$i").isNotNull).reduce(_ && _)
    leads.filter(full)
      .withColumn("__pat",
        concat_ws(" > ", (0 until n).map(i => col(s"__s$i")): _*))
      .groupBy(col("__pat").as("pattern"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("pattern").asc)
      .limit(topK)
  }
}
