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
    * only. At 100 TB the event scan prunes to the stage types
    * (PushedFilters on the type column) and the survivor frames are tiny
    * relative to the corpus. */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = df.sparkSession
    import spark.implicits._
    val ev = df.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var reached = ev.filter(col("__t") === stages.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__cur"))
    val counts = scala.collection.mutable.ArrayBuffer[(Int, String, Long)](
      (1, stages.head, reached.count()))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = ev.filter(col("__t") === st)
        .join(reached, "__u")
        .filter(col("__ts") > col("__cur"))
        .groupBy(col("__u")).agg(min(col("__ts")).as("__cur"))
      counts += ((i + 1, st, reached.count()))
    }
    counts.toSeq.toDF("stage_idx", "stage", "n_users")
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
}
