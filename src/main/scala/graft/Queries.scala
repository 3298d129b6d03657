package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops._
import graft.ops.TableOps._
import graft.ops.Reductions._

/** The operator-coverage query registry (SURVEY §2 inventory → one named query
  * per operator) plus the DuckDB oracle SQL for each.
  *
  * Engine policy for oracle parity (and cross-run reproducibility at scale):
  *  - every query ends in an explicit total order (unique tiebreaker columns);
  *  - every floating-point aggregate is routed through exact decimal
  *    accumulation (Reductions.dsum) so the result does not depend on Spark's
  *    partial-aggregation merge order — the same SQL shape is used in the
  *    oracle, so both engines produce bit-identical doubles;
  *  - NULL ordering is always explicit (Spark defaults asc=NULLS FIRST,
  *    desc=NULLS LAST; DuckDB defaults differ).
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  // ---- relational core ----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ LlmQueries.queries ++ ExtQueries.queries

  def oracleSql: Map[String, String] =
    coreOracle ++ LlmQueries.oracleSql ++ ExtQueries.oracleSql

  private val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // group-by-column-agg (SURVEY §2.4; reference reductions.clj:377-590) —
    // TPC-H Q1 shape: multi-aggregate group-by with filter pushdown.
    "q01_groupby_agg" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          isum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          dmean(col("l_quantity")).as("avg_qty"),
          dmean(col("l_discount"), 8).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // filter + projection + scalar math (SURVEY §2.2 filter/filter-column) —
    // TPC-H Q6 shape; single-row exact revenue.
    "q02_filter_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(isum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // multi-table equi join + agg (SURVEY §2.3 hash-join/inner-join) — TPC-H
    // Q3 shape; dimension side broadcast, fact side shuffles once on the key.
    "q03_join_agg" -> { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(isum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // sort + limit / min-n-by-column top-k (SURVEY §2.4, §2.6) — Catalyst
    // plans TakeOrderedAndProject: per-partition heap, no global sort.
    "q04_sort_limit" -> { (s, dir) =>
      Reductions.minNByColumn(
        t(s, dir, "lineitem")
          .selectColumns("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"),
        "l_extendedprice", 15, descending = true,
        // the tiebreak is part of the top-k SELECTION (not just the final
        // presentation sort): boundary ties on l_extendedprice would
        // otherwise let the unstable heap pick a different row SET than
        // the oracle's deterministic 4-column LIMIT
        tiebreak = Seq(col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_quantity").asc))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc, col("l_quantity").asc)
    },

    // distinct rows (SURVEY §2.4 unique-by).
    "q05_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem").selectColumns("l_returnflag", "l_linestatus")
        .uniqueRows.orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // unique-by-column with deterministic keep (SURVEY §2.4; reference
    // base.clj:760-794) — one row per customer: their first order.
    "q06_unique_by" -> { (s, dir) =>
      t(s, dir, "orders")
        .selectColumns("o_custkey", "o_orderkey", "o_totalprice")
        .uniqueByColumn(Seq("o_custkey"), Seq(col("o_orderkey").asc))
        .orderBy(col("o_custkey"))
    },

    // anti join (SURVEY §2.3 semi/anti; reference models it as set
    // difference): customers with no open ('O') order.
    "q07_anti_join" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .selectColumns("c_custkey", "c_name")
        .orderBy(col("c_custkey"))
    },

    // semi join.
    "q08_semi_join" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .selectColumns("c_custkey", "c_mktsegment")
        .orderBy(col("c_custkey"))
    },

    // left outer join + agg (SURVEY §2.3 left-join; padding null counts as 0).
    "q09_outer_join" -> { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spend"))
        .orderBy(col("c_custkey"))
    },

    // window ranking family (SURVEY §2.5 — absent in reference, free here):
    // top-3 orders per customer by price, with rank + lag.
    "q10_window_rank" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .filter(col("rnk") <= 3)
        .selectColumns("o_custkey", "o_orderkey", "o_totalprice", "rnk", "prev_price")
        .orderBy(col("o_custkey"), col("rnk"))
    },

    // rolling fixed window (SURVEY §2.5; reference rolling.clj:116-304):
    // trailing 7-row mean per user, decimal-exact.
    "q11_rolling_mean" -> { (s, dir) =>
      Rolling.rolling(
        t(s, dir, "events").selectColumns("event_id", "user_id", "ts", "value"),
        7, Rolling.Left, Seq(col("ts"), col("event_id")), Seq(col("user_id")),
        "roll_avg" -> (w =>
          sum(floor(col("value") * lit(1e6)).cast(DecimalType(30, 0))).over(w)
            .cast(DoubleType) / lit(1e6) / count(col("value")).over(w)))
        .selectColumns("event_id", "user_id", "roll_avg")
        .orderBy(col("event_id"))
    },

    // expanding/cumulative window (reference rolling.clj:307-314).
    "q12_expanding_sum" -> { (s, dir) =>
      Rolling.expanding(
        t(s, dir, "events").selectColumns("event_id", "user_id", "ts", "value"),
        Seq(col("ts"), col("event_id")), Seq(col("user_id")),
        "cum_sum" -> (w =>
          sum(floor(col("value") * lit(1e6)).cast(DecimalType(30, 0))).over(w)
            .cast(DoubleType) / lit(1e6)),
        "cum_n" -> (w => count(lit(1)).over(w)))
        .selectColumns("event_id", "user_id", "cum_sum", "cum_n")
        .orderBy(col("event_id"))
    },

    // replace-missing :down/:up (SURVEY §2.2; reference missing.clj:209-293)
    // over synthesized nulls, per-user event order.
    "q13_fill_missing" -> { (s, dir) =>
      val e = t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "click", lit(null).cast(DoubleType))
          .otherwise(col("value")).as("v"))
      val ord = Seq(col("ts"), col("event_id"))
      val part = Seq(col("user_id"))
      val d1 = Missing.fillDown(e.withColumn("v_down", col("v")), "v_down", ord, part)
      val d2 = Missing.fillUp(d1.withColumn("v_up", col("v")), "v_up", ord, part)
      d2.selectColumns("event_id", "user_id", "v", "v_down", "v_up")
        .orderBy(col("event_id"))
    },

    // as-of join (SURVEY §2.3 left-join-asof — THE custom operator;
    // reference join.clj:747-799): each event matched to the user's most
    // recent *strictly earlier* purchase event.
    "q14_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events").selectColumns("event_id", "user_id", "ts")
      val purch = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("p_event_id"))
        .select(col("user_id"), col("ts").as("p_ts"), col("p_event_id"))
      Joins.asofJoin(ev, purch, "ts", "p_ts", Seq(("user_id", "user_id")),
        Joins.Backward, allowExactMatch = false)
        .selectColumns("event_id", "user_id", "p_event_id")
        .orderBy(col("event_id"))
    },

    // q14's exact semantics through the CUSTOM CATALYST OPERATOR
    // (graft.plans.AsofJoinExec: merge exec, SMJ-style shuffle+sort
    // wiring, no union/window machinery) — same oracle, different plan;
    // AsofMergeSpec pins plan shape and fuzz equivalence.
    "q281_asof_merge" -> { (s, dir) =>
      val ev = t(s, dir, "events").selectColumns("event_id", "user_id", "ts")
      val purch = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("p_event_id"))
        .select(col("user_id"), col("ts").as("p_ts"), col("p_event_id"))
      graft.plans.AsofMerge.asofJoinMerge(ev, purch, "ts", "p_ts",
          Seq(("user_id", "user_id")), forward = false,
          allowExactMatch = false)
        .selectColumns("event_id", "user_id", "p_event_id")
        .orderBy(col("event_id"))
    },

    // concat with type widening + missing-column padding (SURVEY §2.6;
    // reference base.clj:619-750).
    "q15_concat" -> { (s, dir) =>
      val a = t(s, dir, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey").as("k"), col("l_quantity").as("q"))
      val b = t(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      a.concatWidening(b)
        .orderBy(col("k").asc, col("q").asc_nulls_first, col("p").asc_nulls_first)
    },

    // melt / columnwise-concat (SURVEY §2.6; reference dataset_api.clj:1126).
    "q16_melt" -> { (s, dir) =>
      Reshape.melt(
        t(s, dir, "lineitem")
          .selectColumns("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"),
        Seq("l_orderkey", "l_linenumber"), Seq("l_quantity", "l_discount", "l_tax"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("column"),
          col("value"))
    },

    // pivot / transpose-by-key (SURVEY §2.6; reference dataset_api.clj:1472):
    // customers per (nation, mktsegment), explicit pivot domain (no discovery
    // scan), absent combos as 0.
    "q17_pivot" -> { (s, dir) =>
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      Reshape.pivot(t(s, dir, "customer"), Seq("c_nationkey"), "c_mktsegment",
        segs, count(lit(1)))
        .na.fill(0L, segs)
        .orderBy(col("c_nationkey"))
    },

    // explode / unroll-column with ordinal (SURVEY §2.6; reference
    // dataset_api.clj:1204-1296) over the embedding list column.
    "q18_explode" -> { (s, dir) =>
      Reshape.unroll(
        t(s, dir, "embeddings").filter(col("vec_id") < 10)
          .selectColumns("vec_id", "embedding"),
        "embedding", indexes = true)
        .selectRename("vec_id" -> "vec_id", "embedding_idx" -> "idx", "embedding" -> "val")
        .orderBy(col("vec_id"), col("idx"))
    },

    // bag set ops (SURVEY §2.6; reference set.clj): symmetric difference of
    // customer keys appearing in orders vs events-users.
    "q19_set_ops" -> { (s, dir) =>
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "events").select(col("user_id").as("k"))
      SetOps.difference(a, b, bag = false)
        .orderBy(col("k"))
    },

    // rollup grouping sets (SURVEY §2.4 — absent in reference, free in Spark).
    "q20_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // exact percentiles / prob-quantile exact counterpart (SURVEY §2.4;
    // reference reductions.clj:226-252).
    "q21_percentile" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("med_qty"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    },

    // descriptive stats: variance/stddev/corr, decimal-exact (SURVEY §2.4;
    // reference math.clj:37-109, dataset_api.clj:1300-1399).
    "q22_stats" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          Stats.varPopExpr(isum(col("l_quantity"), 4),
            isum(col("l_quantity") * col("l_quantity"), 4),
            count(lit(1)).cast(DoubleType)).as("var_qty"),
          sqrt(Stats.varPopExpr(isum(col("l_quantity"), 4),
            isum(col("l_quantity") * col("l_quantity"), 4),
            count(lit(1)).cast(DoubleType))).as("sd_qty"),
          Stats.corrExpr(
            isum(col("l_quantity"), 4), isum(col("l_extendedprice"), 4),
            isum(col("l_quantity") * col("l_quantity"), 4),
            isum(col("l_extendedprice") * col("l_extendedprice"), 2),
            isum(col("l_quantity") * col("l_extendedprice"), 4),
            count(lit(1)).cast(DoubleType)).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    },

    // cross join (SURVEY §2.3; reference join.clj:449-472) on tiny domains.
    "q23_cross_join" -> { (s, dir) =>
      val r = t(s, dir, "region").selectColumns("r_regionkey", "r_name")
      val f = t(s, dir, "lineitem").select(col("l_returnflag")).uniqueRows
      r.crossJoin(f).orderBy(col("r_regionkey"), col("l_returnflag"))
    },

    // categorical->number, deterministic fit/transform (SURVEY §2.2;
    // reference categorical.clj:80-144): lexicographic dense codes.
    "q24_categorical" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val codes = Categorical.fitLabelMap(cust, "c_mktsegment", "seg_code")
      Categorical.transform(cust, codes, "c_mktsegment")
        .selectColumns("c_custkey", "c_mktsegment", "seg_code")
        .orderBy(col("c_custkey"))
    },

    // multi-key pd-merge (SURVEY §2.3; reference join.clj:376-579) +
    // JSON field extraction (props column).
    "q25_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("k"), 0).as("sum_k"))
        .orderBy(col("event_type"))
    }
  )

  // ---- DuckDB oracle SQL (same shapes, same decimal routing) --------------

  private val coreOracle: Map[String, String] = Map(
    "q01_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q02_filter_project" ->
      """SELECT
         CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS revenue,
         COUNT(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""",

    "q03_join_agg" ->
      """SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY 1 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "q04_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC LIMIT 15""",

    "q05_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2""",

    "q06_unique_by" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS rn
           FROM orders) t WHERE rn = 1 ORDER BY o_custkey""",

    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
         ORDER BY c_custkey""",

    "q08_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",

    "q09_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(30,4))) AS DOUBLE) AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",

    "q10_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk, prev_price FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER w AS rnk,
                  lag(o_totalprice, 1) OVER w AS prev_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
         ) t WHERE rnk <= 3 ORDER BY o_custkey, rnk""",

    "q11_rolling_mean" ->
      """SELECT event_id, user_id,
         CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(30,0))) OVER w AS DOUBLE) / 1000000.0 / COUNT(value) OVER w AS roll_avg
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q12_expanding_sum" ->
      """SELECT event_id, user_id,
         CAST(SUM(CAST(FLOOR(value * 1000000.0) AS DECIMAL(30,0))) OVER w AS DOUBLE) / 1000000.0 AS cum_sum,
         COUNT(*) OVER w AS cum_n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q13_fill_missing" ->
      """SELECT event_id, user_id, v,
         COALESCE(v, last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS v_down,
         COALESCE(v, first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS v_up
         FROM (SELECT event_id, user_id, ts,
                      CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
               FROM events) t
         ORDER BY event_id""",

    "q14_asof_join" ->
      """SELECT e.event_id, e.user_id, p.p_event_id
         FROM events e ASOF LEFT JOIN (
           SELECT user_id, ts AS p_ts, max(event_id) AS p_event_id
           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
         ON e.user_id = p.user_id AND e.ts > p.p_ts
         ORDER BY e.event_id""",

    // identical semantics to q14 — the custom merge exec must agree with
    // DuckDB's native ASOF JOIN bit-for-bit
    "q281_asof_merge" ->
      """SELECT e.event_id, e.user_id, p.p_event_id
         FROM events e ASOF LEFT JOIN (
           SELECT user_id, ts AS p_ts, max(event_id) AS p_event_id
           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
         ON e.user_id = p.user_id AND e.ts > p.p_ts
         ORDER BY e.event_id""",

    "q15_concat" ->
      """SELECT k, q, p FROM (
           SELECT l_orderkey AS k, l_quantity AS q, NULL AS p
           FROM lineitem WHERE l_linenumber = 1
           UNION ALL
           SELECT o_orderkey AS k, NULL AS q, o_totalprice AS p FROM orders) t
         ORDER BY k ASC, q ASC NULLS FIRST, p ASC NULLS FIRST""",

    "q16_melt" ->
      """SELECT l_orderkey, l_linenumber, "column", value FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS "column", l_quantity AS value FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
         ORDER BY l_orderkey, l_linenumber, "column", value""",

    "q17_pivot" ->
      """SELECT c_nationkey,
         CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS AUTOMOBILE,
         CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS BUILDING,
         CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS FURNITURE,
         CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS HOUSEHOLD,
         CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS MACHINERY
         FROM customer GROUP BY 1 ORDER BY 1""",

    "q18_explode" ->
      """SELECT vec_id, t.i AS idx, embedding[t.i + 1] AS val
         FROM embeddings CROSS JOIN range(0, 64) t(i)
         WHERE vec_id < 10 ORDER BY vec_id, idx""",

    "q19_set_ops" ->
      """SELECT k FROM (
           SELECT o_custkey AS k FROM orders
           EXCEPT
           SELECT user_id AS k FROM events) t ORDER BY k""",

    "q20_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q21_percentile" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.5) AS med_qty,
         quantile_cont(l_extendedprice, 0.9) AS p90_price,
         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q22_stats" ->
      """SELECT l_returnflag, nb AS n,
         (sxx - sx * sx / n) / n AS var_qty,
         sqrt((sxx - sx * sx / n) / n) AS sd_qty,
         (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
         FROM (
           SELECT l_returnflag,
             COUNT(*) AS nb,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(FLOOR(l_quantity * 10000.0) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS sx,
             CAST(SUM(CAST(FLOOR(l_quantity * l_quantity * 10000.0) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS sxx,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS sy,
             CAST(SUM(CAST(FLOOR(l_extendedprice * l_extendedprice * 100.0) AS DECIMAL(30,0))) AS DOUBLE) / 100.0 AS syy,
             CAST(SUM(CAST(FLOOR(l_quantity * l_extendedprice * 10000.0) AS DECIMAL(30,0))) AS DOUBLE) / 10000.0 AS sxy
           FROM lineitem GROUP BY 1) t
         ORDER BY 1""",

    "q23_cross_join" ->
      """SELECT r_regionkey, r_name, l_returnflag
         FROM region CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
         ORDER BY r_regionkey, l_returnflag""",

    "q24_categorical" ->
      """SELECT c_custkey, c_mktsegment,
         CAST(dense_rank() OVER (ORDER BY c_mktsegment) - 1 AS INT) AS seg_code
         FROM customer ORDER BY c_custkey""",

    "q25_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(30,0))) AS DOUBLE) AS sum_k
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}

/** Deterministic moment-formula helpers shared by q22 and descriptiveStats:
  * all inputs are exact (scaled-integer sums), the final arithmetic is plain
  * IEEE double ops — identical on any engine. */
object Stats {
  def varPopExpr(sx: Column, sxx: Column, n: Column): Column =
    (sxx - sx * sx / n) / n
  def corrExpr(sx: Column, sy: Column, sxx: Column, syy: Column,
               sxy: Column, n: Column): Column =
    (n * sxy - sx * sy) /
      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
}

/** categorical->number fit/transform (reference categorical.clj:80-144):
  * the fitted value↔code map is itself a small DataFrame (broadcast on
  * transform), codes assigned by lexicographic order for determinism. */
object Categorical {
  /** Codes 0..n−1 by lexicographic value order, computed DISTRIBUTED: the
    * distinct-value frame gets its rank from a range-partitioned sort +
    * zipWithIndex (TableOps.withRowIndex) — no global window, so a
    * high-cardinality categorical (1M+ distinct) ranks in parallel instead
    * of funneling through one task. Output is byte-identical to the former
    * dense_rank form (distinct values ⇒ dense_rank ≡ row_number). */
  def fitLabelMap(df: DataFrame, c: String, codeName: String): DataFrame = {
    import graft.ops.TableOps._
    df.select(col(c)).distinct()
      .withRowIndex(Seq(col(c)), codeName)
      .withColumn(codeName, col(codeName).cast(IntegerType))
  }

  def transform(df: DataFrame, labelMap: DataFrame, c: String): DataFrame =
    df.join(broadcast(labelMap), Seq(c), "left")

  /** invert-categorical (reference categorical.clj:139-144 /
    * IndexToString): map codes back to values via the fitted map. */
  def invert(df: DataFrame, labelMap: DataFrame, codeName: String): DataFrame =
    df.join(broadcast(labelMap), Seq(codeName), "left")

  /** categorical->one-hot (reference categorical.clj:202-318). */
  def oneHot(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    values.foldLeft(df)((d, v) =>
      d.withColumn(s"${c}_$v", when(col(c) === v, 1).otherwise(0)))
}
