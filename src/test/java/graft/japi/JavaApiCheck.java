package graft.japi;

import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;

/**
 * Pure-Java exercise of the {@link Graft} facade — the analog of the
 * reference's java_test/java/jtest/TMDDemo.java: proves the whole surface
 * is callable from Java source with no Scala idioms (static forwarders,
 * java.util collections, boxed primitives). Invoked by the ScalaTest
 * wrapper {@code JavaApiSpec}; throws AssertionError on any mismatch.
 */
public final class JavaApiCheck {

  private JavaApiCheck() {}

  private static void check(boolean cond, String msg) {
    if (!cond) throw new AssertionError(msg);
  }

  public static void run(SparkSession spark, String sfDir) {
    Dataset<Row> lineitem = graft.Tables.t(spark, sfDir, "lineitem");
    Dataset<Row> orders = graft.Tables.t(spark, sfDir, "orders");

    // 1. q01's shape: grouped named reducers through the Java map API
    LinkedHashMap<String, String> aggs = new LinkedHashMap<>();
    aggs.put("sum_qty", "sum:l_quantity");
    aggs.put("n", "count:*");
    aggs.put("mean_price", "mean:l_extendedprice");
    Dataset<Row> byFlag = Graft.sortByColumn(
        Graft.groupByAgg(lineitem, List.of("l_returnflag"), aggs),
        "l_returnflag", false, true);
    List<Row> flags = byFlag.collectAsList();
    check(flags.size() >= 2, "expected >=2 return flags");
    check(byFlag.columns().length == 4, "key + 3 aggs");
    long n0 = flags.get(0).getLong(flags.get(0).fieldIndex("n"));
    check(n0 > 0, "group counts must be positive");

    // 2. q03's shape: join + filter + top-k through the facade
    Dataset<Row> joined = Graft.join(
        Graft.filterSql(orders, "o_totalprice > 1000.0"),
        lineitem, List.of("o_orderkey"), List.of("l_orderkey"), "inner");
    Dataset<Row> top = Graft.minNByColumn(joined, "o_totalprice", 5, true,
        List.of("o_orderkey", "l_linenumber"));
    check(top.count() == 5, "top-k must return k rows");

    // 3. keyed as-of join (backward) — plans the Catalyst merge exec
    Dataset<Row> lastOrder = Graft.asofJoin(
        Graft.selectColumns(orders, List.of("o_custkey", "o_orderdate")),
        Graft.renameColumns(
            Graft.selectColumns(orders, List.of("o_custkey", "o_orderdate",
                "o_totalprice")),
            Map.of("o_orderdate", "prev_date")),
        "o_orderdate", "prev_date",
        new LinkedHashMap<>(Map.of("o_custkey", "o_custkey")),
        "backward", true);
    check(lastOrder.count() == orders.count(),
        "as-of keeps every left row");
    check(java.util.Arrays.asList(lastOrder.columns())
        .contains("o_totalprice"), "payload column must surface");

    // 4. missing-data + stats + display round out the surface
    Dataset<Row> stats = Graft.descriptiveStats(lineitem,
        List.of("l_quantity", "l_extendedprice"));
    check(stats.count() == 2, "one stats row per column");
    String printed = Graft.datasetToString(Graft.head(byFlag, 3), "flags");
    check(printed.contains("l_returnflag"), "print includes header");
    Dataset<Row> filled = Graft.fillValue(
        Graft.selectColumns(lineitem, List.of("l_returnflag")),
        Map.of("l_returnflag", "none"));
    check(Graft.dropMissing(filled, List.of("l_returnflag")).count()
        == lineitem.count(), "fill then drop-missing keeps all rows");

    // 5. round-15 surface: calendar rolling, dtype tags, LPA, naive
    // Bayes, markup stripping
    LinkedHashMap<String, String> cal = new LinkedHashMap<>();
    cal.put("n_3m", "count:o_orderkey");
    Dataset<Row> rolled = Graft.rollingCalendar(orders, "o_orderdate", 3,
        "months", List.of("o_custkey"), cal);
    check(rolled.count() == orders.count(),
        "calendar rolling keeps every row");

    Dataset<Row> tagged = Graft.parseTagged(
        Graft.renameColumns(
            Graft.selectColumns(orders, List.of("o_orderpriority")),
            Map.of("o_orderpriority", "kw")),
        "kw", "keyword");
    check(tagged.schema().apply("kw").metadata().contains("graft.dtype"),
        "dtype tag must land in metadata");

    Dataset<Row> edges = Graft.renameColumns(
        Graft.selectColumns(orders, List.of("o_custkey", "o_orderkey")),
        Map.of("o_custkey", "src", "o_orderkey", "dst"));
    check(Graft.labelPropagation(edges, "src", "dst", 2).count() > 0,
        "LPA returns a community per node");

    Dataset<Row> nb = Graft.naiveBayesPredict(orders,
        List.of("o_orderpriority"), "o_orderstatus", orders, "pred");
    check(java.util.Arrays.asList(nb.columns()).contains("pred"),
        "NB prediction column must surface");

    Dataset<Row> stripped = Graft.stripMarkup(
        Graft.renameColumns(
            Graft.selectColumns(orders, List.of("o_orderpriority")),
            Map.of("o_orderpriority", "html")),
        "html", "text");
    check(stripped.count() == orders.count(), "stripMarkup is per-row");

    // 6. series / drift / agreement surface
    Dataset<Row> qn = Graft.quantileNormalizeByGroup(lineitem,
        "l_returnflag", "l_quantity", 21);
    check(java.util.Arrays.asList(qn.columns()).contains("l_quantity_qn"),
        "quantile-normalized column must surface");

    Dataset<Row> psi = Graft.psi(orders, "o_totalprice",
        "o_orderstatus = 'F'", "o_orderstatus <> 'F'", 10);
    check(psi.count() == 1, "psi is a one-row scalar frame");

    Dataset<Row> jsd = Graft.jsDivergence(orders, "o_orderpriority",
        "o_orderstatus = 'F'", "o_orderstatus <> 'F'");
    check(jsd.count() == 1, "jsd is a one-row scalar frame");

    Dataset<Row> assoc = Graft.associationTable(orders,
        List.of("o_orderstatus", "o_orderpriority"));
    check(assoc.count() == 1, "one row per unordered pair");

    Dataset<Row> mi = Graft.binnedMi(lineitem, "l_quantity",
        "l_extendedprice", 10);
    check(mi.count() == 1, "binned MI is a one-row scalar frame");

    Dataset<Row> kappa = Graft.fleissKappa(orders, "o_custkey",
        "o_orderpriority");
    check(kappa.count() == 1, "kappa is a one-row scalar frame");

    Dataset<Row> sampled = Graft.weightedSampleK(lineitem,
        "l_quantity", 25, List.of("l_orderkey", "l_linenumber"));
    check(sampled.count() == 25, "weighted race returns exactly k");

    Dataset<Row> cp = Graft.changepoint(
        Graft.selectColumns(lineitem,
            List.of("l_returnflag", "l_orderkey", "l_extendedprice")),
        List.of("l_returnflag"), List.of("l_orderkey"), "l_extendedprice");
    check(cp.count() > 0, "one changepoint row per series");

    Dataset<Row> ar = Graft.arFit(
        Graft.selectColumns(lineitem,
            List.of("l_returnflag", "l_orderkey", "l_extendedprice")),
        List.of("l_returnflag"), List.of("l_orderkey"), "l_extendedprice");
    check(java.util.Arrays.asList(ar.columns()).contains("phi1"),
        "AR coefficients must surface");

    Dataset<Row> conf = Graft.splitConformal(lineitem, "l_quantity",
        "l_extendedprice", List.of("l_orderkey", "l_linenumber"), 0.1);
    check(conf.count() == 1, "conformal is a one-row scalar frame");

    Dataset<Row> seg = Graft.segmentedTrend(
        Graft.selectColumns(lineitem,
            List.of("l_returnflag", "l_orderkey", "l_extendedprice")),
        List.of("l_returnflag"), List.of("l_orderkey"), "l_extendedprice");
    check(java.util.Arrays.asList(seg.columns()).contains("slope_change"),
        "segmented slopes must surface");

    Dataset<Row> maha = Graft.mahalanobisOutliers(lineitem,
        "l_quantity", "l_extendedprice", 9.21);
    check(java.util.Arrays.asList(maha.columns()).contains("d2"),
        "d2 column must surface");

    // 7. indicator + association tier (round 17)
    Dataset<Row> series = Graft.selectColumns(lineitem,
        List.of("l_returnflag", "l_orderkey", "l_linenumber",
            "l_extendedprice"));
    Dataset<Row> rsi = Graft.rsi(series, List.of("l_returnflag"),
        List.of("l_orderkey", "l_linenumber"), "l_extendedprice", 14);
    check(java.util.Arrays.asList(rsi.columns()).contains("rsi"),
        "rsi column must surface");

    Dataset<Row> macd = Graft.macd(series, List.of("l_returnflag"),
        List.of("l_orderkey", "l_linenumber"), "l_extendedprice",
        12, 26, 9);
    check(java.util.Arrays.asList(macd.columns()).contains("macd_hist"),
        "macd histogram must surface");

    Dataset<Row> ves = Graft.varEs(series, List.of("l_returnflag"),
        List.of("l_orderkey", "l_linenumber"), "l_extendedprice", 0.05);
    check(ves.count() == 3, "one VaR/ES row per return flag");

    Dataset<Row> tu = Graft.theilU(lineitem, "l_returnflag",
        "l_linestatus");
    check(tu.count() == 1, "Theil U is a one-row scalar frame");

    Dataset<Row> oa = Graft.ordinalAssociation(lineitem, "l_quantity",
        "l_discount");
    check(java.util.Arrays.asList(oa.columns()).contains("somers_d_yx"),
        "Somers D must surface");

    Dataset<Row> dw = Graft.durbinWatson(series, List.of("l_returnflag"),
        List.of("l_orderkey", "l_linenumber"), "l_extendedprice");
    check(dw.count() == 3, "one DW row per return flag");

    Dataset<Row> hits = Graft.hits(
        Graft.selectColumns(lineitem, List.of("l_suppkey", "l_partkey")),
        "l_suppkey", "l_partkey", 2);
    check(java.util.Arrays.asList(hits.columns()).contains("auth"),
        "HITS authority column must surface");

    // 8. diagnostics / clustering / portable-kernel tier (round 17)
    Dataset<Row> pacf = Graft.pacf(series, List.of("l_returnflag"),
        List.of("l_orderkey", "l_linenumber"), "l_extendedprice");
    check(pacf.count() == 1, "pacf is a one-row scalar frame");

    LinkedHashMap<String, String> fd = new LinkedHashMap<>();
    fd.put("o_orderkey", "o_custkey");
    check(Graft.fdAudit(orders, fd).count() == 1, "one row per FD pair");

    check(Graft.keyAudit(orders,
        List.of(List.of("o_orderkey"))).count() == 1,
        "one row per key candidate");

    Dataset<Row> pi = Graft.markovStationary(lineitem,
        List.of("l_returnflag"), List.of("l_orderkey", "l_linenumber"),
        "l_linestatus", 2);
    check(pi.count() > 0, "stationary mass per state");

    Dataset<Row> lev = Graft.leveneTest(lineitem, "l_extendedprice",
        "l_returnflag");
    check(java.util.Arrays.asList(lev.columns()).contains("f"),
        "Levene F must surface");

    Dataset<Row> bfs = Graft.bfsDistances(
        Graft.renameColumns(
            Graft.selectColumns(lineitem, List.of("l_suppkey", "l_partkey")),
            Map.of("l_suppkey", "src", "l_partkey", "dst")),
        "src", "dst", List.of(1L), 2);
    check(java.util.Arrays.asList(bfs.columns()).contains("dist"),
        "BFS dist column must surface");

    Dataset<Row> bd = Graft.businessDaysBetween(
        Graft.selectColumns(orders, List.of("o_orderdate")),
        "o_orderdate", "o_orderdate", "bd");
    check(bd.filter("bd <> 0").count() == 0, "same-day span is 0 days");

    Dataset<Row> hm = Graft.huberMean(lineitem, "l_extendedprice",
        "l_returnflag");
    check(java.util.Arrays.asList(hm.columns()).contains("huber_mean"),
        "Huber mean must surface");

    Dataset<Row> pg = Graft.periodogram(
        Graft.groupByAgg(orders, List.of("o_orderdate"),
            new LinkedHashMap<>(Map.of("n", "count:o_orderkey"))),
        List.of("o_orderdate"), "n", 3);
    check(pg.count() == 3, "one power row per frequency");
  }
}
