package graft

import org.apache.spark.sql.functions._
import graft.ops.{Stats, Graph, Indicators}

/** Semantic pins for the round-18 wave (q374–q382): ADF, trend test,
  * Benford, Deming, OBV, local clustering, KMV harmonic centrality,
  * TextRank, domain centroids. Each case is hand-computable. */
class StatsTier19Spec extends SparkSuite {
  init()

  test("cochranArmitage: 2-category hand case gives z = 2 exactly") {
    import spark.implicits._
    // scores 0/1; cat a: 2 trials 0 successes; cat b: 2 trials 2 successes
    // p = 1/2, T = 2 − 2·0.5 = 1, V = 0.25·(2 − 4/4) = 0.25 → z = 2.0
    val df = Seq(("a", 0), ("a", 0), ("b", 1), ("b", 1)).toDF("c", "y")
    val r = Stats.cochranArmitage(df, "c", Seq("a", "b"),
      col("y") === 1).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0, s"z=${r.getDouble(2)}")
  }

  test("cochranArmitage: constant outcome has zero variance -> null z") {
    import spark.implicits._
    val df = Seq(("a", 1), ("b", 1)).toDF("c", "y")
    val r = Stats.cochranArmitage(df, "c", Seq("a", "b"),
      col("y") === 1).collect()(0)
    assert(r.isNullAt(2))
  }

  test("adfTest: strongly mean-reverting series is stationary; white " +
       "noise around a trend is not flagged the same way") {
    import spark.implicits._
    // alternating hourly counts — Δy = ±2 always opposing the level:
    // the textbook stationary case, df_stat far below −2.86
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 200).map { i =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      // period-3 cycle 1,2,3 — mean-reverting, but Δy is NOT an exact
      // linear function of the level (an alternating 1,3 series is:
      // rss = 0 there and the se gate correctly nulls the statistic)
      val n = (i % 3) + 1
      (0 until n).map(j => (t, "click"))
    }.flatten
    val r = Stats.adfTest(rows.toDF("ts", "event_type"), "ts",
      "event_type", "click").collect()(0)
    assert(r.getDouble(r.fieldIndex("df_stat")) < -2.86,
      s"alternating series must reject the unit root: $r")
    assert(r.getInt(r.fieldIndex("stationary_5pct")) == 1)
  }

  test("adfTest: constant series (zero lag variance) -> null gamma/stat") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 50).map { i =>
      (new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L), "click")
    }
    val r = Stats.adfTest(rows.toDF("ts", "event_type"), "ts",
      "event_type", "click").collect()(0)
    assert(r.isNullAt(r.fieldIndex("gamma")) &&
      r.isNullAt(r.fieldIndex("df_stat")))
  }

  test("benfordTest: digit extraction is significant-digit (skips " +
       "leading zeros) and all 9 rows appear with zero counts") {
    import spark.implicits._
    val df = Seq(102.5, 0.0023, 9000.0, 1.0).toDF("v")
    val rows = Stats.benfordTest(df, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows(1) == 2L, s"102.5 and 1.0 lead with 1: $rows") // 102.5, 1.0
    assert(rows(2) == 1L, "0.0023 leads with 2")
    assert(rows(9) == 1L, "9000 leads with 9")
    assert(rows(4) == 0L && rows.size == 9, "all digits present")
  }

  test("demingRegression: exact line y = 2x gives TLS slope == OLS == 2") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i * 0.5, i * 1.0)).toDF("x", "y")
    val r = Stats.demingRegression(df, "x", "y").collect()(0)
    assert(r.getDouble(r.fieldIndex("slope")) == 2.0, r.toString)
    assert(r.getDouble(r.fieldIndex("slope_ols")) == 2.0)
    assert(math.abs(r.getDouble(r.fieldIndex("intercept"))) < 1e-9)
  }

  test("obv: signed volume cumulates, flat ticks contribute zero") {
    import spark.implicits._
    val df = Seq((1, 1.0, 10.0), (2, 2.0, 20.0), (3, 2.0, 30.0),
      (4, 1.0, 40.0)).toDF("t", "p", "v").withColumn("k", lit("a"))
    val out = Indicators.obv(df, Seq("k"), Seq("t"), "p", "v")
      .orderBy("t").collect().map(_.getAs[Double]("obv"))
    assert(out.toSeq == Seq(0.0, 20.0, 20.0, -20.0), out.toSeq.toString)
  }

  test("localClustering: triangle + pendant — coefficients 1/3, 1, 1, null") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("s", "d")
    val r = Graph.localClustering(e, "s", "d").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 3L && r(1L).getLong(2) == 1L)
    assert(math.abs(r(1L).getDouble(3) - 1.0 / 3.0) < 1e-15)
    assert(r(2L).getDouble(3) == 1.0 && r(3L).getDouble(3) == 1.0)
    assert(r(4L).isNullAt(3), "degree-1 coefficient is undefined")
  }

  test("harmonicCentralityKmv: directed path 1->2->3, exact below k") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val r = Graph.harmonicCentralityKmv(e, "s", "d", radius = 2, k = 16)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // h(1) = (2−1)/1 + (3−2)/2 = 1.5; h(2) = 1 (ball stops growing);
    // h(3) = 0 (no out-edges)
    assert(r(1L) == 1.5 && r(2L) == 1.0 && r(3L) == 0.0, r.toString)
  }

  test("textRankKeywords: symmetric 2-token graph ranks both equally; " +
       "tokens below minCount never become nodes") {
    import spark.implicits._
    val docs = (1 to 6).map(i => s"alpha beta rare$i").toDF("text")
    val out = graft.llm.TextStats
      .textRankKeywords(docs, "text", minCount = 5L, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("alpha", "beta"), out.toString)
    assert(out("alpha") == out("beta"), "symmetric nodes rank equally")
  }

  test("domainCentroidSimilarity: identical groups cosine 1, orthogonal 0") {
    import spark.implicits._
    val df = Seq(
      ("a", Array(1.0f, 0.0f)), ("a", Array(1.0f, 0.0f)),
      ("b", Array(1.0f, 0.0f)),
      ("c", Array(0.0f, 1.0f)))
      .toDF("label", "embedding")
    val out = graft.llm.Similarity
      .domainCentroidSimilarity(df, "label")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("a", "b")) == 1.0, out.toString)
    assert(out(("a", "c")) == 0.0 && out(("b", "c")) == 0.0)
  }
}
