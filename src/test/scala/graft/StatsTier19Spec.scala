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

  test("neighborhoodFunction: directed path 1->2->3 — exact ball sums, " +
       "coverage, and the 90% effective-diameter flag") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val r = Graph.neighborhoodFunction(e, "s", "d", radius = 2, k = 16)
      .orderBy("r").collect()
    // balls pull along v→u: r0 sizes (1,1,1)=3; r1 (2,2,1)=5; r2 (3,2,1)=6
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 3L, 3L)) // node universe
    assert(r.map(_.getDouble(2)).toSeq == Seq(3.0, 5.0, 6.0), "N(r)")
    assert(r(2).getDouble(3) == 1.0 && math.abs(r(1).getDouble(3) - 5.0 / 6.0) < 1e-12)
    // 90% threshold: 3/6 and 5/6 miss, 6/6 reaches — d_eff = 2
    assert(r.map(_.getBoolean(4)).toSeq == Seq(false, false, true))
  }

  test("mannKendall: monotone series S = C(n,2), slope 1; constant " +
       "series S = 0 with null z (all-tied variance)") {
    import spark.implicits._
    def hourly(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, h) =>
        Seq.fill(c)((java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"),
          "click"))
      }.toDF("ts", "event_type")
    val up = Stats.mannKendall(hourly(Seq(1, 2, 3, 4)), "ts",
      "event_type", "click").collect()(0)
    assert(up.getLong(0) == 4L && up.getLong(1) == 6L) // n, S = C(4,2)
    assert(up.getDouble(2) == (4.0 * 3 * 13) / 18.0)   // no ties
    assert(math.abs(up.getDouble(3) - 5.0 / math.sqrt(156.0 / 18.0)) < 1e-15)
    assert(up.getDouble(4) == 1.0, "all pairwise slopes are 1")
    val const = Stats.mannKendall(hourly(Seq(2, 2, 2)), "ts",
      "event_type", "click").collect()(0)
    assert(const.getLong(1) == 0L && const.isNullAt(3), "tied: S=0, z null")
    assert(const.getDouble(4) == 0.0)
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

  test("dupClusterProfile: sizes, shares, and the descending cumulate") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "unique a"),
      (4L, "unique b")).toDF("doc_id", "text")
    val r = graft.llm.TextDedup.dupClusterProfile(docs, "doc_id", "text")
      .orderBy("cluster_size").collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 2L &&
      r(0).getDouble(3) == 0.5 && r(0).getDouble(4) == 1.0)
    assert(r(1).getLong(0) == 2L && r(1).getLong(1) == 1L &&
      r(1).getDouble(3) == 0.5 && r(1).getDouble(4) == 0.5)
  }

  test("repetitionLoops: cycle-1 and cycle-2 runs, short docs zero") {
    import spark.implicits._
    val docs = Seq((1L, "x x x x y"), (2L, "a b a b a b"), (3L, "q"),
      (4L, "no loops at all here")).toDF("doc_id", "text")
    val r = graft.llm.TextStats.repetitionLoops(docs, "doc_id", "text", 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(1L)._1 == 3L, s"x-run: ${r(1L)}") // x x x x -> 3 matches
    assert(r(2L)._2 == 4L, s"ab-cycle: ${r(2L)}") // positions 2..5 match
    assert(r(3L) == ((0L, 0L, 0L)))
    assert(r(4L) == ((0L, 0L, 0L)))
  }

  test("gumbelFit: two-block hand case and the constant-degenerate gate") {
    import spark.implicits._
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 05:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 05:00:00")
    val df = Seq((t1, 1.0), (t1, 0.5), (t2, 3.0)).toDF("ts", "value")
    val r = Stats.gumbelFit(df, "ts", "value").collect()(0)
    // maxima {1, 3}: mean 2, sample var 2
    assert(r.getLong(0) == 2L && r.getDouble(1) == 2.0)
    val beta = math.sqrt(2.0) * math.sqrt(6.0) / math.Pi
    assert(math.abs(r.getDouble(r.fieldIndex("beta")) - beta) < 1e-12)
    val const = Seq((t1, 2.0), (t2, 2.0)).toDF("ts", "value")
    val rc = Stats.gumbelFit(const, "ts", "value").collect()(0)
    assert(rc.isNullAt(rc.fieldIndex("beta")), "zero variance -> null fit")
  }

  test("atkinsonIndex: equality -> ~0; non-positive rows excluded") {
    import spark.implicits._
    val r = Stats.atkinsonIndex(
      Seq(5.0, 5.0, 5.0, -1.0, 0.0).toDF("v"), "v").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(r.fieldIndex("atkinson"))) < 1e-7)
  }

  test("trimmedMean: k = floor(alpha n) cut from each end, exact mean") {
    import spark.implicits._
    val vals = Seq(-50.0) ++ (1 to 8).map(_.toDouble) ++ Seq(1000.0)
    val df = vals.map(v => ("g", v)).toDF("k", "v")
    val r = Stats.trimmedMean(df, "v", "k", alpha = 0.1).collect()(0)
    assert(r.getLong(1) == 10L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 4.5, s"mean of 1..8: ${r.getDouble(3)}")
  }

  test("meanIdf: ubiquitous tokens pull the mean down; repeats weight " +
       "instances, df counts docs once") {
    import spark.implicits._
    // "common" in all 4 docs (idf ln(5/5)=0); "rare" in one (ln(5/2))
    val docs = Seq((1L, "common rare rare"), (2L, "common"),
      (3L, "common"), (4L, "common")).toDF("doc_id", "text")
    val r = graft.llm.TextStats.meanIdf(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    val idfRare = math.log(5.0 / 2.0)
    assert(r(2L)._2 == 0.0, "all-common doc has zero rarity")
    assert(r(1L)._1 == 3L, "instances counted with repeats")
    // doc 1 mean = (0 + 2*idfRare)/3, up to the 1e-9 floor grid
    assert(math.abs(r(1L)._2 - 2.0 * idfRare / 3.0) < 1e-8, r(1L).toString)
  }

  test("burstDetect: a 5x window is one burst; a flat series has none") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def series(boost: Int => Int) = (0 until 120).flatMap { i =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until boost(i)).map(_ => (t, "purchase"))
    }.toDF("ts", "event_type")
    val flat = Stats.burstDetect(series(_ => 3), "ts", "event_type",
      "purchase").collect()(0)
    assert(flat.getLong(3) == 0L, s"flat series must not burst: $flat")
    val bursty = Stats.burstDetect(
      series(i => if (i >= 50 && i < 60) 15 else 3),
      "ts", "event_type", "purchase").collect()(0)
    assert(bursty.getLong(3) == 1L && bursty.getLong(4) == 10L,
      s"one 10-hour burst expected: $bursty")
    assert(bursty.getLong(5) == 50L, s"burst starts at idx 50: $bursty")
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
