package graft

import org.apache.spark.sql.functions._
import graft.ops.{Stats, Graph, Ml}
import graft.llm.TextStats

/** Semantic pins for the round-19 closing wave (q394+): Cramér's V,
  * mutual information, Chatterjee's ξ, Yule's K. Each case is
  * hand-computable. */
class StatsTier20Spec extends SparkSuite {
  init()

  test("cramersV: perfect 2x2 association gives V = 1 exactly") {
    import spark.implicits._
    val df = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "2"))
      .toDF("x", "y")
    val r = Stats.cramersV(df, "x", "y").collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L) // dof
    // chi2 = n = 4 for a perfect 2x2; V = sqrt(4/(4*1)) = 1
    assert(math.abs(r.getDouble(4) - 4.0) < 1e-6, s"chi2=${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-6, s"v=${r.getDouble(5)}")
  }

  test("cramersV: independent uniform grid gives chi2 = 0, V = 0") {
    import spark.implicits._
    val df = (for (x <- Seq("a", "b"); y <- Seq("1", "2", "3"))
      yield (x, y)).toDF("x", "y")
    val r = Stats.cramersV(df, "x", "y").collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("cramersV: zero-observed cells enter the chi2 (3 cats, missing cell)") {
    import spark.implicits._
    // x=a never sees y=2: the (a,2) expected cell must still contribute
    val df = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "1"))
      .toDF("x", "y")
    val r = Stats.cramersV(df, "x", "y").collect()(0)
    // o: (a,1)=2 (a,2)=0 (b,1)=1 (b,2)=1; rt a=2 b=2; ct 1=3 2=1; n=4
    // e: (a,1)=1.5 (a,2)=.5 (b,1)=1.5 (b,2)=.5
    // chi2 = .25/1.5 + .25/.5 + .25/1.5 + .25/.5 = 1/3 + 1 = 4/3
    // (tolerance: the 1e-6 floor grid truncates each of the 4 cells)
    assert(math.abs(r.getDouble(4) - 4.0 / 3.0) < 5e-6,
      s"chi2=${r.getDouble(4)}")
  }

  test("kpssTest: alternating series is level-stationary; a strong " +
       "trend rejects; constant series nulls") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def series(ys: Seq[Int]) = ys.zipWithIndex.flatMap { case (y, i) =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until y).map(_ => (t, "click"))
    }.toDF("ts", "event_type")
    val alt = Stats.kpssTest(series((0 until 40).map(i => 1 + i % 2)),
      "ts", "event_type", "click").collect()(0)
    assert(alt.getDouble(1) < 0.463 && alt.getInt(2) == 1, alt.toString)
    val trend = Stats.kpssTest(series((1 to 40)), "ts", "event_type",
      "click").collect()(0)
    assert(trend.getDouble(1) > 0.463 && trend.getInt(2) == 0,
      trend.toString)
    val const = Stats.kpssTest(series(Seq.fill(10)(3)), "ts",
      "event_type", "click").collect()(0)
    assert(const.isNullAt(1) && const.isNullAt(2))
  }

  test("chatterjeeXi: y a strict function of x gives xi = 1 - 3/(n+1)") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // hour i: i+1 views (x), 2(i+1) clicks (y = 2x, monotone, no ties)
    val rows = (0 until 6).flatMap { i =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until (i + 1)).map(_ => (t, "view")) ++
        (0 until 2 * (i + 1)).map(_ => (t, "click"))
    }
    val r = Stats.chatterjeeXi(rows.toDF("ts", "event_type"), "ts",
      "event_type", "view", "click").collect()(0)
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getDouble(3) - (1.0 - 3.0 / 7.0)) < 1e-12,
      s"xi=${r.getDouble(3)}")
  }

  test("chatterjeeXi: constant y (all ties) -> zero denominator -> null xi") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 5).flatMap { i =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until (i + 1)).map(_ => (t, "view")) :+ ((t, "click"))
    }
    val r = Stats.chatterjeeXi(rows.toDF("ts", "event_type"), "ts",
      "event_type", "view", "click").collect()(0)
    assert(r.getLong(2) == 0L && r.isNullAt(3))
  }

  test("chowTest: a level jump at the midpoint gives a large positive F; " +
       "a perfect two-piece fit nulls F (RSS1+RSS2 = 0 gate)") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def series(ys: Seq[Int]) = ys.zipWithIndex.flatMap { case (y, i) =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until y).map(_ => (t, "view"))
    }.toDF("ts", "event_type")
    // zig-zag around two very different levels: segments fit well,
    // the pooled line cannot
    val broken = series(Seq(1, 2, 1, 2, 1, 2, 50, 51, 50, 51, 50, 51))
    val r = Stats.chowTest(broken, "ts", "event_type", "view").collect()(0)
    assert(r.getLong(0) == 12L && r.getLong(1) == 6L)
    val (rp, r1, r2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(rp > r1 + r2 && r1 > 0 && r2 > 0)
    assert(r.getDouble(5) > 100.0, s"f=${r.getDouble(5)}")
    // two perfect linear pieces -> RSS1 = RSS2 = 0 -> F undefined
    val perfect = series(Seq(1, 2, 3, 4, 5, 6, 60, 50, 40, 30, 20, 10))
    val p = Stats.chowTest(perfect, "ts", "event_type", "view").collect()(0)
    assert(p.isNullAt(5), s"perfect fit must null F: $p")
  }

  test("varianceRatio: period-q mean reversion gives VR = 0 exactly") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // y alternates 1,2: d = +-1 (var 1), y_t - y_{t-4} = 0 always
    val rows = (0 until 9).flatMap { i =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until (1 + i % 2)).map(_ => (t, "click"))
    }
    val r = Stats.varianceRatio(rows.toDF("ts", "event_type"), "ts",
      "event_type", "click", q = 4).collect()(0)
    assert(r.getLong(0) == 9L && r.getInt(1) == 4)
    assert(r.getDouble(2) == 0.0)           // mu: sum d telescopes to 0
    assert(r.getDouble(3) == 1.0)           // var_1
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0) // var_q, vr
  }

  test("cooksDistance: the off-line outlier dominates the influence ranking") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 3.0, 3.0),
      (4L, 4.0, 4.0), (5L, 5.0, 100.0)).toDF("id", "xx", "yy")
    val rows = Stats.cooksDistance(df, "xx", "yy", Seq("id"), topK = 5)
      .collect()
    assert(rows(0).getLong(0) == 5L, s"outlier first: ${rows.toSeq}")
    assert(rows(0).getDouble(5) > rows(1).getDouble(5)) // cooks_d
    // leverage of the end points is large (1/n + 4/10)
    assert(rows(0).getDouble(4) > 0.4)
  }

  test("spectralEntropy: a pure k=2 cosine concentrates the spectrum " +
       "(H ~ 0); a constant series has zero power -> null H") {
    import spark.implicits._
    val n = 16
    val cosine = (0 until n)
      .map(t => (t, math.cos(2 * math.Pi * 2 * t / n) * 100.0))
      .toDF("t", "x")
    val r = Stats.spectralEntropy(cosine, Seq("t"), "x", maxK = 8)
      .collect()(0)
    assert(r.getLong(0) == 16L && r.getInt(1) == 8)
    assert(r.getDouble(2) > 0.0)
    assert(r.getDouble(3) < 0.01, s"H=${r.getDouble(3)}")
    assert(r.getDouble(4) < 0.01)
    val flat = (0 until n).map(t => (t, 5.0)).toDF("t", "x")
    val f = Stats.spectralEntropy(flat, Seq("t"), "x", maxK = 8)
      .collect()(0)
    assert(f.getDouble(2) == 0.0 && f.isNullAt(3) && f.isNullAt(4))
  }

  test("adamicAdar: path graph 1-2-3 predicts (1,3) via the shared " +
       "degree-2 neighbor; existing edges are excluded") {
    import spark.implicits._
    // square 1-2-3-4-1 plus chord-free diagonal candidates: (1,3) and
    // (2,4) share TWO degree-2 neighbors each -> score = 2/ln 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("s", "d")
    val rows = Graph.adamicAdar(edges, "s", "d").collect()
    assert(rows.length == 2)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 4L)))
    val expect = math.floor(1.0 / math.log(2.0) * 1e9) * 2 / 1e9
    rows.foreach { r =>
      assert(r.getLong(2) == 2L)                 // common
      assert(r.getDouble(5) == expect, s"score=${r.getDouble(5)}")
    }
  }

  test("decisionStump: a perfectly separable feature splits at the " +
       "boundary with gini_split = 0") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toDouble, i > 6)).toDF("f", "y")
    val r = Ml.decisionStump(df, "f", col("y")).collect()(0)
    assert(r.getDouble(0) == 6.0, s"threshold=${r.getDouble(0)}")
    assert(r.getLong(1) == 10L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 6L && r.getLong(4) == 0L) // pure left
    assert(r.getDouble(9) == 0.0)                    // gini_split
    assert(r.getDouble(10) > 0.4)                    // gain vs root 0.48
  }

  test("decisionStump: constant feature -> no valid split -> empty frame") {
    import spark.implicits._
    val df = Seq((1.0, true), (1.0, false)).toDF("f", "y")
    assert(Ml.decisionStump(df, "f", col("y")).collect().isEmpty)
  }

  test("jsDivergence: identical distributions -> 0; disjoint vocab -> ln 2") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s2"),   // identical
      (3L, "x x y", "s3")                           // disjoint from both
    ).toDF("doc_id", "text", "source")
    val rows = TextStats.jsDivergence(df, "text", "source")
      .orderBy(col("source_a"), col("source_b")).collect()
    assert(rows.length == 3)
    val m = rows.map(r => ((r.getString(0), r.getString(1)),
      r.getDouble(2))).toMap
    assert(math.abs(m(("s1", "s2"))) < 1e-8)
    assert(math.abs(m(("s1", "s3")) - math.log(2)) < 1e-8)
    assert(math.abs(m(("s2", "s3")) - math.log(2)) < 1e-8)
    // normalized form is bounded at 1
    assert(rows.forall(r => r.getDouble(3) <= 1.0 + 1e-12))
  }

  test("personalizedPageRank: path 1->2->3 from seed 1 replays the " +
       "integer rounds exactly; non-graph seeds are ignored") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    // seed {1}: r0 = (1e12, 0, 0); base = 1.5e11 (seed only)
    // round 1: r = (1.5e11, 8.5e11, 0)
    // round 2: r(2) = 85*1.5e11 div 100 = 1.275e11,
    //          r(3) = 85*8.5e11 div 100 = 7.225e11
    val seeds = Seq(1L, 99L).toDF("seed") // 99 is not a node -> ignored
    val r = Graph.personalizedPageRank(edges, "s", "d", seeds, "seed",
      iters = 2).orderBy(col("id")).collect()
    assert(r.map(_.getLong(1)).toSeq ==
      Seq(150000000000L, 127500000000L, 722500000000L), r.toSeq.toString)
  }

  test("turningPointTest: alternating series turns at every interior " +
       "hour; monotone series never turns") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def series(ys: Seq[Int]) = ys.zipWithIndex.flatMap { case (y, i) =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until y).map(_ => (t, "view"))
    }.toDF("ts", "event_type")
    val alt = Stats.turningPointTest(series((0 until 12)
      .map(i => 1 + i % 2)), "ts", "event_type", "view").collect()(0)
    assert(alt.getLong(0) == 12L && alt.getLong(1) == 10L)
    assert(alt.getDouble(3) > 2.0) // far more jagged than random
    val mono = Stats.turningPointTest(series((1 to 12)), "ts",
      "event_type", "view").collect()(0)
    assert(mono.getLong(1) == 0L && mono.getDouble(3) < -2.0)
  }

  test("sampleEntropy: constant series matches every template pair " +
       "(sampen = 0 exactly); huge jumps beyond tolerance -> null") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def series(ys: Seq[Int]) = ys.zipWithIndex.flatMap { case (y, i) =>
      val t = new java.sql.Timestamp(ts0.getTime + i * 3600L * 1000L)
      (0 until y).map(_ => (t, "purchase"))
    }.toDF("ts", "event_type")
    val const = Stats.sampleEntropy(series(Seq.fill(10)(5)), "ts",
      "event_type", "purchase", rTol = 2L).collect()(0)
    // 8 templates -> 28 pairs, all match at both lengths
    assert(const.getLong(2) == 28L && const.getLong(3) == 28L)
    assert(const.getDouble(4) == 0.0)
    val wild = Stats.sampleEntropy(
      series((0 until 10).map(i => 1 + (i % 3) * 10)), "ts",
      "event_type", "purchase", rTol = 2L).collect()(0)
    assert(wild.getLong(2) > 0L) // period-3 templates still m-match
    assert(wild.getLong(3) > 0L)
  }

  test("oddsRatio: hand 2x2 gives OR = 8, RR = 10/3; zero cell nulls " +
       "estimates but emits counts") {
    import spark.implicits._
    def rows(a: Int, b: Int, c: Int, d: Int) =
      (Seq.fill(a)((true, true)) ++ Seq.fill(b)((true, false)) ++
        Seq.fill(c)((false, true)) ++ Seq.fill(d)((false, false)))
        .toDF("e", "o")
    val r = Stats.oddsRatio(rows(10, 5, 2, 8), col("e"), col("o"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 5L, 2L, 8L)))
    assert(r.getDouble(4) == 8.0)
    assert(math.abs(r.getDouble(7) - 10.0 / 3.0) < 1e-12)
    assert(r.getDouble(5) < 8.0 && r.getDouble(6) > 8.0) // CI brackets
    val z = Stats.oddsRatio(rows(3, 0, 2, 5), col("e"), col("o"))
      .collect()(0)
    assert(z.getLong(1) == 0L && z.isNullAt(4) && z.isNullAt(7))
  }

  test("kTruss: K4 survives k = 4, a pendant triangle is peeled") {
    import spark.implicits._
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val pendant = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val edges = (k4 ++ pendant).toDF("s", "d")
    val out = Graph.kTruss(edges, "s", "d", k = 4, rounds = 3)
      .orderBy(col("a"), col("b")).collect()
    assert(out.length == 6, out.toSeq.toString) // exactly the K4 edges
    assert(out.forall(r => r.getLong(0) <= 4L && r.getLong(1) <= 4L))
    assert(out.forall(_.getLong(2) == 2L))      // each in 2 triangles
  }

  test("moodMedianTest: fully separated groups give chi2 = n; the " +
       "grand median is the lower median") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0),
      ("b", 3.0), ("b", 4.0), ("b", 4.0)).toDF("g", "v")
    val r = Stats.moodMedianTest(df, "v", "g").collect()(0)
    assert(r.getDouble(0) == 2.0)  // lower median of 1,1,2,3,4,4
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L && r.getLong(3) == 1L)
    // complete separation: chi2 = n = 6 (up to the 1e-6 floor grid)
    assert(math.abs(r.getDouble(4) - 6.0) < 1e-5, s"chi2=${r.getDouble(4)}")
  }

  test("grubbs: hand case (0, 0, 10) gives G = 2/sqrt(3); the far " +
       "side is the suspect") {
    import spark.implicits._
    val r = Stats.grubbs(Seq(0.0, 0.0, 10.0).toDF("v"), "v").collect()(0)
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(3) - 2.0 / math.sqrt(3.0)) < 1e-9,
      s"g=${r.getDouble(3)}")
    assert(r.getDouble(4) == 10.0)
    // low-side outlier flips the suspect
    val lo = Stats.grubbs(Seq(10.0, 10.0, 0.0).toDF("v"), "v")
      .collect()(0)
    assert(lo.getDouble(4) == 0.0)
  }

  test("andersonDarling2: two singletons give A2 = 0.5 exactly; " +
       "disjoint samples dominate interleaved ones") {
    import spark.implicits._
    val tiny = Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v")
    val r = Stats.andersonDarling2(tiny, "v", "g", "a", "b").collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.5, s"a2=${r.getDouble(2)}")
    val inter = (1 to 20).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toDouble)).toDF("g", "v")
    val disj = (1 to 20).map(i =>
      (if (i <= 10) "a" else "b", i.toDouble)).toDF("g", "v")
    val ai = Stats.andersonDarling2(inter, "v", "g", "a", "b")
      .collect()(0).getDouble(2)
    val ad = Stats.andersonDarling2(disj, "v", "g", "a", "b")
      .collect()(0).getDouble(2)
    assert(ad > 5 * ai, s"disjoint=$ad interleaved=$ai")
  }

  test("jonckheereTerpstra: fully ordered groups give J = 12, " +
       "z = 6/sqrt(456/72) on the 2+2+2 hand case") {
    import spark.implicits._
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 3.0), ("g2", 4.0),
      ("g3", 5.0), ("g3", 6.0)).toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, "v", "g").collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 12.0)
    assert(math.abs(r.getDouble(3) - 6.0 / math.sqrt(456.0 / 72.0))
      < 1e-12, s"z=${r.getDouble(3)}")
    // ties contribute one half each: identical groups -> J = n1*n2/2
    val tied = Seq(("g1", 5.0), ("g1", 5.0), ("g2", 5.0), ("g2", 5.0))
      .toDF("g", "v")
    val tr = Stats.jonckheereTerpstra(tied, "v", "g").collect()(0)
    assert(tr.getDouble(2) == 2.0, s"j=${tr.getDouble(2)}")
  }

  test("averagePrecision: perfect ranking gives AP = 1; a tied " +
       "pos/neg threshold gives 0.5") {
    import spark.implicits._
    val perfect = Seq((3.0, true), (2.0, true), (1.0, false))
      .toDF("s", "y")
    val r = Stats.averagePrecision(perfect, "s", col("y")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0)
    val tied = Seq((1.0, true), (1.0, false)).toDF("s", "y")
    val tr = Stats.averagePrecision(tied, "s", col("y")).collect()(0)
    assert(tr.getDouble(2) == 0.5)
    val inverted = Seq((3.0, false), (2.0, true)).toDF("s", "y")
    val ir = Stats.averagePrecision(inverted, "s", col("y")).collect()(0)
    assert(ir.getDouble(2) == 0.5) // pos found at rank 2: P = 1/2
  }

  test("seasonalStrength: a pure period-7 pattern is fully seasonal; " +
       "a pure linear trend is fully trend") {
    import graft.ops.Advanced
    import spark.implicits._
    val pattern = (0 until 70).map(i =>
      ("k", i, Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0)(i % 7)))
      .toDF("k", "t", "x")
    val s = Advanced.seasonalStrength(pattern, Seq("k"), Seq("t"), "x", 7)
      .collect()(0)
    assert(s.getDouble(2) > 0.999, s"seasonal=${s.getDouble(2)}")
    // trend+resid is constant up to the 1e-6 floor grid: the reference
    // variance is either exactly 0 (null) or grid dust (strength ~ 0)
    assert(s.isNullAt(3) || s.getDouble(3) < 0.05, s"t=${s.get(3)}")
    val trend = (0 until 70).map(i => ("k", i, i.toDouble))
      .toDF("k", "t", "x")
    val tRow = Advanced.seasonalStrength(trend, Seq("k"), Seq("t"), "x", 7)
      .collect()(0)
    assert(tRow.isNullAt(2) || tRow.getDouble(2) < 0.05,
      s"s=${tRow.get(2)}")
    assert(tRow.getDouble(3) > 0.999, s"trend=${tRow.getDouble(3)}")
  }

  test("bipartiteProjection: shared-customer weights + cosine on a " +
       "hand two-mode graph") {
    import spark.implicits._
    val e = Seq((1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L),
      (3L, 102L), (3L, 103L)).toDF("cust", "supp")
    val rows = Graph.bipartiteProjection(e, "cust", "supp", topK = 10)
      .collect()
    assert(rows.length == 2)
    val top = rows(0)
    assert(top.getLong(0) == 101L && top.getLong(1) == 102L &&
      top.getLong(2) == 2L)
    assert(math.abs(top.getDouble(5) - 2.0 / math.sqrt(6.0)) < 1e-12)
    val snd = rows(1)
    assert(snd.getLong(0) == 102L && snd.getLong(1) == 103L &&
      snd.getLong(2) == 1L)
  }

  test("scriptProfile: latin, cjk, cyrillic and digit-only docs get " +
       "the right counts and labels") {
    import graft.llm.TextStats
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"),
      (2L, "你好世界"),            // CJK
      (3L, "привет"), // Cyrillic
      (4L, "123 456")).toDF("doc_id", "text")
    val m = TextStats.scriptProfile(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getInt(2) == 10 && m(1L).getString(8) == "latin")
    assert(m(2L).getInt(4) == 4 && m(2L).getString(8) == "cjk")
    assert(m(3L).getInt(5) == 6 && m(3L).getString(8) == "cyrillic")
    assert(m(4L).getInt(3) == 6 && m(4L).getString(8) == "none")
    assert(m(1L).getInt(6) == 1 && m(1L).getInt(7) == 0) // space/other
  }

  test("minhashCalibration: identical docs calibrate to zero error") {
    import graft.llm.TextDedup
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again"
    val docs = (1L to 3L).map(i => (i, text)).toDF("doc_id", "text")
    val r = TextDedup.minhashCalibration(docs, "doc_id", "text")
      .collect()(0)
    assert(r.getLong(0) == 3L, s"pairs=${r.getLong(0)}")
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 &&
      r.getDouble(3) == 0.0)
  }

  test("neymanAllocation: volatile strata get the budget, constant " +
       "strata get zero") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 0.0), ("b", 10.0),
      ("c", 0.0), ("c", 2.0)).toDF("g", "v")
    val m = Ml.neymanAllocation(df, "v", "g", budget = 1000L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("a").getDouble(2) == 0.0 && m("a").getLong(4) == 0L)
    // w_b : w_c = sqrt(50) : sqrt(2) = 5 : 1
    assert(math.abs(m("b").getDouble(3) - 5.0 / 6.0) < 1e-5)
    assert(m("b").getLong(4) == 833L && m("c").getLong(4) == 166L)
  }

  test("yuleK: hand corpus 'a a a b' gives K = 3750 exactly") {
    import spark.implicits._
    val df = Seq((1L, "a a a b", "en"), (2L, "x y", "fr"))
      .toDF("doc_id", "text", "lang")
    val rows = TextStats.yuleK(df, "text", "lang")
      .orderBy(col("group")).collect()
    val en = rows(0)
    // en: c = {a:3, b:1}, N = 4, sum c^2 = 10, K = 1e4*(10-4)/16 = 3750
    assert(en.getString(0) == "en" && en.getLong(1) == 4L &&
      en.getLong(2) == 2L && en.getLong(3) == 10L)
    assert(en.getDouble(4) == 3750.0)
    val fr = rows(1)
    // fr: all hapax -> K = 1e4*(2-2)/4 = 0
    assert(fr.getDouble(4) == 0.0)
  }
}
