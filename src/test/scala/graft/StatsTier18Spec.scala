package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Semantic pins for the round-17 second-wave stats tier (q361–q364). */
class StatsTier18Spec extends SparkSuite {
  init()

  test("jarqueBera: near-normal sample scores far below a skewed one") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // CLT-normal: mean of 12 uniforms; skewed: squared uniform
    val rows = (1 to 4000).map { i =>
      ("norm", (1 to 12).map(_ => rnd.nextDouble()).sum - 6.0)
    } ++ (1 to 4000).map { i =>
      val u = rnd.nextDouble(); ("skew", u * u * 10.0)
    }
    val out = Stats.jarqueBera(rows.toDF("g", "v"), "v", "g")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("norm") < 20.0, s"normal JB should be small: ${out("norm")}")
    assert(out("skew") > 200.0, s"skewed JB should be large: ${out("skew")}")
  }

  test("jarqueBera: constant group reports null moments") {
    import spark.implicits._
    val out = Stats.jarqueBera(
      Seq(("c", 1.0), ("c", 1.0), ("c", 1.0)).toDF("g", "v"), "v", "g")
      .collect()
    assert(out.length == 1 && out(0).isNullAt(2) && out(0).isNullAt(4))
  }

  test("tukeyHsd: separated groups get a larger q than overlapping ones") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def grp(name: String, mu: Double) =
      (1 to 500).map(_ => (name, mu + rnd.nextDouble() - 0.5))
    val df = (grp("a", 0.0) ++ grp("b", 0.05) ++ grp("c", 5.0)).toDF("g", "v")
    val out = Stats.tukeyHsd(df, "v", "g").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(out.size == 3)
    assert(out(("a", "c")) > out(("a", "b")))
    assert(out(("b", "c")) > 10.0)
    assert(out(("a", "b")) < 10.0)
  }

  test("pageHinkley: stationary series stays quiet, shifted series alarms") {
    import spark.implicits._
    def series(shiftAt: Int, shift: Double) = (0 until 400).map { i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 00:00:00").toInstant
        .plusSeconds(i * 3600L),
        10.0 + (i % 7) * 0.01 + (if (i >= shiftAt) shift else 0.0))
    }.map { case (t, v) => (java.sql.Timestamp.from(t), v) }
    val quiet = Stats.pageHinkley(series(9999, 0.0).toDF("ts", "v"),
      "ts", "v", delta = 0.05, lambda = 3.0).collect()(0)
    assert(!quiet.getBoolean(2), s"stationary series alarmed: $quiet")
    val drift = Stats.pageHinkley(series(200, 2.0).toDF("ts", "v"),
      "ts", "v", delta = 0.05, lambda = 3.0).collect()(0)
    assert(drift.getBoolean(2), s"shifted series should alarm: $drift")
    // the alarm fires AFTER the shift point
    assert(drift.getTimestamp(3).toInstant.isAfter(
      series(200, 2.0)(199)._1.toInstant))
  }

  test("grangerLag1: x that drives y yields a larger F than independent x") {
    import spark.implicits._
    // hourly events where click count at hour t tracks view count at t-1
    val rnd = new scala.util.Random(3)
    val rows = scala.collection.mutable.ArrayBuffer[(java.sql.Timestamp, String)]()
    var prevViews = 5
    (0 until 300).foreach { h =>
      val ts = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(h * 3600L))
      val views = 3 + rnd.nextInt(10)
      val clicks = prevViews + rnd.nextInt(2) // driven by last hour's views
      (1 to views).foreach(_ => rows += ((ts, "view")))
      (1 to clicks).foreach(_ => rows += ((ts, "click")))
      prevViews = views
    }
    val df = rows.toSeq.toDF("ts", "event_type")
    val f = Stats.grangerLag1(df, "ts", "event_type", "click", "view")
      .collect()(0).getDouble(3)
    assert(f > 50.0, s"driven series should show strong Granger F: $f")
    // independence control: clicks ignore views
    val rows2 = rows.map { case (ts, t) => (ts, t) } // same shape
    val indep = scala.collection.mutable.ArrayBuffer[(java.sql.Timestamp, String)]()
    (0 until 300).foreach { h =>
      val ts = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(h * 3600L))
      (1 to (3 + rnd.nextInt(10))).foreach(_ => indep += ((ts, "view")))
      (1 to (3 + rnd.nextInt(10))).foreach(_ => indep += ((ts, "click")))
    }
    val f2 = Stats.grangerLag1(indep.toSeq.toDF("ts", "event_type"),
      "ts", "event_type", "click", "view").collect()(0).getDouble(3)
    assert(f2 < f / 5.0, s"independent series F ($f2) should be far below $f")
  }

  test("ssspWeighted: relaxation beats the direct edge; rounds cap respected") {
    import spark.implicits._
    // 1→2 (10), 2→3 (10), 1→3 (50): two-hop path is cheaper
    val e = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 50L))
      .toDF("src", "dst", "w")
    val two = graft.ops.Graph.ssspWeighted(e, "src", "dst", "w", Seq(1L), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 0L, 2L -> 10L, 3L -> 20L))
    val one = graft.ops.Graph.ssspWeighted(e, "src", "dst", "w", Seq(1L), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(3L) == 50L, "one round must only use direct edges")
    // parallel edges collapse to their min weight
    val par = graft.ops.Graph.ssspWeighted(
      e.unionAll(Seq((1L, 2L, 3L)).toDF("src", "dst", "w")),
      "src", "dst", "w", Seq(1L), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(par(2L) == 3L && par(3L) == 13L)
  }

  test("bradleyTerry: dominant item ranks highest; strengths sum to 1") {
    import spark.implicits._
    val cmp = (Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) ++
      Seq.fill(5)(("a", "c"))).toDF("w", "l")
    val out = Stats.bradleyTerry(cmp, "w", "l", iters = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("a") > out("b") && out("b") > out("c"),
      s"expected a > b > c strengths: $out")
    assert(math.abs(out.values.sum - 1.0) < 1e-6)
  }

  test("logisticSimpleByGroup: recovers the direction of a sigmoid label") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 6000).map { _ =>
      val x = rnd.nextDouble() * 10.0 - 5.0
      val p = 1.0 / (1.0 + math.exp(-(-1.0 + 0.8 * x)))
      ("g", x, if (rnd.nextDouble() < p) 1.0 else 0.0)
    }
    val out = graft.ops.Ml.logisticSimpleByGroup(
      rows.toDF("g", "x", "y"), "g", "x", "y", iters = 6).collect()(0)
    val (b0, b1) = (out.getDouble(3), out.getDouble(4))
    assert(b1 > 0.5 && b1 < 1.2, s"slope should approach 0.8: $b1")
    assert(b0 > -1.6 && b0 < -0.4, s"intercept should approach -1: $b0")
  }

  test("dtw kernel: zero on identical series, elastic on phase shifts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.VecKernels.register(spark)
    val df = Seq((
      Array(0.0, 1.0, 2.0, 1.0, 0.0),
      Array(0.0, 1.0, 2.0, 1.0, 0.0),
      Array(1.0, 2.0, 1.0, 0.0, 0.0), // same shape, one step early
      Array(2.0, 2.0, 2.0, 2.0, 2.0)  // different shape
    )).toDF("a", "same", "shifted", "flat")
    val r = df.select(
      call_function("graft_dtw", col("a"), col("same")).as("d0"),
      call_function("graft_dtw", col("a"), col("shifted")).as("d1"),
      call_function("graft_dtw", col("a"), col("flat")).as("d2")).head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) < r.getDouble(2),
      s"phase shift should be closer than shape change: $r")
    // hand-checked DP for the shifted pair: alignment absorbs the shift
    assert(r.getDouble(1) <= 2.0, s"shifted distance too large: $r")
  }

  test("dtwHourlyProfile: flat-profile user scores below an inverted one") {
    import spark.implicits._
    // corpus dominated by a day-shape; user 1 follows it, user 2 inverts it
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val rows =
      (0 until 24).flatMap(h => Seq((10L, ts(h), (h % 12).toDouble),
        (11L, ts(h), (h % 12).toDouble))) ++
      (0 until 24).map(h => (1L, ts(h), (h % 12).toDouble)) ++
      (0 until 24).map(h => (2L, ts(h), ((23 - h) % 12).toDouble))
    val out = Stats.dtwHourlyProfile(rows.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(2L), s"conforming user must score lower: $out")
  }

  test("wasserstein1: zero on identical samples, exact on a known shift") {
    import spark.implicits._
    val base = (1 to 500).map(i => i.toDouble / 10.0)
    val same = (base.map(("a", _)) ++ base.map(("b", _))).toDF("g", "v")
    val r0 = Stats.wasserstein1(same, "v", "g", "a", "b").head()
    assert(r0.getDouble(2) == 0.0, s"identical samples must give 0: $r0")
    // b = a + 7.5 exactly → W1 = 7.5 (mass moved 7.5 units)
    val shifted = (base.map(("a", _)) ++ base.map(x => ("b", x + 7.5)))
      .toDF("g", "v")
    val r1 = Stats.wasserstein1(shifted, "v", "g", "a", "b").head()
    assert(math.abs(r1.getDouble(2) - 7.5) < 1e-6, s"shift of 7.5: $r1")
  }

  test("energyDistance: zero on identical samples, positive under any difference") {
    import spark.implicits._
    val base = (1 to 400).map(i => i.toDouble / 10.0)
    val same = (base.map(("a", _)) ++ base.map(("b", _))).toDF("g", "v")
    val r0 = Stats.energyDistance(same, "v", "g", "a", "b").head()
    assert(math.abs(r0.getDouble(5)) < 1e-6, s"identical → 0: $r0")
    // same mean, different spread — a pure shape change W1 underweights
    val spread = (base.map(("a", _)) ++
      base.map(x => ("b", 20.05 + (x - 20.05) * 3.0))).toDF("g", "v")
    val r1 = Stats.energyDistance(spread, "v", "g", "a", "b").head()
    assert(r1.getDouble(5) > 1.0, s"spread change must register: $r1")
  }

  test("cliffsDelta: fully separated groups hit ±1, overlapping stay small") {
    import spark.implicits._
    val sep = ((1 to 200).map(i => ("a", 100.0 + i)) ++
      (1 to 300).map(i => ("b", i.toDouble / 10.0))).toDF("g", "v")
    val r = Stats.cliffsDelta(sep, "v", "g", "a", "b").head()
    assert(r.getDouble(2) == 1.0 && r.getString(3) == "large", s"$r")
    val rnd = new scala.util.Random(9)
    val mixed = (1 to 2000).map(_ => ("a", rnd.nextDouble())) ++
      (1 to 2000).map(_ => ("b", rnd.nextDouble()))
    val r2 = Stats.cliffsDelta(mixed.toDF("g", "v"), "v", "g", "a", "b").head()
    assert(math.abs(r2.getDouble(2)) < 0.1 && r2.getString(3) == "negligible",
      s"$r2")
  }

  test("incrementalMinhashDedup: copies flag against the old corpus, fresh docs don't") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val old = Seq((1L, base), (2L, "completely different text about spark " +
      "distributed query engines and their optimizers at large scale"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, base), // exact copy of doc 1
      (11L, "fresh unseen content with words that never appeared before " +
        "in any earlier snapshot of this corpus")).toDF("doc_id", "text")
    val out = graft.llm.TextDedup.incrementalMinhashDedup(old, batch,
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(10L)._1 && out(10L)._2 == 1L, s"copy must flag to doc 1: $out")
    assert(!out(11L)._1, s"fresh doc must not flag: $out")
  }
}
