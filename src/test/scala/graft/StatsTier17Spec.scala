package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Stats}

/** Closed-form checks for the round-17 association/agreement tier
  * (q323–q332): tiny inputs whose statistics are known analytically. */
class StatsTier17Spec extends SparkSuite {
  init()
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect(); assert(r.length == 1); r.head
  }

  test("theilU: a bijective pair has U = 1 in both directions") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3), ("a", 1), ("b", 2))
      .toDF("x", "y")
    val r = one(Stats.theilU(df, "x", "y"))
    assert(math.abs(r.getDouble(r.fieldIndex("u_a_given_b")) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("u_b_given_a")) - 1.0) < 1e-9)
  }

  test("gTest: independent uniform 2x2 has G = 0; dof is (ka-1)(kb-1)") {
    val df = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("x", "y")
    val r = one(Stats.gTest(df, "x", "y"))
    assert(r.getLong(r.fieldIndex("dof")) == 1L)
    assert(math.abs(r.getDouble(r.fieldIndex("g_stat"))) < 1e-6)
  }

  test("ordinalAssociation: strictly concordant data pins gamma/somers/tau") {
    val df = (1 to 10).map(i => (i, i * 2)).toDF("x", "y")
    val r = one(Stats.ordinalAssociation(df, "x", "y"))
    assert(r.getLong(r.fieldIndex("conc")) == 45L)
    assert(r.getLong(r.fieldIndex("disc")) == 0L)
    assert(r.getDouble(r.fieldIndex("gamma")) == 1.0)
    assert(r.getDouble(r.fieldIndex("somers_d_yx")) == 1.0)
    assert(r.getDouble(r.fieldIndex("tau_a")) == 1.0)
    assert(r.getDouble(r.fieldIndex("tau_b")) == 1.0)
  }

  test("ordinalAssociation: hand-counted ties (textbook 2x2 cells)") {
    // x: 0,0,1,1  y: 0,1,0,1 → each cell once: C=1 (00<11), D=1 (01>10),
    // tie_x=2, tie_y=2, n0=6
    val df = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("x", "y")
    val r = one(Stats.ordinalAssociation(df, "x", "y"))
    assert(r.getLong(r.fieldIndex("n0")) == 6L)
    assert(r.getLong(r.fieldIndex("conc")) == 1L)
    assert(r.getLong(r.fieldIndex("disc")) == 1L)
    assert(r.getLong(r.fieldIndex("tie_x")) == 2L)
    assert(r.getLong(r.fieldIndex("tie_y")) == 2L)
    assert(r.getDouble(r.fieldIndex("gamma")) == 0.0)
  }

  test("ordinalAssociation: refuses continuous (too many cells)") {
    val df = (1 to 100).map(i => (i * 1.0001, i * 2.0003)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      Stats.ordinalAssociation(df, "x", "y", maxCells = 50)
    }
    assert(e.getMessage.contains("maxCells"))
  }

  test("pointBiserial: equal groups two values apart, known closed form") {
    // class 1 = {2,2}, class 0 = {0,0}: m1−m0 = 2, σ_n = 1,
    // sqrt(n1·n0/n²) = 1/2 → r = 1
    val df = Seq((2.0, true), (2.0, true), (0.0, false), (0.0, false))
      .toDF("v", "b")
    val r = one(Stats.pointBiserial(df, "v", col("b")))
    assert(r.getDouble(r.fieldIndex("r_pb")) == 1.0)
  }

  test("durbinWatson: an alternating series approaches DW = 4") {
    val vals = (0 until 20).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("k", "t", "v")
    val r = one(Stats.durbinWatson(df, Seq("k"), Seq("t"), "v"))
    val dw = r.getDouble(r.fieldIndex("dw"))
    // Σd² = 19·4, Σe² = 20 → 76/20 = 3.8
    assert(math.abs(dw - 3.8) < 1e-6)
  }

  test("cochranQ: textbook 3-treatment example") {
    // 4 items × 3 treatments; successes: item1 (1,1,0), item2 (1,1,1),
    // item3 (0,1,0), item4 (1,0,0) → C = (3,3,1), R = (2,3,1,1), N = 7
    // Q = 3·2·(3·19 − 49)/(3·7 − 15) = 6·8/6 = 8
    val rows = Seq(
      (1, "t1", 1), (1, "t2", 1), (1, "t3", 0),
      (2, "t1", 1), (2, "t2", 1), (2, "t3", 1),
      (3, "t1", 0), (3, "t2", 1), (3, "t3", 0),
      (4, "t1", 1), (4, "t2", 0), (4, "t3", 0))
    val df = rows.toDF("item", "treat", "s")
    val r = one(Stats.cochranQ(df, "item", "treat", col("s") === 1))
    assert(r.getLong(r.fieldIndex("k")) == 3L)
    assert(r.getLong(r.fieldIndex("n_items")) == 4L)
    assert(r.getDouble(r.fieldIndex("q_stat")) == 8.0)
  }

  test("cochranQ: incomplete items are dropped and counted") {
    val rows = Seq((1, "t1", 1), (1, "t2", 0), (2, "t1", 1))
    val r = one(Stats.cochranQ(rows.toDF("item", "treat", "s"),
      "item", "treat", col("s") === 1))
    assert(r.getLong(r.fieldIndex("n_items")) == 1L)
    assert(r.getLong(r.fieldIndex("n_dropped")) == 1L)
  }

  test("kendallW: perfectly agreeing raters give W = 1") {
    val rows = for (rater <- Seq("r1", "r2", "r3"); item <- 1 to 5)
      yield (item, rater, item * 10.0)
    val r = one(Stats.kendallW(rows.toDF("item", "rater", "v"),
      "item", "rater", "v"))
    assert(r.getLong(r.fieldIndex("m")) == 3L)
    assert(r.getLong(r.fieldIndex("n_items")) == 5L)
    assert(r.getDouble(r.fieldIndex("w")) == 1.0)
  }

  test("krippendorff: perfect nominal agreement gives alpha = 1") {
    val rows = for (rater <- Seq("r1", "r2", "r3"); item <- 1 to 4)
      yield (item, rater, s"cat${item % 2}")
    val r = one(Stats.krippendorffAlpha(rows.toDF("item", "rater", "c"),
      "item", "rater", "c"))
    assert(r.getDouble(r.fieldIndex("d_o")) == 0.0)
    assert(r.getDouble(r.fieldIndex("alpha")) == 1.0)
  }

  test("krippendorff: items with a single rating are excluded") {
    val rows = Seq((1, "r1", "a"), (1, "r2", "a"), (2, "r1", "b"))
    val r = one(Stats.krippendorffAlpha(rows.toDF("item", "rater", "c"),
      "item", "rater", "c"))
    assert(r.getLong(r.fieldIndex("n_items")) == 1L)
    assert(r.getLong(r.fieldIndex("n_ratings")) == 2L)
  }

  test("fisherExact: lady-tasting-tea 2x2 (3,1,1,3) → p ≈ 0.48571") {
    // 8 rows: flag pairs with counts a=3, b=1, c=1, d=3
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(3)((false, false))
    val r = one(Stats.fisherExact(rows.toDF("x", "y"), col("x"), col("y")))
    assert(r.getLong(r.fieldIndex("a")) == 3L)
    assert(r.getLong(r.fieldIndex("k_min")) == 0L)
    assert(r.getLong(r.fieldIndex("k_max")) == 4L)
    // exact two-sided p = 1 − 2·C(4,0)C(4,4)/C(8,4) ... = 34/70 ≈ 0.485714
    val p = r.getDouble(r.fieldIndex("p_two"))
    assert(math.abs(p - 34.0 / 70.0) < 1e-4, s"p_two=$p")
  }

  test("hits: star graph — the center is the only authority") {
    // spokes 1,2,3 → center 10: spokes are equal hubs, center sole auth
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("s", "d")
    val r = Graph.hits(e, "s", "d", iters = 2).orderBy("id").collect()
    val byId = r.map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(byId(10L) == (0L, Graph.Scale))        // pure authority
    assert(byId(1L) == (Graph.Scale, 0L))         // equal pure hubs
    assert(byId(2L) == (Graph.Scale, 0L))
  }

  test("hits: empty edge set returns an empty frame, not an NPE") {
    // r18 regression: the degree-maxima readout is max() over zero
    // groups → a 1-row NULL, which getLong NPE'd on
    val e = Seq.empty[(Long, Long)].toDF("s", "d")
    val r = Graph.hits(e, "s", "d", iters = 2)
    assert(r.columns.toSeq == Seq("id", "hub", "auth"))
    assert(r.count() == 0L)
    // all-null edges filter down to the same degenerate input
    val nulls = Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
      .toDF("s", "d")
    assert(Graph.hits(nulls, "s", "d").count() == 0L)
  }

  test("hits: hub mass follows out-degree onto shared authorities") {
    // a→{x,y}, b→{x}: a sees both authorities → bigger hub than b
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("s", "d")
    val r = Graph.hits(e, "s", "d", iters = 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L)._1 == Graph.Scale)     // max hub renormalizes to Scale
    assert(r(2L)._1 < Graph.Scale)
    assert(r(10L)._2 == Graph.Scale)    // x has both hubs pointing at it
    assert(r(11L)._2 < Graph.Scale)
  }

  test("pacf: AR(1) data — pacf1 = r1, higher orders follow Durbin-Levinson") {
    // x_t = 0.5 x_{t-1} + deterministic wiggle: lag-1 dominance
    val xs = Iterator.iterate(1.0)(x => 0.5 * x + 0.1).take(40).toSeq
      .zipWithIndex.map { case (v, i) => ("k", i, v + (i % 3) * 0.05) }
    val r = one(Stats.pacf(xs.toDF("g", "t", "v"), Seq("g"), Seq("t"), "v"))
    val (r1, r2, r3) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(r.getDouble(r.fieldIndex("pacf1")) == r1)
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(math.abs(r.getDouble(r.fieldIndex("pacf2")) - p22) < 1e-12)
    val p21 = r1 - p22 * r1
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    assert(math.abs(r.getDouble(r.fieldIndex("pacf3")) - p33) < 1e-12)
  }

  test("fdAudit: violating and holding pairs are told apart with counts") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2), ("b", 3)).toDF("k", "v")
    val rows = Stats.fdAudit(df, Seq(("k", "v"), ("v", "k")))
      .orderBy("determinant").collect()
    val kv = rows(0)                     // k → v: b maps to {2,3} — violated
    assert(kv.getLong(kv.fieldIndex("n_rows")) == 4L)
    assert(kv.getLong(kv.fieldIndex("n_det_values")) == 2L)
    assert(kv.getLong(kv.fieldIndex("n_violating")) == 1L)
    assert(kv.getLong(kv.fieldIndex("max_dep_per_det")) == 2L)
    assert(!kv.getBoolean(kv.fieldIndex("holds")))
    val vk = rows(1)                     // v → k holds (1→a, 2→b, 3→b)
    assert(vk.getLong(vk.fieldIndex("n_violating")) == 0L)
    assert(vk.getBoolean(vk.fieldIndex("holds")))
  }

  test("keyAudit: nulls excluded from distinct and counted separately") {
    val df = Seq((Some(1), 1), (Some(1), 2), (Some(1), 1), (None, 3))
      .toDF("a", "b")
    val rows = Stats.keyAudit(df, Seq(Seq("a"), Seq("a", "b")))
      .orderBy("candidate").collect()
    val a = rows(0)
    assert(a.getLong(a.fieldIndex("n_null_rows")) == 1L)
    assert(a.getLong(a.fieldIndex("n_distinct")) == 1L)
    assert(a.getLong(a.fieldIndex("n_dup_rows")) == 2L)
    assert(!a.getBoolean(a.fieldIndex("is_key")))
    val ab = rows(1)                     // (1,1) dup once; null row excluded
    assert(ab.getLong(ab.fieldIndex("n_distinct")) == 2L)
    assert(ab.getLong(ab.fieldIndex("n_dup_rows")) == 1L)
    assert(!ab.getBoolean(ab.fieldIndex("is_key")))
  }

  test("archLm: volatility-clustered series scores higher than flat noise") {
    // calm half then turbulent half → squared residuals autocorrelate
    val clustered = (0 until 40).map { i =>
      val e = if (i < 20) 0.1 else 2.0
      ("c", i, e * (if (i % 2 == 0) 1.0 else -1.0))
    }
    // constant-magnitude alternation → z_t is (near-)constant, r2 ~ 0
    val flat = (0 until 40).map(i =>
      ("f", i, if (i % 2 == 0) 1.0 else -1.0))
    val out = Stats.archLm((clustered ++ flat).toDF("g", "t", "v"),
      Seq("g"), Seq("t"), "v").collect()
      .map(r => r.getString(0) -> r).toMap
    val c = out("c")
    assert(c.getLong(c.fieldIndex("n_pairs")) == 39L)
    assert(c.getDouble(c.fieldIndex("r2")) > 0.8)
    assert(c.getDouble(c.fieldIndex("lm")) > 30.0)
    val f = out("f")                     // zero variance in z → r undefined
    assert(f.isNullAt(f.fieldIndex("r2")))
  }

  test("distinctNgramDiversity: repeated corpus collapses distinct counts") {
    val df = Seq("a b c a b c", "a b c").toDF("text")
    val rows = graft.llm.TextStats.distinctNgramDiversity(df, "text")
      .orderBy("n").collect()
    val uni = rows(0)                    // 9 tokens, 3 distinct
    assert(uni.getLong(uni.fieldIndex("total_ngrams")) == 9L)
    assert(uni.getLong(uni.fieldIndex("distinct_ngrams")) == 3L)
    assert(math.abs(uni.getDouble(uni.fieldIndex("distinct_ratio")) - 3.0 / 9.0) < 1e-12)
    val bi = rows(1)                     // 5+2 bigrams, 4 distinct (ab,bc,ca,cb... ab,bc,ca only? ab bc ca ab bc | ab bc)
    assert(bi.getLong(bi.fieldIndex("total_ngrams")) == 7L)
    assert(bi.getLong(bi.fieldIndex("distinct_ngrams")) == 3L)
    val tri = rows(2)                    // docs of 6 and 3 tokens: 4+1 trigrams
    assert(tri.getLong(tri.fieldIndex("total_ngrams")) == 5L)
  }

  test("distinctNgramDiversity: short docs contribute zero n-grams") {
    val df = Seq("one two").toDF("text") // no trigrams from a 2-token doc
    val rows = graft.llm.TextStats.distinctNgramDiversity(df, "text")
      .orderBy("n").collect()
    assert(rows(2).getLong(rows(2).fieldIndex("total_ngrams")) == 0L)
  }

  test("winnowing: shared runs of >= w+k-1 tokens share a fingerprint") {
    // two docs sharing a 9-token run (k=5, w=4 → guarantee at 8 tokens)
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta")).toDF("id", "text")
    val out = graft.llm.TextStats.winnowFingerprints(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    def hashes(fps: String) = fps.split(",").map(_.split(":")(1)).toSet
    assert(hashes(out(1L)).intersect(hashes(out(2L))).nonEmpty)
  }

  test("winnowing: rightmost-min tie-break and short-doc degradation") {
    val df = Seq((1L, "x y z")).toDF("id", "text")  // < k tokens → 1 gram
    val r = one(graft.llm.TextStats.winnowFingerprints(df, "id", "text"))
    assert(r.getLong(r.fieldIndex("n_grams")) == 1L)
    assert(r.getLong(r.fieldIndex("n_fp")) == 1L)
    assert(r.getString(r.fieldIndex("fps")).startsWith("1:"))
  }

  test("markovStationary: two-state chain converges to the exact ratio") {
    // a→b always, b→a always: stationary = (1/2, 1/2)
    val rows = (0 until 20).map(i => ("u", i, if (i % 2 == 0) "a" else "b"))
    val out = Stats.markovStationary(rows.toDF("u", "t", "s"),
        Seq("u"), Seq("t"), "s", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 500000000000L && out("b") == 500000000000L)
  }

  test("markovStationary: absorbing-ish bias shifts mass to the sticky state") {
    // a→a (3x), a→b (1x), b→a (1x): π(a) should dominate
    val seq = "a a a a b a a a a b a a a a b a".split(" ").zipWithIndex
      .map { case (s, i) => ("u", i, s) }.toSeq
    val out = Stats.markovStationary(seq.toDF("u", "t", "s"),
        Seq("u"), Seq("t"), "s", rounds = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") > 3 * out("b"))
  }

  test("hurstRs: a deterministic trend scores H near 1") {
    // strictly increasing series: R grows ~linearly with m → H ≈ 1
    val rows = (0 until 96).map(i => ("u", i, i.toDouble))
    val r = one(Stats.hurstRs(rows.toDF("u", "t", "v"),
      Seq("u"), Seq("t"), "v"))
    assert(r.getLong(r.fieldIndex("n_points")) == 3L)
    val h = r.getDouble(r.fieldIndex("hurst"))
    assert(h > 0.9 && h < 1.1, s"hurst=$h")
  }

  test("hurstRs: an alternating series scores H near 0") {
    val rows = (0 until 96).map(i => ("u", i, if (i % 2 == 0) 1.0 else 0.0))
    val r = one(Stats.hurstRs(rows.toDF("u", "t", "v"),
      Seq("u"), Seq("t"), "v"))
    val h = r.getDouble(r.fieldIndex("hurst"))
    assert(h < 0.2, s"hurst=$h")
  }

  test("damerauLevenshtein: full DL (transposed pair editable again)") {
    import graft.functions.StringSim.damerauLevenshtein
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(damerauLevenshtein(u("CA"), u("ABC")) == 2)   // OSA would say 3
    assert(damerauLevenshtein(u("ab"), u("ba")) == 1)
    assert(damerauLevenshtein(u("abc"), u("ca")) == 2)
    assert(damerauLevenshtein(u("specter"), u("spectre")) == 1)
    assert(damerauLevenshtein(u("a cat"), u("an act")) == 2)
    assert(damerauLevenshtein(u(""), u("abc")) == 3)
    assert(damerauLevenshtein(u("kitten"), u("sitting")) == 3)
    assert(damerauLevenshtein(u("same"), u("same")) == 0)
  }

  test("damerauLevenshtein: registered expression runs inside a plan") {
    graft.functions.StringSim.register(spark)
    val r = Seq(("ab", "ba"), ("kitten", "sitting")).toDF("a", "b")
      .selectExpr("graft_damerau_levenshtein(a, b) AS d")
      .collect().map(_.getInt(0))
    assert(r.toSeq == Seq(1, 3))
  }

  test("heapsLaw: a vocabulary-saturating corpus has beta near 0") {
    // same 5 tokens repeated: V flat after doc 1 → tiny slope
    val df = (1 to 20).map(i => (i.toLong, "a b c d e")).toDF("id", "text")
    val r = one(graft.llm.TextStats.heapsLaw(df, "id", "text"))
    assert(r.getLong(r.fieldIndex("vocab")) == 5L)
    assert(r.getLong(r.fieldIndex("total_tokens")) == 100L)
    assert(math.abs(r.getDouble(r.fieldIndex("beta"))) < 0.1)
  }

  test("heapsLaw: an all-new-types corpus has beta = 1") {
    val df = (1 to 20).map(i =>
      (i.toLong, s"w${i}_1 w${i}_2 w${i}_3")).toDF("id", "text")
    val r = one(graft.llm.TextStats.heapsLaw(df, "id", "text"))
    assert(math.abs(r.getDouble(r.fieldIndex("beta")) - 1.0) < 1e-6)
  }

  test("vocabularyStats: hapax/dis tallies and ratios") {
    val df = Seq("a a a b b c", "d c").toDF("text")
    val r = one(graft.llm.TextStats.vocabularyStats(df, "text"))
    assert(r.getLong(r.fieldIndex("n_tokens")) == 8L)
    assert(r.getLong(r.fieldIndex("vocab")) == 4L)
    assert(r.getLong(r.fieldIndex("hapax")) == 1L)        // d
    assert(r.getLong(r.fieldIndex("dis_legomena")) == 2L) // b, c
    assert(math.abs(r.getDouble(r.fieldIndex("ttr")) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(r.fieldIndex("hapax_ratio")) - 0.25) < 1e-12)
  }

  test("cramerVonMises: identical samples give T near its floor; shifted grow") {
    val same = (1 to 50).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble)))
    val r1 = one(Stats.cramerVonMises(same.toDF("g", "v"), "v", "g", "a", "b"))
    assert(r1.getDouble(r1.fieldIndex("t_stat")) == 0.0)
    val shifted = (1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i + 40.0))
    val r2 = one(Stats.cramerVonMises(shifted.toDF("g", "v"), "v", "g", "a", "b"))
    assert(r2.getDouble(r2.fieldIndex("t_stat")) > 1.0)
  }

  test("markovEntropyRate: deterministic chain has zero entropy") {
    val det = (0 until 30).map(i => ("u", i, if (i % 2 == 0) "a" else "b"))
    val r = one(Stats.markovEntropyRate(det.toDF("u", "t", "s"),
      Seq("u"), Seq("t"), "s"))
    assert(r.getLong(r.fieldIndex("n_states")) == 2L)
    assert(math.abs(r.getDouble(r.fieldIndex("entropy_rate"))) < 1e-8)
  }

  test("markovEntropyRate: uniform coin chain approaches ln 2") {
    // a/b alternating in blocks so transitions are ~uniform from each
    val seq = "a a b b a b a a b b a b a a b b a b a a b b a b".split(" ")
      .zipWithIndex.map { case (s, i) => ("u", i, s) }.toSeq
    val r = one(Stats.markovEntropyRate(seq.toDF("u", "t", "s"),
      Seq("u"), Seq("t"), "s"))
    val h = r.getDouble(r.fieldIndex("entropy_rate"))
    assert(h > 0.5 && h <= math.log(2.0) + 1e-9, s"h=$h")
  }

  test("leveneTest: equal-spread groups score F near 0; unequal spread grows") {
    val tight = (0 until 40).map(i => ("a", (i % 5).toDouble)) ++
      (0 until 40).map(i => ("b", (i % 5).toDouble))
    val r1 = one(Stats.leveneTest(tight.toDF("g", "v"), "v", "g"))
    assert(math.abs(r1.getDouble(r1.fieldIndex("f"))) < 1e-9)
    val wide = (0 until 40).map(i => ("a", (i % 5).toDouble)) ++
      (0 until 40).map(i => ("b", (i % 5) * 10.0))
    val r2 = one(Stats.leveneTest(wide.toDF("g", "v"), "v", "g"))
    assert(r2.getDouble(r2.fieldIndex("f")) > 10.0)
  }

  test("bartlettTest: textbook guards — tiny groups dropped, zero variance nulls") {
    // group c has 1 row (dropped); group d constant (variance 0 → chi2 null)
    val rows = (0 until 20).map(i => ("a", i.toDouble)) ++
      (0 until 20).map(i => ("d", 5.0)) ++ Seq(("c", 1.0))
    val r = one(Stats.bartlettTest(rows.toDF("g", "v"), "v", "g"))
    assert(r.getLong(r.fieldIndex("k")) == 2L)     // c excluded
    assert(r.getLong(r.fieldIndex("n")) == 40L)
    assert(r.isNullAt(r.fieldIndex("chi2")))       // min variance = 0
    // two healthy unequal-variance groups → big chi2
    val rows2 = (0 until 30).map(i => ("a", (i % 7).toDouble)) ++
      (0 until 30).map(i => ("b", (i % 7) * 20.0))
    val r2 = one(Stats.bartlettTest(rows2.toDF("g", "v"), "v", "g"))
    assert(r2.getDouble(r2.fieldIndex("chi2")) > 20.0)
    assert(r2.getDouble(r2.fieldIndex("pooled_var")) > 0.0)
  }

  test("businessDaysBetween: hand-checked spans incl. weekends and negatives") {
    import java.sql.Date
    // 2026-08-10 is a Monday
    val rows = Seq(
      ("mon_to_fri", Date.valueOf("2026-08-10"), Date.valueOf("2026-08-14"), 4L),
      ("mon_to_mon", Date.valueOf("2026-08-10"), Date.valueOf("2026-08-17"), 5L),
      ("fri_to_mon", Date.valueOf("2026-08-14"), Date.valueOf("2026-08-17"), 1L),
      ("sat_to_sun", Date.valueOf("2026-08-15"), Date.valueOf("2026-08-16"), 0L),
      ("same_day",   Date.valueOf("2026-08-12"), Date.valueOf("2026-08-12"), 0L),
      ("two_weeks",  Date.valueOf("2026-08-10"), Date.valueOf("2026-08-24"), 10L),
      ("backwards",  Date.valueOf("2026-08-17"), Date.valueOf("2026-08-10"), -5L))
    val got = rows.toDF("name", "d1", "d2", "want")
      .select(col("name"), col("want"),
        graft.ops.Advanced.businessDaysBetween(col("d1"), col("d2")).as("bd"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(r.fieldIndex("bd")) == r.getLong(r.fieldIndex("want")),
        s"${r.getString(0)}: got ${r.getLong(r.fieldIndex("bd"))}")
    }
  }

  test("rmst: all-events-at-t survival drops there; censored-only stays at tau") {
    // 10 subjects all die at t=4: S=1 on [0,4), 0 after → RMST(10) = 4
    val dead = (1 to 10).map(_ => (4L, 1L))
    val r1 = one(Stats.rmst(dead.toDF("dur", "ev"), "dur", "ev", tau = 10L))
    assert(math.abs(r1.getDouble(r1.fieldIndex("rmst")) - 4.0) < 1e-9)
    // all censored → S never drops → RMST = tau
    val cens = (1 to 10).map(_ => (3L, 0L))
    val r2 = one(Stats.rmst(cens.toDF("dur", "ev"), "dur", "ev", tau = 10L))
    assert(math.abs(r2.getDouble(r2.fieldIndex("rmst")) - 10.0) < 1e-9)
    // half die at 2: RMST(6) = 2 + 0.5*4 = 4
    val half = (1 to 5).map(_ => (2L, 1L)) ++ (1 to 5).map(_ => (2L, 0L))
    val r3 = one(Stats.rmst(half.toDF("dur", "ev"), "dur", "ev", tau = 6L))
    assert(math.abs(r3.getDouble(r3.fieldIndex("rmst")) - 4.0) < 1e-6)
  }

  test("markovPredictNext: argmax with lexicographic tie-break") {
    // a→b twice, a→c twice (tie → b), b→a, c→a
    val seq = "a b a c a b a c a".split(" ").zipWithIndex
      .map { case (s, i) => ("u", i, s) }.toSeq
    val out = Stats.markovPredictNext(seq.toDF("u", "t", "s"),
      Seq("u"), Seq("t"), "s").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getString(a.fieldIndex("predicted_next")) == "b") // tie → b
    assert(a.getLong(a.fieldIndex("n_total")) == 4L)
    assert(math.abs(a.getDouble(a.fieldIndex("p_top")) - 0.5) < 1e-12)
    assert(out("b").getString(1) == "a" &&
      out("b").getDouble(out("b").fieldIndex("p_top")) == 1.0)
  }

  test("periodogram: a pure 8-cycle sinusoid spikes at k = 8") {
    val n = 64
    val rows = (0 until n).map(i =>
      (i, 10.0 + 5.0 * math.cos(2.0 * math.Pi * 8.0 * i / n)))
    val out = Stats.periodogram(rows.toDF("t", "v"), Seq("t"), "v",
        maxK = 10).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val spike = out(8)
    (1 to 10).filter(_ != 8).foreach { k =>
      assert(out(k) < spike / 100.0, s"k=$k power=${out(k)} spike=$spike")
    }
  }

  test("periodogram portable trig kernel tracks Math.cos to 1e-11") {
    // the kernel path: one row per t, x = 1 → C_k is a floored cos sum;
    // compare a single-row frame where the sums reduce to one term
    val out = Stats.periodogram(Seq((0, 1.0), (1, 1.0), (2, 1.0), (3, 1.0))
        .toDF("t", "v"), Seq("t"), "v", maxK = 1).collect()
    // n=4, k=1: terms cos(0, pi/2, pi, 3pi/2) = 1, 0, -1, 0 → C=0; sin sum
    // = 0 + 1 - 0 - 1 = 0 → power 0 exactly at the quadrant boundaries
    assert(out.head.getDouble(2) == 0.0)
  }

  test("ngramPatterns: contiguous trigrams counted with total top-k order") {
    // user u: a b c a b c → "a > b > c" twice, others once
    val seq = "a b c a b c".split(" ").zipWithIndex
      .map { case (s, i) => ("u", i, s) }.toSeq
    val out = graft.ops.Behavior.ngramPatterns(seq.toDF("u", "t", "s"),
      "u", Seq("t"), "s", n = 3, topK = 2).collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a > b > c")
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 1L)
    assert(out(1).getLong(1) == 1L)
  }

  test("weibullFit: exponential-like KM (k near 1) and the scale guard") {
    // geometric-ish deaths (S roughly halves per step) — assert the fit
    // runs with a sane positive shape and scale
    val rows = (1 to 200).map { i =>
      val t = 1 + (math.log(i) / math.log(2)).toInt  // crude spread
      (t.toLong, 1L)
    }
    val r = one(Stats.weibullFit(rows.toDF("dur", "ev"), "dur", "ev"))
    assert(r.getLong(r.fieldIndex("n_points")) >= 3L)
    assert(r.getDouble(r.fieldIndex("shape")) > 0.0)
    assert(r.getDouble(r.fieldIndex("scale")) > 0.0)
  }

  test("huberMean: outliers bounded — estimate sits near the clean bulk") {
    // 38 clean values around 10 (spread so MAD > 0), 2 wild outliers at 1000
    val clean = (0 until 38).map(i => ("a", 10.0 + (i % 5) * 0.5))
    val wild = Seq(("a", 1000.0), ("a", 1000.0))
    val r = one(Stats.huberMean((clean ++ wild).toDF("g", "v"), "v", "g"))
    val hm = r.getDouble(r.fieldIndex("huber_mean"))
    val mean = (clean.map(_._2).sum + 2000.0) / 40.0   // ~60.5, dragged
    assert(hm > 10.0 && hm < 13.0, s"huber=$hm")       // bulk-anchored
    assert(math.abs(hm - mean) > 40.0)                 // far from raw mean
    assert(r.getDouble(r.fieldIndex("scale")) > 0.0)
    assert(r.getLong(r.fieldIndex("n")) == 40L)
  }

  test("huberMean: zero-MAD group falls back to the median") {
    val rows = Seq.fill(20)(("c", 7.0)) ++ Seq(("c", 99.0))
    val r = one(Stats.huberMean(rows.toDF("g", "v"), "v", "g"))
    assert(r.getDouble(r.fieldIndex("huber_mean")) == 7.0)
  }

  test("fanoFactor: constant-rate arrivals give F = 0, bursty F > 1") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(hour: Int, i: Int) = new java.sql.Timestamp(
      base.getTime + hour * 3600000L + i * 1000L)
    // "steady": 3 events every hour for 8 hours; "bursty": 24 in one hour
    val steady = (0 until 8).flatMap(h => (0 until 3).map(i => ("s", at(h, i))))
    val bursty = (0 until 24).map(i => ("b", at(3, i)))
    val out = Stats.fanoFactor((steady ++ bursty).toDF("t", "ts"), "ts", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    val s = out("s")
    assert(s.getLong(s.fieldIndex("n_buckets")) == 8L)
    assert(s.getDouble(s.fieldIndex("fano")) == 0.0)
    val b = out("b")
    assert(b.getDouble(b.fieldIndex("fano")) > 1.0)
  }
}
