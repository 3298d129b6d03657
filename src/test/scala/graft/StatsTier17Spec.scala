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
}
