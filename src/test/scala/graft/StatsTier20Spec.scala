package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats
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

  test("mutualInfo: perfect 2x2 association gives MI = H = ln 2, U = 1") {
    import spark.implicits._
    val df = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "2"))
      .toDF("x", "y")
    val r = Stats.mutualInfo(df, "x", "y").collect()(0)
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(3) - math.log(2)) < 1e-8)
    assert(math.abs(r.getDouble(4) - math.log(2)) < 1e-8)
    assert(math.abs(r.getDouble(5) - math.log(2)) < 1e-8)
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-7)
  }

  test("mutualInfo: independent columns give MI = 0 (up to the floor grid)") {
    import spark.implicits._
    val df = (for (x <- Seq("a", "b"); y <- Seq("1", "2"); _ <- 1 to 3)
      yield (x, y)).toDF("x", "y")
    val r = Stats.mutualInfo(df, "x", "y").collect()(0)
    assert(math.abs(r.getDouble(3)) < 1e-8, s"mi=${r.getDouble(3)}")
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
