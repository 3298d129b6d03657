package graft

import org.apache.spark.sql.functions._
import graft.ops.Indicators

/** Closed-form checks for the indicator tier (q315–q322): tiny series
  * whose RSI/bands/MACD/drawdown values are known analytically, plus the
  * MACD-fold ≡ chained-ewmaKeyed equivalence (one shuffle vs three must
  * be a pure plan change, never a value change). */
class IndicatorsSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def series(vals: Seq[Double], key: String = "a") =
    vals.zipWithIndex.map { case (v, i) =>
      (key, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        v)
    }.toDF("k", "tie", "ts", "v")

  test("rsi: monotone-up series pins RSI at 100, monotone-down at 0") {
    val up = Indicators.rsi(series((1 to 10).map(_.toDouble)), Seq("k"),
      Seq("ts", "tie"), "v", n = 5).orderBy("tie").collect()
    assert(up.head.isNullAt(up.head.fieldIndex("rsi"))) // no delta yet
    assert(up.tail.forall(_.getDouble(up.head.fieldIndex("rsi")) == 100.0))
    val dn = Indicators.rsi(series((1 to 10).map(i => 20.0 - i)), Seq("k"),
      Seq("ts", "tie"), "v", n = 5).orderBy("tie").collect()
    assert(dn.tail.forall(_.getDouble(dn.head.fieldIndex("rsi")) == 0.0))
  }

  test("bollinger: constant series has zero-width bands and null %B") {
    val r = Indicators.bollinger(series(Seq.fill(6)(4.0)), Seq("k"),
      Seq("ts", "tie"), "v", n = 4).orderBy("tie").collect()
    r.foreach { row =>
      assert(row.getDouble(row.fieldIndex("bb_mid")) == 4.0)
      assert(row.getDouble(row.fieldIndex("bb_up")) == 4.0)
      assert(row.isNullAt(row.fieldIndex("pct_b")))
    }
  }

  test("macd single fold == three chained ewmaKeyed recursions") {
    val df = series(Seq(1.63, 26.17, 64.23, 15.88, 3.02, 99.5, 42.0, 7.7))
    val fold = Indicators.macd(df, Seq("k"), Seq("ts", "tie"), "v")
      .select("tie", "macd", "macd_signal", "macd_hist")
      .orderBy("tie").collect()
    val e12 = graft.ops.Advanced.ewmaKeyed(df, Seq("k"), Seq("ts", "tie"),
      "v", 2.0 / 13, "f")
    val e26 = graft.ops.Advanced.ewmaKeyed(e12, Seq("k"), Seq("ts", "tie"),
      "v", 2.0 / 27, "s")
    val m = e26.withColumn("m", col("f") - col("s"))
    val sig = graft.ops.Advanced.ewmaKeyed(m, Seq("k"), Seq("ts", "tie"),
      "m", 2.0 / 10, "sig")
      .select(col("tie"), col("m"), col("sig"),
        (col("m") - col("sig")).as("h"))
      .orderBy("tie").collect()
    fold.zip(sig).foreach { case (a, b) =>
      assert(a.getDouble(1) == b.getDouble(1), s"macd @tie=${a.getLong(0)}")
      assert(a.getDouble(2) == b.getDouble(2), s"signal @tie=${a.getLong(0)}")
      assert(a.getDouble(3) == b.getDouble(3), s"hist @tie=${a.getLong(0)}")
    }
  }

  test("drawdown: peak is the running max; dd_pct null only at peak 0") {
    val r = Indicators.drawdown(series(Seq(0.0, 5.0, 3.0, 8.0, 2.0)),
      Seq("k"), Seq("ts", "tie"), "v").orderBy("tie").collect()
    val peaks = r.map(_.getDouble(r.head.fieldIndex("peak")))
    assert(peaks.toSeq == Seq(0.0, 5.0, 5.0, 8.0, 8.0))
    assert(r(0).isNullAt(r(0).fieldIndex("dd_pct"))) // peak 0 → undefined
    assert(r(4).getDouble(r(4).fieldIndex("dd")) == 6.0)
    assert(r(4).getDouble(r(4).fieldIndex("dd_pct")) == 0.75)
  }

  test("varEs: exact rank selection picks the k-th smallest return") {
    // 11 returns from 12 values; k = ceil(0.25*11) = 3 → var = 3rd
    // smallest return, es = mean of the 3 smallest
    val vals = Seq(100.0, 90.0, 99.0, 80.0, 88.0, 110.0, 99.0, 120.0,
      60.0, 66.0, 72.6, 100.0)
    val r = Indicators.varEs(series(vals), Seq("k"), Seq("ts", "tie"),
      "v", alpha = 0.25).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("n_returns")) == 11L)
    assert(row.getLong(row.fieldIndex("k_tail")) == 3L)
    val rets = vals.sliding(2).map { case Seq(a, b) => b / a - 1.0 }.toSeq
    val sorted = rets.sorted
    assert(row.getDouble(row.fieldIndex("var_alpha")) == sorted(2))
    val es = sorted.take(3).map(x => math.floor(x * 1e6)).sum / 1e6 / 3
    assert(row.getDouble(row.fieldIndex("es_alpha")) == es)
  }

  test("stochastic: %K hits 100 at a window max and 0 at a window min") {
    val r = Indicators.stochastic(series(Seq(5.0, 1.0, 9.0, 9.0, 0.5)),
      Seq("k"), Seq("ts", "tie"), "v", n = 3, d = 2).orderBy("tie").collect()
    val k = r.map(x => if (x.isNullAt(x.fieldIndex("pct_k"))) Double.NaN
      else x.getDouble(x.fieldIndex("pct_k")))
    assert(k(0).isNaN)          // flat 1-row window
    assert(k(1) == 0.0)         // window min
    assert(k(2) == 100.0)       // window max
    assert(k(4) == 0.0)
  }

  test("ohlc bars: open/close are argmin/argmax by (ts, tie)") {
    val df = Seq(
      ("a", 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 5.0),
      ("a", 2L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 9.0),
      ("a", 3L, java.sql.Timestamp.valueOf("2024-01-01 10:59:59"), 2.0),
      ("a", 4L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 7.0)
    ).toDF("k", "tie", "ts", "v")
    val r = Indicators.ohlcBars(df, Seq("k"), "ts", "tie", "v", "hour")
      .orderBy("bar_ts").collect()
    assert(r.length == 2)
    val b = r.head
    assert(b.getDouble(b.fieldIndex("open")) == 5.0)
    assert(b.getDouble(b.fieldIndex("high")) == 9.0)
    assert(b.getDouble(b.fieldIndex("low")) == 2.0)
    assert(b.getDouble(b.fieldIndex("close")) == 2.0)
    assert(b.getLong(b.fieldIndex("n")) == 3L)
  }
}
