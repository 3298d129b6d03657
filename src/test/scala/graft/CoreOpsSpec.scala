package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops._
import graft.ops.TableOps._

class CoreOpsSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("concatWidening pads missing columns and widens types") {
    val a = Seq((1, 1.5f)).toDF("k", "x")
    val b = Seq((2L, "y")).toDF("k", "s")
    val out = a.concatWidening(b).orderBy("k")
    // int+long → long; float-only col stays; missing cols null
    assert(out.schema("k").dataType == LongType)
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Float]("x") == 1.5f && rows(0).getAs[String]("s") == null)
    assert(rows(1).isNullAt(rows(1).fieldIndex("x")) && rows(1).getAs[String]("s") == "y")
  }

  test("concatWidening long+float widens to double") {
    val a = Seq(Tuple1(1L)).toDF("x")
    val b = Seq(Tuple1(1.5f)).toDF("x")
    assert(a.concatWidening(b).schema("x").dataType == DoubleType)
  }

  test("uniqueByColumn keeps deterministic representative") {
    val df = Seq((1, "b"), (1, "a"), (2, "c")).toDF("k", "v")
    val out = df.uniqueByColumn(Seq("k"), Seq(col("v").asc)).orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "c")))
  }

  test("columnCastRelaxed records parse failures instead of failing") {
    val df = Seq("1", "x", "3").toDF("v").columnCastRelaxed("v", IntegerType)
    val rows = df.orderBy(col("v").asc_nulls_last).collect()
    assert(rows.count(_.getAs[Boolean]("v_unparsed")) == 1)
    assert(rows.map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq == Seq(1, 3, null))
  }

  test("filter-column truthy semantics per type") {
    val df = Seq((0, true), (1, false), (2, true)).toDF("n", "b")
    assert(df.filterColumnTruthy("b").count() == 2)
    assert(df.filterColumnTruthy("n").count() == 2) // 0 is falsy
  }

  test("bag set ops: multiplicities") {
    val a = Seq("x", "x", "y").toDF("v")
    val b = Seq("x", "y", "y", "z").toDF("v")
    val inter = SetOps.bagIntersection(a, b).groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inter == Map("x" -> 1, "y" -> 1))
    val uni = SetOps.bagUnion(a, b).groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("x" -> 2, "y" -> 2, "z" -> 1))
  }

  test("bag ops are null-safe (nil == nil like the reference's maps)") {
    val a = Seq(Option.empty[String], Some("x")).toDF("v")
    val b = Seq(Option.empty[String], None, Some("x")).toDF("v")
    val inter = SetOps.bagIntersection(a, b).collect()
    assert(inter.length == 2) // min(1,2) nulls + min(1,1) x
    val uni = SetOps.bagUnion(a, b).collect()
    assert(uni.length == 3) // max(1,2) nulls + max(1,1) x
  }

  test("reductions cross-check: 3x-unioned table triples sums, keeps means") {
    // the reference's invariant test pattern (reductions_test.clj:25-52)
    val li = Tables.t(spark, sfDir, "lineitem")
    val one = Reductions.groupByAgg(li, Seq("l_returnflag"),
      "s1" -> Reductions.dsum(col("l_quantity")),
      "m1" -> Reductions.dmean(col("l_quantity")))
    val three = Reductions.groupByAgg(li.unionAll(li).unionAll(li), Seq("l_returnflag"),
      "s3" -> Reductions.dsum(col("l_quantity")),
      "m3" -> Reductions.dmean(col("l_quantity")))
    val j = one.join(three, Seq("l_returnflag")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(math.abs(r.getAs[Double]("s3") / r.getAs[Double]("s1") - 3.0) < 1e-12)
      assert(math.abs(r.getAs[Double]("m3") - r.getAs[Double]("m1")) < 1e-12)
    }
  }

  test("kahanSum recovers cancellation a naive double sum loses") {
    // 1e16 + 1 - 1e16 = 1 exactly under Kahan; naive double sum gives 0 or 2
    val df = Seq(1e16, 1.0, -1e16).toDF("x")
    val k = df.agg(Reductions.kahanSum(col("x"))).collect()(0).getDouble(0)
    assert(k == 1.0, s"kahan=$k")
    // null-safe: nulls contribute nothing
    val k2 = Seq(Some(1.5), None, Some(2.5)).toDF("x")
      .agg(Reductions.kahanSum(col("x"))).collect()(0).getDouble(0)
    assert(k2 == 4.0)
  }

  test("dcorr uses pairwise-complete rows under nulls") {
    val df = Seq((Some(1.0), Some(1.0)), (Some(2.0), Some(2.0)),
      (None: Option[Double], Some(3.0)), (Some(3.0), Some(3.0)))
      .toDF("x", "y")
    val r = df.agg(Reductions.dcorr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12, s"corr=$r") // complete pairs perfectly correlated
  }

  test("melt/pivot round shapes") {
    val df = Seq((1, 2.0, 3.0)).toDF("id", "a", "b")
    val melted = Reshape.melt(df, Seq("id"), Seq("a", "b"))
    assert(melted.count() == 2)
    assert(melted.columns.toSeq == Seq("id", "column", "value"))
  }

  test("missing fills: down/up/lerp on a crafted frame") {
    val df = Seq((1, Some(10.0)), (2, None), (3, None), (4, Some(40.0)))
      .toDF("i", "v")
    val down = Missing.fillDown(df, "v", Seq(col("i"))).orderBy("i")
      .collect().map(_.getAs[Double]("v"))
    assert(down.toSeq == Seq(10.0, 10.0, 10.0, 40.0))
    val lerp = Missing.fillLerp(df, "v", col("i")).orderBy("i")
      .collect().map(_.getAs[Double]("v"))
    assert(lerp.toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    val near = Missing.fillNearest(df, "v", col("i")).orderBy("i")
      .collect().map(_.getAs[Double]("v"))
    assert(near.toSeq == Seq(10.0, 10.0, 40.0, 40.0)) // tie at i=2 goes down
  }

  test("row index + positional select/drop") {
    val df = Seq("a", "b", "c", "d").toDF("v")
      .withRowIndex(Seq(col("v")))
    assert(df.selectRows("row_idx", Seq(0L, 2L))
      .orderBy("row_idx").collect().map(_.getString(0)).toSeq == Seq("a", "c"))
    assert(df.dropRows("row_idx", Seq(1L))
      .orderBy("row_idx").collect().map(_.getString(0)).toSeq == Seq("a", "c", "d"))
    // the local window variant agrees on small frames
    val loc = Seq("a", "b", "c", "d").toDF("v").withRowIndexLocal(Seq(col("v")))
    assert(loc.orderBy("row_idx").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L), ("d", 3L)))
    // NEGATIVE indices count from the end (reference dataset_test.clj
    // negative-index-on-columns-gets-last: −1 = last row); mixed
    // positive + negative lists resolve both sides
    assert(df.selectRows("row_idx", Seq(-1L))
      .collect().map(_.getString(0)).toSeq == Seq("d"))
    assert(df.selectRows("row_idx", Seq(0L, -2L))
      .orderBy("row_idx").collect().map(_.getString(0)).toSeq == Seq("a", "c"))
    assert(df.dropRows("row_idx", Seq(-1L, -2L))
      .orderBy("row_idx").collect().map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("reference edge-case pins: all-missing column survives value-fill; " +
       "unique-by on an all-null key; int arithmetic propagates missing") {
    // replace-missing :value mean on an ALL-null column: the fill value
    // itself is missing → both slots stay missing, no crash
    // (reference dataset_test.clj replace-missing-all-values-missing)
    val allNull = Seq[Option[Double]](None, None).toDF("a")
    val meanRow = allNull.agg(avg(col("a")).as("m")).collect()(0)
    assert(meanRow.isNullAt(0))
    val filled = Missing.fillValue(allNull,
      Map("a" -> (if (meanRow.isNullAt(0)) null else meanRow.getDouble(0))))
    assert(filled.filter(col("a").isNull).count() == 2L)
    // unique-by over an all-null key column returns the single null
    // group, no crash (reference unique-by-nil-regression)
    val nullKey = Seq[(Option[String], Int)]((None, 1), (None, 2))
      .toDF("abc", "v")
    assert(nullKey.uniqueByColumn(Seq("abc"), Seq(col("v"))).count() == 1L)
    // integer column + scalar with a missing slot: the missing slot
    // stays missing, others compute (reference
    // binary-ops-on-integer-missing-results-in-nan; Spark's null
    // propagation IS the reference's missing propagation)
    val ints = Seq[Option[Long]](Some(1L), Some(2L), None, Some(4L))
      .toDF("a").withColumn("b", col("a") + lit(1L))
    assert(ints.filter(col("b").isNull).count() == 1L)
    assert(ints.orderBy(col("a").asc_nulls_last).collect()
      .map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq ==
      Seq(2L, 3L, 5L, -1L))
  }

  test("fitLabelMap: distributed ranking, no window stage, high cardinality") {
    // 200k distinct values across 8 partitions — the former dense_rank form
    // would funnel these through ONE window task
    val big = spark.range(0, 200000).repartition(8)
      .select(concat(lit("v"), format_string("%07d", col("id"))).as("c"))
    val m = Categorical.fitLabelMap(big, "c", "code")
    // no Window operator anywhere in the plan: the rank is a range-
    // partitioned sort + zipWithIndex whose parallelism follows the data
    // volume (AQE coalesces this small shuffle locally; at scale the sort
    // spreads over the range partitions — nothing in the plan is
    // single-task BY CONSTRUCTION, unlike a partition-less window)
    assert(!m.queryExecution.executedPlan.toString.contains("Window"),
      "fitLabelMap must not use a global window")
    val sample = m.filter(col("c").isin("v0000000", "v0099999", "v0199999"))
      .orderBy("code").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(sample.toSeq == Seq(("v0000000", 0), ("v0099999", 99999),
      ("v0199999", 199999)))
  }

  test("fillAbb fills every missing slot from the observed value set") {
    val df = Seq(Some(1.0), None, Some(3.0), None, None, Some(5.0))
      .zipWithIndex.map(_.swap).toDF("i", "v")
    val out = Missing.fillAbb(df, "v", seed = 7L)
    assert(out.filter(col("v").isNull).count() == 0)
    val vals = out.select("v").collect().map(_.getDouble(0)).toSet
    assert(vals.subsetOf(Set(1.0, 3.0, 5.0)))
    assert(out.count() == 6)
  }

  test("removeEmptyColumns drops all-null columns only") {
    val df = Seq((1, Option.empty[String], "x"), (2, None, "y"))
      .toDF("a", "empty", "c")
    assert(Missing.removeEmptyColumns(df).columns.toSeq == Seq("a", "c"))
  }

  test("updateColumns applies transform to selected columns") {
    val df = Seq((1.0, 2.0, "s")).toDF("x", "y", "s")
    val out = df.updateColumnsWhere(_.dataType == org.apache.spark.sql.types.DoubleType,
      c => c * 10).collect()(0)
    assert(out.getDouble(0) == 10.0 && out.getDouble(1) == 20.0 && out.getString(2) == "s")
  }

  test("rollingRangeCalendar: month-end clamping hand case") {
    // 1-month trailing window anchored 2020-03-31: lower bound is
    // 2020-03-31 minus 1 calendar month = 2020-02-29 (clamped), so the
    // window holds {02-29, 03-31}; anchored 2020-02-29 the bound is
    // 2020-01-29 which EXCLUDES 2020-01-28.
    val df = Seq(
      (1, "2020-01-28"), (2, "2020-02-29"), (3, "2020-03-31"),
      (4, "2020-04-30"))
      .toDF("id", "d")
      .withColumn("d", col("d").cast("timestamp"))
      .withColumn("v", col("id").cast("double"))
    val out = Rolling.rollingRangeCalendar(df, "d", 1, "months", Seq(),
      Seq(("n", "id", c => count(c)), ("sv", "v", c => sum(c))))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(1L, 1L, 2L, 2L))
    assert(out.map(_.getAs[Double]("sv")).toSeq == Seq(1.0, 2.0, 5.0, 7.0))
  }

  test("rollingRangeCalendar: equals brute force, keyed, across partitions") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map { i =>
      val day = 1 + rnd.nextInt(28)
      val mon = 1 + rnd.nextInt(12)
      val yr = 2019 + rnd.nextInt(3)
      (i, s"k${rnd.nextInt(4)}", java.sql.Timestamp.valueOf(
        f"$yr-$mon%02d-$day%02d 00:00:00"), rnd.nextInt(100).toDouble)
    }
    val df = rows.toDF("id", "k", "t", "v").repartition(7)
    val got = Rolling.rollingRangeCalendar(df, "t", 3, "months", Seq("k"),
      Seq(("n", "id", c => count(c)), ("sv", "v", c => sum(c))))
      .select("id", "n", "sv").collect()
      .map(r => r.getInt(0) -> ((r.getAs[Long]("n"), r.getAs[Double]("sv"))))
      .toMap
    rows.foreach { case (id, k, t, _) =>
      val lb = t.toLocalDateTime.minusMonths(3)
      val in = rows.filter(r => r._2 == k &&
        !r._3.toLocalDateTime.isBefore(lb) && !r._3.after(t))
      assert(got(id) == ((in.size.toLong, in.map(_._4).sum)),
        s"row $id anchor $t")
    }
  }

  test("rollingRangeCalendar: leading (Right) windows, years unit, DateType") {
    // Right position: window [t, t + span]; years = 12·span months with
    // the same clamp; date-typed axis goes through add_months
    val df = Seq(
      (1, "2019-02-28"), (2, "2020-02-29"), (3, "2021-02-28"),
      (4, "2021-06-30"))
      .toDF("id", "d")
      .withColumn("d", col("d").cast("date"))
      .withColumn("v", col("id").cast("double"))
    // 1-year leading window anchored 2019-02-28: ub = 2020-02-28 — the
    // 2020-02-29 leap-day row is OUTSIDE (strictly after the clamp-free
    // bound); anchored 2020-02-29: ub = 2021-02-28 (clamped) INCLUDES
    // 2021-02-28
    val out = Rolling.rollingRangeCalendar(df, "d", 1, "years", Seq(),
      Seq(("n", "id", c => count(c))), position = Rolling.Right)
      .orderBy("id").collect().map(_.getAs[Long]("n"))
    assert(out.toSeq == Seq(1L, 2L, 2L, 1L))
  }

  test("rollingRangeCalendar: leading windows equal brute force, keyed") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 200).map { i =>
      (i, s"k${rnd.nextInt(3)}", java.sql.Timestamp.valueOf(
        f"${2020 + rnd.nextInt(2)}-${1 + rnd.nextInt(12)}%02d-" +
          f"${1 + rnd.nextInt(28)}%02d 00:00:00"),
        rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("id", "k", "t", "v").repartition(5)
    val got = Rolling.rollingRangeCalendar(df, "t", 2, "months", Seq("k"),
      Seq(("sv", "v", c => sum(c))), position = Rolling.Right)
      .select("id", "sv").collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("sv")).toMap
    rows.foreach { case (id, k, t, _) =>
      val ub = t.toLocalDateTime.plusMonths(2)
      val in = rows.filter(r => r._2 == k &&
        !r._3.before(t) && !r._3.toLocalDateTime.isAfter(ub))
      assert(got(id) == in.map(_._4).sum, s"row $id anchor $t")
    }
  }

  test("rolling clamp matches hand-computed reference semantics") {
    // values 1,2,3,4 / window 3 trailing, clamp-left:
    // row0: [1,1,1]=3; row1: [1,1,2]=4; row2: [1,2,3]=6; row3: [2,3,4]=9
    val df = Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)).toDF("i", "v")
    val out = Rolling.rollingClampSumMean(df, 3, Rolling.Left,
      Seq(col("i")), Seq(), col("v"), "c")
      .orderBy("i").collect().map(_.getAs[Double]("c_sum"))
    assert(out.toSeq == Seq(3.0, 4.0, 6.0, 9.0))
  }

  test("rolling clamp Center pads trailing edge with LAST value") {
    // values 1..4, n=3 centered: row3's frame {3,4} + pad last(4) = 11
    // row0's frame {1,2} + pad first(1) = 4
    val df = Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)).toDF("i", "v")
    val out = Rolling.rollingClampSumMean(df, 3, Rolling.Center,
      Seq(col("i")), Seq(), col("v"), "c")
      .orderBy("i").collect().map(_.getAs[Double]("c_sum"))
    assert(out.toSeq == Seq(4.0, 6.0, 9.0, 11.0))
  }

  test("rolling corr: perfect linear pair = 1, anti = -1, degenerate null") {
    val df = Seq(
      (0, 1.0, 2.0, 5.0), (1, 2.0, 4.0, 4.0), (2, 3.0, 6.0, 3.0),
      (3, 4.0, 8.0, 2.0), (4, 5.0, 10.0, 1.0)).toDF("i", "x", "y", "z")
    val out = Rolling.rolling(df, 3, Rolling.Left, Seq(col("i")), Seq(),
      "cxy" -> Rolling.rCorr(col("x"), col("y")),
      "cxz" -> Rolling.rCorr(col("x"), col("z")),
      "cxc" -> Rolling.rCorr(col("x"), lit(7.0)))
      .orderBy("i").collect()
    // full 3-row frames: y = 2x exactly -> corr 1; z = 6-x -> corr -1
    (2 to 4).foreach { i =>
      assert(math.abs(out(i).getAs[Double]("cxy") - 1.0) < 1e-9)
      assert(math.abs(out(i).getAs[Double]("cxz") + 1.0) < 1e-9)
      assert(out(i).isNullAt(out(i).fieldIndex("cxc")), "constant side null")
    }
    // single-row frame: zero variance -> null
    assert(out(0).isNullAt(out(0).fieldIndex("cxy")))
  }

  test("rolling median: odd frame = middle, even = midpoint, nulls skipped") {
    val df = Seq((0, Some(5.0)), (1, Some(1.0)), (2, Some(9.0)),
      (3, None: Option[Double]), (4, Some(3.0))).toDF("i", "v")
    val out = Rolling.rolling(df, 3, Rolling.Left, Seq(col("i")), Seq(),
      "med" -> Rolling.rMedian(col("v"))).orderBy("i").collect()
    assert(out(0).getAs[Double]("med") == 5.0)   // {5}
    assert(out(1).getAs[Double]("med") == 3.0)   // {1,5} → (1+5)/2
    assert(out(2).getAs[Double]("med") == 5.0)   // {1,5,9}
    assert(out(3).getAs[Double]("med") == 5.0)   // {1,9} null skipped → 5
    assert(out(4).getAs[Double]("med") == 6.0)   // {3,9} → 6
  }

  test("timeWeightedAvg: hand-computed hold-until-next weighting") {
    import java.sql.Timestamp
    // value 10 held 2s, 20 held 1s, 40 has no duration:
    // twap = (10·2e6 + 20·1e6)/3e6 = 40/3
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 10.0),
      ("a", Timestamp.valueOf("2024-01-01 00:00:02"), 2L, 20.0),
      ("a", Timestamp.valueOf("2024-01-01 00:00:03"), 3L, 40.0),
      ("b", Timestamp.valueOf("2024-01-01 00:00:00"), 4L, 7.0)
    ).toDF("k", "ts", "id", "v")
    val out = Rolling.timeWeightedAvg(df, Seq(col("k")), col("ts"),
      Seq(col("id")), col("v")).orderBy("k").collect()
    assert(out(0).getAs[Long]("n") == 3L)
    assert(out(0).getAs[Long]("span_us") == 3000000L)
    assert(math.abs(out(0).getAs[Double]("twap") - 40.0 / 3.0) < 1e-9)
    // single sample → zero span → null twap
    assert(out(1).getAs[Long]("span_us") == 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("twap")))
  }

  test("rolling clamp does not pad for nulls inside a full frame") {
    val df = Seq((0, Some(5.0)), (1, None), (2, Some(7.0)), (3, Some(8.0)))
      .toDF("i", "v")
    val out = Rolling.rollingClampSumMean(df, 3, Rolling.Left,
      Seq(col("i")), Seq(), col("v"), "c")
      .orderBy("i").collect().map(_.getAs[Double]("c_sum"))
    // row2 frame {5,null,7} is FULL → no padding → 12
    assert(out(2) == 12.0)
  }

  test("widen: decimal rules keep capacity, decimal+double -> double") {
    import org.apache.spark.sql.types._
    assert(Concat.widen(DecimalType(10, 0), DecimalType(5, 5)) == DecimalType(15, 5))
    assert(Concat.widen(DecimalType(12, 2), DoubleType) == DoubleType)
    assert(Concat.widen(DecimalType(12, 2), LongType) == DecimalType(22, 2))
  }

  test("truthiness: NaN is falsy for double columns") {
    val df = Seq(1.0, 0.0, Double.NaN).toDF("x")
    assert(df.filterColumnTruthy("x").count() == 1)
  }

  test("fillRange densifies gaps to max span") {
    val df = Seq((0.0, "a"), (10.0, "b")).toDF("x", "tag")
    val out = Missing.fillRange(df, "x", 2.5)
    val xs = out.orderBy("x").collect().map(_.getDouble(0))
    assert(xs.length == 5) // 0, 2.5, 5, 7.5, 10
    assert(xs.sliding(2).forall(p => p(1) - p(0) <= 2.5 + 1e-9))
  }

  test("keyless fillRange: bucketed lead == single-bucket result across " +
    "partition counts") {
    // the keyless lead distributes over value buckets; every bucket's last
    // row must take its successor from the boundary frame, so the inserted
    // grid cannot depend on the bucket count
    val rnd = new scala.util.Random(23)
    val xs = (0 until 300).map(_ => rnd.nextInt(5000).toDouble).distinct
    val df = xs.map(x => (x, s"v$x")).toDF("x", "tag")
    def grid(parts: String): Seq[Double] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Missing.fillRange(df, "x", 7.0).orderBy("x")
        .collect().map(_.getDouble(0)).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val one = grid("1")
    assert(one.size > xs.size) // it actually inserted something
    assert(grid("5") == one && grid("16") == one)
  }

  test("fillRange with partition keys densifies per group, keeps the key") {
    val df = Seq(("u1", 0.0, "a"), ("u1", 10.0, "b"), ("u2", 0.0, "c"),
      ("u2", 5.0, "d")).toDF("u", "x", "tag")
    val out = Missing.fillRange(df, "x", 2.5, partitionBy = Seq("u"))
    val byU = out.collect().groupBy(_.getString(0))
    assert(byU("u1").length == 5 && byU("u2").length == 3)
    // inserted rows carry their group key; only `tag` is padded
    assert(out.filter(col("tag").isNull && col("u").isNull).count() == 0)
    // u2's gap is independent of u1's points
    val xs2 = byU("u2").map(_.getDouble(1)).sorted
    assert(xs2.sliding(2).forall(p => p(1) - p(0) <= 2.5 + 1e-9))
  }

  test("takeNth: every n-th row of the total order, distributed index") {
    val df = (0 until 20).map(i => (i, s"v$i")).toDF("i", "v")
      .repartition(4) // exercise cross-partition offsets
    val out = df.takeNth(5, Seq(col("i"))).orderBy("i")
      .collect().map(_.getInt(0))
    assert(out.toSeq == Seq(0, 5, 10, 15))
  }

  test("randNth returns exactly one existing row, stable for a seed") {
    val df = (1 to 50).toDF("x")
    val a = df.randNth(7L).collect()
    val b = df.randNth(7L).collect()
    assert(a.length == 1 && (1 to 50).contains(a(0).getInt(0)))
    assert(a(0).getInt(0) == b(0).getInt(0))
  }

  test("columnLabeledMapseq: one map per (row, value column)") {
    val df = Seq((1, 10.0, 100.0), (2, 20.0, 200.0)).toDF("t", "a", "b")
    val ms = Reshape.columnLabeledMapseq(df, Seq("a", "b"))
    assert(ms.length == 4)
    assert(ms.forall(m => m.contains("t") && m.contains("label") && m.contains("value")))
    assert(ms.exists(m => m("label") == "a" && m("value") == 10.0 && m("t") == 1))
    assert(ms.exists(m => m("label") == "b" && m("value") == 200.0 && m("t") == 2))
  }
}
