package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Concat, Missing, SetOps}
import graft.ops.TableOps._

/** Property tests (SURVEY §5: an upgrade over the reference's example-only
  * tests): type widening laws, concat cardinalities, bag-op algebra, fill
  * completeness, join cardinality — checked over seeded random frames. */
class PropertySpec extends SparkSuite {
  init()
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randInts(maxLen: Int, maxV: Int): List[Int] =
    List.fill(rnd.nextInt(maxLen))(rnd.nextInt(maxV))

  private val numericTypes: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  test("widen is commutative, idempotent, and absorbing") {
    for (a <- numericTypes; b <- numericTypes) {
      assert(Concat.widen(a, b) == Concat.widen(b, a))
      assert(Concat.widen(a, a) == a)
      val w = Concat.widen(a, b)
      assert(Concat.widen(w, a) == w && Concat.widen(w, b) == w)
    }
  }

  test("widening avoids precision-class loss") {
    assert(Concat.widen(LongType, FloatType) == DoubleType)
    assert(Concat.widen(IntegerType, FloatType) == FloatType)
    assert(Concat.widen(DateType, TimestampType) == TimestampType)
  }

  test("concat row count = sum of inputs; schema = union of columns") {
    (1 to 8).foreach { _ =>
      val sizes = List.fill(1 + rnd.nextInt(3))(rnd.nextInt(20))
      val dfs = sizes.zipWithIndex.map { case (n, i) =>
        (0 until n).map(j => (j, s"v$i$j")).toDF("k", s"c$i")
      }
      val out = dfs.head.concatWidening(dfs.tail: _*)
      assert(out.count() == sizes.sum)
      assert(out.columns.toSet == (Set("k") ++ sizes.indices.map(i => s"c$i")))
    }
  }

  test("bag algebra: |A ∩ B| + |A ∪ B| = |A| + |B| (multiset identity)") {
    (1 to 8).foreach { _ =>
      val xs = randInts(12, 6); val ys = randInts(12, 6)
      if (xs.nonEmpty || ys.nonEmpty) {
        val i = SetOps.bagIntersection(xs.toDF("v"), ys.toDF("v")).count()
        val u = SetOps.bagUnion(xs.toDF("v"), ys.toDF("v")).count()
        assert(i + u == xs.length + ys.length, s"xs=$xs ys=$ys i=$i u=$u")
      }
    }
  }

  test("fillDownUp leaves no nulls when any value exists") {
    (1 to 8).foreach { _ =>
      val vs = List.fill(12)(if (rnd.nextBoolean()) Some(rnd.nextDouble()) else None)
      if (vs.exists(_.isDefined)) {
        val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
        assert(Missing.fillDownUp(df, "v", Seq(col("i")))
          .filter(col("v").isNull).count() == 0)
      }
    }
  }

  test("inner join cardinality = Σ_k count_a(k)·count_b(k)") {
    (1 to 8).foreach { _ =>
      val xs = randInts(15, 5); val ys = randInts(15, 5)
      val joined = xs.toDF("k").join(ys.toDF("k"), "k").count()
      val expected = xs.groupBy(identity).map { case (k, g) =>
        g.size.toLong * ys.count(_ == k)
      }.sum
      assert(joined == expected, s"xs=$xs ys=$ys")
    }
  }

  test("null propagation: arithmetic over null stays null, coalesce recovers") {
    val df = Seq((Some(1.0), None: Option[Double]), (None, Some(2.0))).toDF("a", "b")
    val out = df.select((col("a") + col("b")).as("s"),
      coalesce(col("a"), col("b"), lit(0.0)).as("c")).collect()
    assert(out.forall(_.isNullAt(0)))
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.0, 2.0))
  }

  test("asof join: every left row appears exactly once in the output") {
    (1 to 5).foreach { _ =>
      val lts = randInts(10, 50).map(_.toLong)
      val rts = randInts(10, 50).map(_.toLong)
      if (lts.nonEmpty) {
        val l = lts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("lid", "t")
        val r = rts.distinct.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("rt", "rid")
        val out = graft.ops.Joins.asofJoin(l, r, "t", "rt")
        assert(out.count() == lts.length, s"lts=$lts rts=$rts")
        assert(out.select("lid").distinct().count() == lts.length)
      }
    }
  }

  // ---- round-13 boundary fuzz: the keyless asof / fill-range distributed
  // plans carry bucket-boundary state through O(P) frames; these cases force
  // duplicated timestamps to land ON bucket boundaries for partition counts
  // 1/7/32 and check exact equality with a driver-side brute force.

  test("keyless asof (fwd/bwd, exact/strict) equals brute force under tie-heavy boundary data") {
    import graft.ops.Joins
    val r13 = new scala.util.Random(13)
    (1 to 6).foreach { round =>
      // tiny value domain → many exact ties; duplicates guaranteed
      val lts = List.fill(20 + r13.nextInt(40))(r13.nextInt(12).toLong)
      val rts0 = List.fill(10 + r13.nextInt(30))(r13.nextInt(12).toLong)
      val rts = rts0.distinct // payload keyed by time: unique right times
      for (parts <- Seq(1, 7, 32); fwd <- Seq(false, true);
           exact <- Seq(true, false)) {
        val dir: Joins.AsofDirection =
          if (fwd) Joins.Forward else Joins.Backward
        val l = lts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("lid", "t")
          .repartition(parts)
        val r = rts.map(t => (t, s"p$t")).toDF("rt", "payload")
          .repartition(parts)
        val got = Joins.asofJoin(l, r, "t", "rt", direction = dir,
            allowExactMatch = exact)
          .select("lid", "payload").as[(Long, String)].collect().toMap
        val want: Map[Long, String] = lts.zipWithIndex.map { case (t, i) =>
          val cands =
            if (fwd) rts.filter(rt => if (exact) rt >= t else rt > t)
            else rts.filter(rt => if (exact) rt <= t else rt < t)
          val best =
            if (cands.isEmpty) null
            else if (fwd) s"p${cands.min}" else s"p${cands.max}"
          i.toLong -> best
        }.toMap
        assert(got.size == want.size)
        want.foreach { case (k, v) =>
          assert(got.getOrElse(k, null) == v,
            s"round=$round parts=$parts fwd=$fwd exact=$exact lid=$k: " +
              s"got=${got.getOrElse(k, null)} want=$v")
        }
      }
    }
  }

  test("keyless fill-range equals brute-force grid under duplicate axis values") {
    val r13 = new scala.util.Random(131)
    (1 to 6).foreach { round =>
      val xs = List.fill(15 + r13.nextInt(25))(r13.nextInt(10) * 3.0)
      val maxSpan = 2.0
      for (parts <- Seq(1, 7, 32)) {
        val df = xs.zipWithIndex.map { case (x, i) => (x, i.toLong) }
          .toDF("x", "id").repartition(parts)
        val got = Missing.fillRange(df, "x", maxSpan)
          .select("x").as[Double].collect().toSeq.sorted
        // brute force: for each consecutive DISTINCT-value gap > span,
        // insert steps-1 evenly spaced points (duplicates produce one
        // lead-gap row per duplicate occurrence of the gap's left edge)
        val sortedXs = xs.sorted
        val inserted = sortedXs.zip(sortedXs.tail).flatMap { case (a, b) =>
          if (b - a > maxSpan) {
            val steps = math.ceil((b - a) / maxSpan).toInt
            (1 until steps).map(k => a + (b - a) * k / steps.toDouble)
          } else Nil
        }
        val want = (xs ++ inserted).sorted
        assert(got.size == want.size,
          s"round=$round parts=$parts got=${got.size} want=${want.size}")
        got.zip(want).foreach { case (g, w) =>
          assert(math.abs(g - w) < 1e-9, s"round=$round parts=$parts $g != $w")
        }
      }
    }
  }
}
