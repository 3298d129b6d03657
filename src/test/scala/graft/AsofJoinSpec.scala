package graft

import org.apache.spark.sql.functions._

import graft.ops.Joins

/** As-of join semantics vs a hand-computed sequential oracle — the reference's
  * 5 ops (:< :<= :nearest :>= :>) on a crafted keyed frame
  * (reference join.clj:747-799). */
class AsofJoinSpec extends SparkSuite {
  init()
  import spark.implicits._

  // left: key A times 5,10,15 ; key B times 5
  private lazy val left = Seq(("A", 5L), ("A", 10L), ("A", 15L), ("B", 5L))
    .toDF("k", "t")
  // right: key A quotes at 4,10,14 ; key B none
  private lazy val right = Seq(("A", 4L, 1.0), ("A", 10L, 2.0), ("A", 14L, 3.0))
    .toDF("k", "rt", "px")

  private def run(dir: Joins.AsofDirection, exact: Boolean): Map[(String, Long), Option[Double]] =
    Joins.asofJoin(left, right, "t", "rt", Seq(("k", "k")), dir, exact)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("t")) ->
        Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double]))
      .toMap

  test("backward <= (allow exact)") {
    val m = run(Joins.Backward, exact = true)
    assert(m(("A", 5L)) == Some(1.0))   // 4 <= 5
    assert(m(("A", 10L)) == Some(2.0))  // exact 10
    assert(m(("A", 15L)) == Some(3.0))  // 14
    assert(m(("B", 5L)) == None)        // no right rows for B
  }

  test("backward strict <") {
    val m = run(Joins.Backward, exact = false)
    assert(m(("A", 10L)) == Some(1.0))  // exact 10 excluded → 4
  }

  test("forward >= (allow exact)") {
    val m = run(Joins.Forward, exact = true)
    assert(m(("A", 5L)) == Some(2.0))   // next at 10
    assert(m(("A", 10L)) == Some(2.0))  // exact
    assert(m(("A", 15L)) == None)       // nothing after 15
  }

  test("forward strict >") {
    val m = run(Joins.Forward, exact = false)
    assert(m(("A", 10L)) == Some(3.0))  // exact excluded → 14
  }

  test("nearest picks closest (forward wins equidistant ties)") {
    val m = run(Joins.Nearest, exact = true)
    assert(m(("A", 5L)) == Some(1.0))   // |5-4|=1 < |10-5|=5
    assert(m(("A", 15L)) == Some(3.0))  // |15-14|=1
    // t=10: exact backward match distance 0
    assert(m(("A", 10L)) == Some(2.0))
  }

  test("payload rows carried atomically — null fields are not back-filled") {
    // right rows: (t=1, v=10), (t=2, v=null); left t=3 matches the t=2 ROW
    // whose v must stay null (not be torn from the t=1 row)
    val l = Seq(("A", 3L)).toDF("k", "t")
    val r = Seq(("A", 1L, Some(10.0)), ("A", 2L, None)).toDF("k", "rt", "px")
    val out = Joins.asofJoin(l, r, "t", "rt", Seq(("k", "k")), Joins.Backward)
      .collect()(0)
    assert(out.getAs[Long]("rt") == 2L)
    assert(out.isNullAt(out.fieldIndex("px")), "null field torn from older row")
  }

  test("colliding time column names get backtick-safe right. prefix") {
    val l = Seq(("A", 5L, "x")).toDF("k", "ts", "v")
    val r = Seq(("A", 4L, "y")).toDF("k", "ts", "v")
    val out = Joins.asofJoin(l, r, "ts", "ts", Seq(("k", "k")), Joins.Backward)
    assert(out.columns.contains("right.ts") && out.columns.contains("right.v"))
    val row = out.collect()(0)
    assert(row.getAs[Long]("right.ts") == 4L && row.getAs[String]("right.v") == "y")
  }

  test("null times match nothing (reference nil-matches-nothing semantics)") {
    val l = Seq(("A", Some(5L)), ("A", None)).toDF("k", "t")
    val r = Seq(("A", Some(4L), 1.0), ("A", None, 99.0)).toDF("k", "rt", "px")
    val out = Joins.asofJoin(l, r, "t", "rt", Seq(("k", "k")), Joins.Backward)
      .collect().map(row => Option(row.getAs[Any]("t")) ->
        Option(row.getAs[Any]("px"))).toMap
    assert(out(Some(5L)) == Some(1.0))  // normal match, null right row ignored
    assert(out(None) == None)           // null left time → no match
  }

  test("null by-keys match nothing (object-space nil ≠ nil)") {
    val l = Seq((Some("A"), 5L), (None: Option[String], 5L)).toDF("k", "t")
    val r = Seq((Some("A"), 4L, 1.0), (None: Option[String], 4L, 99.0))
      .toDF("k", "rt", "px")
    val out = Joins.asofJoin(l, r, "t", "rt", Seq(("k", "k")), Joins.Backward)
      .collect().map(row => Option(row.getAs[String]("k")) ->
        Option(row.getAs[Any]("px"))).toMap
    assert(out(Some("A")) == Some(1.0))
    assert(out(None) == None) // null key must NOT match the null-key right row
  }

  test("matches DuckDB-style asof on the events table (strict backward)") {
    // mirror of q14: every matched p_event must be a strictly-earlier purchase
    val out = Queries.queries("q14_asof_join")(spark, sfDir)
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val joined = out.filter(col("p_event_id").isNotNull)
      .join(ev.select(col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user")), "p_event_id")
      .join(ev.select(col("event_id"), col("ts")), "event_id")
    assert(joined.filter(col("p_ts") >= col("ts") || col("p_user") =!= col("user_id")).count() == 0)
  }

  test("pointInIntervalJoin: binned plan equals the nested-loop semantics") {
    val pts = Seq((1L, 0L), (2L, 5L), (3L, 7L), (4L, 13L), (5L, 21L), (6L, 22L))
      .toDF("pid", "p")
    val ivs = Seq(
      (10L, 0L, 7L),    // [0,7): catches 0, 5
      (11L, 5L, 25L),   // [5,25): spans 4 bins of width 7 — catches 5,7,13,21,22
      (12L, 7L, 7L),    // empty: matches nothing
      (13L, 20L, 22L)   // [20,22): boundary — 21 in, 22 out (end exclusive)
    ).toDF("iid", "s", "e")
    val out = Joins.pointInIntervalJoin(pts, ivs, col("p"), col("s"), col("e"),
        binWidth = 7)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (pid, p) <- Seq((1L, 0L), (2L, 5L), (3L, 7L), (4L, 13L), (5L, 21L), (6L, 22L))
      (iid, s, e) <- Seq((10L, 0L, 7L), (11L, 5L, 25L), (12L, 7L, 7L), (13L, 20L, 22L))
      if p >= s && p < e
    } yield (pid, iid)).toSet
    assert(out == expected)
    // by-key variant restricts matches to equal keys
    val ptsK = pts.withColumn("k", col("pid") % 2)
    val ivsK = ivs.withColumn("ik", lit(1L))
    val keyed = Joins.pointInIntervalJoin(ptsK, ivsK, col("p"), col("s"), col("e"),
        binWidth = 7, pointKeys = Seq(col("k")), intervalKeys = Seq(col("ik")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keyed == expected.filter { case (pid, _) => pid % 2 == 1 })
  }

  test("pointInIntervalJoin: fractional bounds replicate into the last bin") {
    // end=7.5 with binWidth=7: points in [7.0,7.5) live in bin 1 — the
    // floor((end-1)/W) formulation replicated the interval only into bin 0
    // and silently dropped them.
    val pts = Seq((1L, 7.2), (2L, 7.6), (3L, 0.5), (4L, 6.9)).toDF("pid", "p")
    val ivs = Seq((10L, 0.0, 7.5), (11L, 6.5, 7.1)).toDF("iid", "s", "e")
    val out = Joins.pointInIntervalJoin(pts, ivs, col("p"), col("s"), col("e"),
        binWidth = 7)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (pid, p) <- Seq((1L, 7.2), (2L, 7.6), (3L, 0.5), (4L, 6.9))
      (iid, s, e) <- Seq((10L, 0.0, 7.5), (11L, 6.5, 7.1))
      if p >= s && p < e
    } yield (pid, iid)).toSet
    assert(out == expected)
    assert(out.contains((1L, 10L))) // the previously-dropped match
  }

  test("keyless as-of (all 5 ops) == sequential brute force, across " +
    "partition counts") {
    // the keyless carry is now distributed (range partitions + boundary
    // carry); brute-force every direction/strictness over data with time
    // ties on both sides and stretches with no right rows at all
    val rnd = new scala.util.Random(19)
    val lRows = (0 until 400).map(i => (i.toLong, rnd.nextInt(120).toLong))
    val rRows = (0 until 150).map(i =>
      (rnd.nextInt(40).toLong * 3, 1000.0 + i)) // times 0,3,..,117 with dups
    val l = lRows.toDF("lid", "t")
    val r = rRows.toDF("rt", "px")
    def brute(dir: String, exact: Boolean): Map[Long, Option[Double]] =
      lRows.map { case (lid, t) =>
        val cand = dir match {
          case "b" => rRows.filter(p => if (exact) p._1 <= t else p._1 < t)
          case "f" => rRows.filter(p => if (exact) p._1 >= t else p._1 > t)
          case "n" => rRows
        }
        val best: Option[(Long, Double)] = dir match {
          case "b" => if (cand.isEmpty) None else Some(cand.maxBy(_._1))
          case "f" => if (cand.isEmpty) None else Some(cand.minBy(_._1))
          case "n" => if (cand.isEmpty) None
            else Some(cand.minBy(p => (math.abs(p._1 - t), t - p._1)))
          // nearest tie → FORWARD wins (larger rt), matching the
          // reference's strict-`<` distance advance
        }
        // among equal rt duplicates any payload is a valid carry; compare
        // the matched TIME, which is deterministic
        lid -> best.map(_._1.toDouble)
      }.toMap
    for (parts <- Seq("1", "4", "13")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val cases = Seq(
          ("b", true, Joins.Backward), ("b", false, Joins.Backward),
          ("f", true, Joins.Forward), ("f", false, Joins.Forward),
          ("n", true, Joins.Nearest))
        cases.foreach { case (d, exact, dir) =>
          val got = Joins.asofJoin(l, r, "t", "rt", Seq.empty, dir, exact)
            .collect()
            .map(row => row.getAs[Long]("lid") ->
              Option(row.getAs[Any]("rt")).map(_.asInstanceOf[Long].toDouble))
            .toMap
          val want = brute(d, exact)
          assert(got.size == lRows.size, s"$d exact=$exact parts=$parts")
          lRows.foreach { case (lid, t) =>
            assert(got(lid) == want(lid),
              s"$d exact=$exact parts=$parts lid=$lid t=$t: " +
                s"got=${got(lid)} want=${want(lid)}")
          }
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("keyless as-of degenerate: all timestamps equal (single bucket)") {
    // every row lands in one value bucket — the carry must still resolve
    val l = (0 until 50).map(i => (i.toLong, 100L)).toDF("lid", "t")
    val r = Seq((100L, 7.0), (100L, 7.0)).toDF("rt", "px")
    val exact = Joins.asofJoin(l, r, "t", "rt", Seq.empty,
        Joins.Backward, allowExactMatch = true).collect()
    assert(exact.length == 50 && exact.forall(_.getAs[Double]("px") == 7.0))
    val strict = Joins.asofJoin(l, r, "t", "rt", Seq.empty,
        Joins.Backward, allowExactMatch = false).collect()
    assert(strict.length == 50 && strict.forall(_.isNullAt(
      strict.head.fieldIndex("px"))))
    val nearest = Joins.asofJoin(l, r, "t", "rt", Seq.empty,
        Joins.Nearest).collect()
    assert(nearest.length == 50 && nearest.forall(_.getAs[Double]("px") == 7.0))
  }

  test("asofJoinTolerance: far matches null the WHOLE payload atomically") {
    import spark.implicits._
    val l = Seq(("k", 10.0, 1L), ("k", 100.0, 2L), ("k", 103.0, 3L))
      .toDF("g", "t", "id")
    val r = Seq(("k", 5.0, 50.0), ("k", 99.0, 99.9)).toDF("g", "rt", "px")
    val out = Joins.asofJoinTolerance(l, r, "t", "rt", Seq(("g", "g")),
        Joins.Backward, allowExactMatch = true, tolerance = 5.0)
      .orderBy("id").collect()
    // id 1: nearest earlier rt=5, diff 5 ≤ 5 → kept
    assert(out(0).getAs[Double]("px") == 50.0)
    assert(out(0).getAs[Double]("rt") == 5.0)
    // id 2: rt=99, diff 1 → kept
    assert(out(1).getAs[Double]("px") == 99.9)
    // id 3: rt=99, diff 4 ≤ 5 kept; now tolerance 3 rejects BOTH columns
    val tight = Joins.asofJoinTolerance(l, r, "t", "rt", Seq(("g", "g")),
        Joins.Backward, allowExactMatch = true, tolerance = 3.0)
      .orderBy("id").collect()
    assert(tight(2).isNullAt(tight(2).fieldIndex("px")))
    assert(tight(2).isNullAt(tight(2).fieldIndex("rt")),
      "time column nulls too — no half-matched row")
    assert(tight(1).getAs[Double]("px") == 99.9, "near match survives")
    assert(tight(0).isNullAt(tight(0).fieldIndex("px")), "diff 5 > 3 nulled")
  }
}
