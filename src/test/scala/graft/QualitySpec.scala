package graft

import org.apache.spark.sql.functions._
import graft.ops.Quality

class QualitySpec extends SparkSuite {
  init()
  import spark.implicits._

  test("fkAudit: orphans, null keys, and clean relations are counted") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Quality.fkAudit(Seq(
      Quality.FkRelation("c->p", child, "fk", parent, "pk"))).collect()(0)
    assert(r.getAs[Long]("child_rows") == 5L)
    assert(r.getAs[Long]("null_keys") == 1L)
    assert(r.getAs[Long]("orphan_rows") == 1L)
    assert(r.getAs[Long]("orphan_keys") == 1L)
  }

  test("checkExpectations: each rule type counts its own violations") {
    val df = Seq(
      (1L, Some("a"), 5.0, "1-HIGH"),
      (2L, Some("b"), -1.0, "2-LOW"),
      (2L, Some("z"), 50.0, "bad"),
      (3L, None, Double.NaN, "3-MED")
    ).toDF("id", "cat", "x", "tag")
    val out = Quality.checkExpectations(df, Seq(
      Quality.NotNull("cat_nn", "cat"),
      Quality.NotNull("x_nn", "x"),           // NaN counts as null-ish
      Quality.InSet("cat_set", "cat", Seq("a", "b")),
      Quality.InRange("x_range", "x", 0.0, 10.0),
      Quality.MatchesRegex("tag_fmt", "tag", "[0-9]-[A-Z]+"),
      Quality.Unique("id_unique", Seq("id"))))
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("violations"), r.getAs[Boolean]("pass"))).toMap
    assert(out("cat_nn") == (1L, false))
    assert(out("x_nn") == (1L, false))
    assert(out("cat_set") == (1L, false))    // "z"; null not counted
    assert(out("x_range") == (2L, false))    // -1 and 50; NaN not counted
    assert(out("tag_fmt") == (1L, false))    // "bad"
    assert(out("id_unique") == (1L, false))  // id 2 twice
  }

  test("checkExpectations: preserves suite order and passes cleanly") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val rows = Quality.checkExpectations(df, Seq(
      Quality.Unique("u", Seq("id")),
      Quality.NotNull("nn", "s"))).collect()
    // suite order, not alphabetical — Unique first as declared
    assert(rows.map(_.getAs[String]("rule")).toSeq == Seq("u", "nn"))
    assert(rows.forall(_.getAs[Boolean]("pass")))
  }

  test("driftReport: identical batches → 0 TVD; shifted batch → large TVD") {
    import spark.implicits._
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val same = Quality.driftReport(ref, ref, "v", bins = 10).collect()(0)
    assert(same.getAs[Double]("tvd") == 0.0)
    assert(same.getAs[Double]("chi2_drift") == 0.0)
    // current lives entirely in the reference's top decile
    val cur = (901 to 1000).map(_.toDouble).toDF("v")
    val drift = Quality.driftReport(ref, cur, "v", bins = 10).collect()(0)
    assert(drift.getAs[Long]("n_cur") == 100L)
    // TVD = 0.5·(9·0.1 + |1−0.1|) = 0.9
    assert(math.abs(drift.getAs[Double]("tvd") - 0.9) < 1e-9)
    assert(drift.getAs[Double]("chi2_drift") > 100.0)
  }

  test("benfordAudit: digits extracted across magnitudes; zero rows dropped") {
    val df = Seq(123.45, 0.00456, 9.0, 912.0, 1.0e-13, 0.0, -234.0)
      .toDF("v")
    val rows = Quality.benfordAudit(df, "v").collect()
    assert(rows.length == 9)
    val n = rows.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    // 1e-13 underflows the scale-12 rendering → dropped; 0.0 dropped
    assert(n(1) == 1L && n(4) == 1L && n(9) == 2L && n(2) == 1L)
    assert(n(3) == 0L && n(5) == 0L)
    val fracSum = rows.map(_.getAs[Double]("frac")).sum
    assert(math.abs(fracSum - 1.0) < 1e-12)
  }
}
