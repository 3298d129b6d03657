package graft

import org.apache.spark.sql.functions._

import graft.ops.Joins
import graft.plans.{AsofJoinExec, AsofMerge, GraftExtensions}

/** The custom Catalyst as-of operator must be plan-shaped as promised
  * (merge exec, no window machinery) and bit-agree with the composed
  * union+window implementation on adversarial inputs. */
class AsofMergeSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def collectPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // force execution so executedPlan is final (AQE)
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan)
  }

  test("plan: AsofJoinExec present, zero WindowExec, zero union") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "a"), (2L, 15L, "b"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "x"), (1L, 18L, "y"), (2L, 15L, "z"))
      .toDF("k", "rt", "rv")
    val out = AsofMerge.asofJoinMerge(l, r, "t", "rt", Seq("k" -> "k"))
    val nodes = collectPlan(out)
    assert(nodes.exists(_.isInstanceOf[AsofJoinExec]), "custom exec missing")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "merge path must not plan windows")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.UnionExec]),
      "merge path must not union the sides")
  }

  test("matches the composed asofJoin on tie-heavy fuzz (back/fwd/nearest × exact × partitions)") {
    val rnd = new scala.util.Random(4242)
    (1 to 4).foreach { _ =>
      val l = List.fill(60 + rnd.nextInt(60))(
        (rnd.nextInt(4).toLong, rnd.nextInt(15).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val r = List.fill(40 + rnd.nextInt(40))(
        (rnd.nextInt(4).toLong, rnd.nextInt(15).toLong))
        .distinct // unique (k, rt) so the expected match value is unique
        .map { case (k, t) => (k, t, s"p$k-$t") }
      for (parts <- Seq(1, 5, 32); mode <- Seq("back", "fwd", "near");
           exact <- Seq(true, false) if !(mode == "near" && !exact)) {
        val lDf = l.toDF("k", "t", "lid").repartition(parts)
        val rDf = r.toDF("k", "rt", "rv").repartition(parts)
        val dir: Joins.AsofDirection = mode match {
          case "back" => Joins.Backward
          case "fwd" => Joins.Forward
          case "near" => Joins.Nearest
        }
        val got = AsofMerge.asofJoinMerge(lDf, rDf, "t", "rt",
            Seq("k" -> "k"), forward = mode == "fwd",
            allowExactMatch = exact, nearest = mode == "near")
          .select(col("lid"), col("rv"))
          .as[(Long, String)].collect().toMap
        val want = Joins.asofJoinComposed(lDf, rDf, "t", "rt",
            by = Seq("k" -> "k"), direction = dir, allowExactMatch = exact)
          .select(col("lid"), col("rv"))
          .as[(Long, String)].collect().toMap
        assert(got.size == l.size && want.size == l.size)
        want.foreach { case (lid, rv) =>
          assert(got.getOrElse(lid, null) == rv,
            s"parts=$parts mode=$mode exact=$exact lid=$lid: " +
              s"got=${got.getOrElse(lid, null)} want=$rv")
        }
      }
    }
  }

  test("the API asofJoin routes keyed joins through the merge exec") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "x")).toDF("k", "rt", "rv")
    val out = Joins.asofJoin(l, r, "t", "rt", by = Seq("k" -> "k"))
    assert(collectPlan(out).exists(_.isInstanceOf[AsofJoinExec]),
      "keyed asofJoin must plan the Catalyst merge exec")
  }

  test("duplicate (key, time) right rows resolve deterministically across partitionings") {
    // dup groups at rt=5 and rt=12: the exec's tiebreak ordering makes
    // backward keep the LAST of a dup group (greatest remaining-column
    // order) and forward the FIRST (least) — same answer at any
    // parallelism, where an unordered sweep would depend on shuffle tie
    // order
    val l = Seq((1L, 10L, 0L), (1L, 3L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 5L, "a"), (1L, 5L, "c"), (1L, 5L, "b"),
      (1L, 12L, "x"), (1L, 12L, "z"), (1L, 12L, "y")).toDF("k", "rt", "rv")
    for (parts <- Seq(1, 3, 32)) {
      val lDf = l.repartition(parts)
      val rDf = r.repartition(parts)
      val back = AsofMerge.asofJoinMerge(lDf, rDf, "t", "rt",
          Seq("k" -> "k"))
        .select(col("lid"), col("rv")).as[(Long, String)].collect().toMap
      assert(back(0L) == "c", s"parts=$parts backward dup winner: ${back(0L)}")
      val fwd = AsofMerge.asofJoinMerge(lDf, rDf, "t", "rt",
          Seq("k" -> "k"), forward = true)
        .select(col("lid"), col("rv")).as[(Long, String)].collect().toMap
      assert(fwd(1L) == "a", s"parts=$parts forward dup winner: ${fwd(1L)}")
    }
  }

  test("mixed time types (timestamp vs timestamp_ntz) coerce like the composed plan") {
    // q250's shape: left carries timestamp, right timestamp_ntz — the
    // merge path must compare through the union-widening cast, not refuse
    val l = Seq((1L, "2024-01-01 10:00:00", 0L), (1L, "2024-01-01 12:00:00", 1L))
      .toDF("k", "ts", "lid")
      .select(col("k"), col("ts").cast("timestamp").as("t"), col("lid"))
    val r = Seq((1L, "2024-01-01 09:00:00", "a"), (1L, "2024-01-01 11:00:00", "b"))
      .toDF("k", "ts", "rv")
      .select(col("k"), col("ts").cast("timestamp_ntz").as("rt"), col("rv"))
    val got = Joins.asofJoin(l, r, "t", "rt", by = Seq("k" -> "k"))
    assert(collectPlan(got).exists(_.isInstanceOf[AsofJoinExec]),
      "mixed time types must still take the merge exec")
    val gotM = got.select(col("lid"), col("rv")).as[(Long, String)].collect().toMap
    val want = Joins.asofJoinComposed(l, r, "t", "rt", by = Seq("k" -> "k"))
      .select(col("lid"), col("rv")).as[(Long, String)].collect().toMap
    assert(gotM == want && want == Map(0L -> "a", 1L -> "b"))
    // right time column keeps its source type in the output
    assert(got.schema("rt").dataType.typeName == "timestamp_ntz")
  }

  test("null keys / null times: right never matches, left surfaces with null payload") {
    val l = Seq((Some(1L), Some(10L), 0L), (None, Some(10L), 1L),
      (Some(1L), None, 2L)).toDF("k", "t", "lid")
    val r = Seq((Some(1L), Some(5L), "m"), (None, Some(1L), "nk"),
      (Some(1L), None, "nt")).toDF("k", "rt", "rv")
    val out = AsofMerge.asofJoinMerge(l, r, "t", "rt", Seq("k" -> "k"))
      .select(col("lid"), col("rv")).as[(Long, Option[String])]
      .collect().toMap
    assert(out(0L).contains("m"))
    assert(out(1L).isEmpty, "null left key must not match")
    assert(out(2L).isEmpty, "null left time must not match")
  }

  test("output contract: colliding payload names get the right. prefix") {
    val l = Seq((1L, 10L, "L")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "R")).toDF("k", "t", "v")
    val out = AsofMerge.asofJoinMerge(l, r, "t", "t", Seq("k" -> "k"))
    assert(out.columns.toSeq == Seq("k", "t", "v", "right.t", "right.v"))
    val row = out.collect()(0)
    assert(row.getAs[String]("v") == "L" &&
      row.getAs[String]("right.v") == "R")
  }

  test("bucketed inputs: the merge plan needs NO shuffle (the union plan can't do this)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val l = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = Tables.t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ots"),
        col("o_orderkey"))
    graft.sources.Io.writeBucketed(l, "asof_l_bkt", 4, Seq("user_id"))
    graft.sources.Io.writeBucketed(r, "asof_r_bkt", 4, Seq("o_custkey"))
    try {
      val lb = spark.table("asof_l_bkt")
      val rb = spark.table("asof_r_bkt")
      val out = AsofMerge.asofJoinMerge(lb, rb, "ts", "ots",
        Seq("user_id" -> "o_custkey"))
      val nodes = collectPlan(out)
      assert(nodes.exists(_.isInstanceOf[AsofJoinExec]))
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "co-bucketed asof must plan zero exchanges:\n" +
          out.queryExecution.executedPlan.toString.take(2000))
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l_bkt")
      spark.sql("DROP TABLE IF EXISTS asof_r_bkt")
    }
  }

  test("GraftExtensions installs without error; strategy self-registers on use") {
    // buildPlannerStrategies is private[sql]; what matters operationally:
    // the extensions object applies cleanly, and the API's idempotent
    // runtime registration leaves exactly one strategy instance
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, "x")).toDF("k", "rt", "rv")
    AsofMerge.asofJoinMerge(l, r, "t", "rt", Seq("k" -> "k")).collect()
    AsofMerge.asofJoinMerge(l, r, "t", "rt", Seq("k" -> "k")).collect()
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraStrategies
    assert(exp.count(_ == graft.plans.AsofJoinStrategy) == 1)
  }
}
