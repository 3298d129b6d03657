package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Graph

/** The r20 gated local replays ([[graft.ops.GraphLocal]]) must be
  * BIT-IDENTICAL to the distributed loops — same integer floor-div /
  * IEEE-double sequences in the same order — on directed, symmetric,
  * dangling and duplicate-edge graph shapes. Each case runs the operator
  * twice: once with `spark.graft.localGraphEdgeLimit=0` (forcing the
  * distributed path) and once with the default gate (local path), and
  * asserts row-set equality. */
class GraphLocalParitySpec extends SparkSuite {
  init()
  import spark.implicits._

  private val GateKey = "spark.graft.localGraphEdgeLimit"

  private def bothWays(f: => DataFrame): (Set[Seq[Any]], Set[Seq[Any]]) = {
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    spark.conf.set(GateKey, "0")
    val dist = try rows(f) finally spark.conf.unset(GateKey)
    val local = rows(f) // default gate (4M) → local path on these toys
    (dist, local)
  }

  // a directed graph with a sink (5), a 2-cycle, duplicate-ish structure
  private val directed = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L),
    (4L, 5L), (1L, 3L), (3L, 1L), (4L, 1L))
  // symmetric loop-free graph (both directions present) — the
  // tradingPairsGraph shape
  private val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
    (3L, 4L), (4L, 3L), (1L, 4L), (4L, 1L), (2L, 5L), (5L, 2L))

  test("labelPropagation parity: symmetric graph, several iters") {
    for (it <- Seq(1, 2, 3, 5)) {
      val (d, l) = bothWays(Graph.labelPropagation(sym.toDF("s", "t"),
        "s", "t", iters = it, assumeSymmetric = true))
      assert(d == l, s"iters=$it dist=$d local=$l")
    }
  }

  test("labelPropagation parity: asymmetric input through symmetrization") {
    val (d, l) = bothWays(Graph.labelPropagation(
      directed.toDF("s", "t"), "s", "t", iters = 3))
    assert(d == l, s"dist=$d local=$l")
  }

  test("hits parity: directed graph with sink, several iters") {
    for (it <- Seq(1, 2, 3)) {
      val (d, l) = bothWays(Graph.hits(directed.toDF("s", "t"), "s", "t",
        iters = it))
      assert(d == l, s"iters=$it dist=$d local=$l")
    }
  }

  test("hits parity: duplicate edges collapse identically") {
    val dup = directed ++ directed.take(4)
    val (d, l) = bothWays(Graph.hits(dup.toDF("s", "t"), "s", "t", iters = 3))
    assert(d == l, s"dist=$d local=$l")
  }

  test("personalizedPageRank parity: dangling + non-graph seed ignored") {
    val seeds = Seq(1L, 3L, 99L).toDF("seed") // 99 not a node
    val (d, l) = bothWays(Graph.personalizedPageRank(
      directed.toDF("s", "t"), "s", "t", seeds, "seed", iters = 4))
    assert(d == l, s"dist=$d local=$l")
  }

  test("personalizedPageRank parity: symmetric graph, no dangling") {
    val seeds = Seq(2L).toDF("seed")
    val (d, l) = bothWays(Graph.personalizedPageRank(
      sym.toDF("s", "t"), "s", "t", seeds, "seed", iters = 3,
      dedupEdges = false))
    assert(d == l, s"dist=$d local=$l")
  }

  test("bfsDistances parity: hop tags, unreached nodes, foreign source") {
    for (hops <- Seq(0, 1, 2, 5)) {
      val (d, l) = bothWays(Graph.bfsDistances(directed.toDF("s", "t"),
        "s", "t", Seq(1L, 77L), maxHops = hops))
      assert(d == l, s"hops=$hops dist=$d local=$l")
    }
  }

  test("ssspWeighted parity: parallel edges min-collapse, bounded rounds") {
    val w = Seq((1L, 2L, 5L), (1L, 2L, 3L), (2L, 3L, 1L), (3L, 4L, 2L),
      (1L, 3L, 10L), (4L, 1L, 1L), (2L, 4L, 7L))
    for (r <- Seq(1, 2, 4)) {
      val (d, l) = bothWays(Graph.ssspWeighted(w.toDF("s", "t", "w"),
        "s", "t", "w", Seq(1L), rounds = r))
      assert(d == l, s"rounds=$r dist=$d local=$l")
    }
  }

  test("harmonicCentralityKmv parity: md5 sketch rounds + estimator") {
    for ((r, k) <- Seq((1, 4), (2, 4), (3, 8))) {
      val (d, l) = bothWays(Graph.harmonicCentralityKmv(
        sym.toDF("s", "t"), "s", "t", radius = r, k = k))
      assert(d == l, s"radius=$r k=$k dist=$d local=$l")
    }
  }

  test("harmonicCentralityKmv parity: k larger than every ball (exact)") {
    val (d, l) = bothWays(Graph.harmonicCentralityKmv(
      directed.toDF("s", "t"), "s", "t", radius = 3, k = 64))
    assert(d == l, s"dist=$d local=$l")
  }

  test("neighborhoodFunction parity: per-radius sums and 90% flag") {
    for ((r, k) <- Seq((1, 4), (2, 8), (3, 64))) {
      val (d, l) = bothWays(Graph.neighborhoodFunction(
        sym.toDF("s", "t"), "s", "t", radius = r, k = k))
      assert(d == l, s"radius=$r k=$k dist=$d local=$l")
    }
  }

  test("modularity parity: partial labeling, duplicate edges in m2") {
    // duplicate edge rows count in m2 (modularity does NOT dedup);
    // node 5 is unlabeled — excluded from intra and degree mass
    val e = (sym ++ Seq((1L, 2L), (2L, 1L))).toDF("s", "t")
    val lbl = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L)).toDF("id", "c")
    val (d, l) = bothWays(Graph.modularity(e, "s", "t", lbl, "id", "c"))
    assert(d == l, s"dist=$d local=$l")
  }

  test("modularity: labels disjoint from edges keep distributed NULL semantics") {
    val e = sym.toDF("s", "t")
    val lbl = Seq((100L, 1L)).toDF("id", "c")
    val (d, l) = bothWays(Graph.modularity(e, "s", "t", lbl, "id", "c"))
    assert(d == l, s"dist=$d local=$l")
  }

  test("pageRank parity: conf gate (no caller threshold) matches distributed") {
    val (d, l) = bothWays(Graph.pageRank(directed.toDF("s", "t"), "s", "t",
      iters = 4, damp = 85))
    assert(d == l, s"dist=$d local=$l")
  }
}
