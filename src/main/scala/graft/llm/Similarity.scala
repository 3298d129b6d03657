package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Bounded._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the partitioned corpus, rank per query. Scale path: LSH bucketing
  * via deterministic random-hyperplane signs, so the candidate join touches
  * only same-bucket vectors; on a 1000-executor cluster the corpus stays
  * hash-partitioned by bucket and never materializes O(|Q|·|C|) pairs.
  *
  * All dot products use scaled-integer accumulation (exact, engine-portable —
  * see Reductions.isum rationale) over zip_with/aggregate expressions, which
  * stay in whole-stage codegen.
  */
object Similarity {

  private val S = 1e12

  /** Exact scaled dot product of two float-array columns, as double.
    * Routed through the fused codegen kernel (functions/VecKernels.scala)
    * — bit-identical to the previous `aggregate(zip_with(...))` composition
    * (see the kernel's scaladoc for the clause-by-clause pin), but one
    * allocation-free loop per pair instead of two array materializations.
    * Registration rides the Tables.ensureFunctions chokepoint, same as
    * graft_sum128. */
  def dotExact(a: Column, b: Column): Column =
    call_function("graft_dot_scaled", a, b)

  /** Exact scaled L2 norm (the dot kernel against itself — the composed
    * form's `transform(a, x => floor(x²·S))` is the zip_with(a, a) case). */
  def normExact(a: Column): Column =
    sqrt(call_function("graft_dot_scaled", a, a))

  def cosineExact(a: Column, b: Column): Column =
    safeCosine(dotExact(a, b), normExact(a), normExact(b))

  /** Cosine with a zero-norm guard: 0/0 would be NaN, and Spark ranks NaN
    * ABOVE every double in a descending sort — a single zero vector (padding
    * row, failed encode) would otherwise top every query's results. Null
    * sorts last under desc, which is the correct "no similarity" placement. */
  def safeCosine(dot: Column, na: Column, nb: Column): Column =
    when(na > 0 && nb > 0, dot / (na * nb))

  /** Brute-force cosine top-k: every query (broadcast) scored against every
    * corpus vector, top k per query. Corpus-side norms are precomputed once.
    * Deterministic tie-break on corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("q_norm", normExact(col("q_emb")))
    val c = graft.ops.Layout.spreadScan(corpus)
      .select(col(idCol).as("corpus_id"), col(embCol).as("c_emb"))
      .withColumn("c_norm", normExact(col("c_emb")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        safeCosine(dotExact(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** Rank-biased overlap (Webber et al. 2010, truncated form — no
    * extrapolation): agreement between two top-k rankings weighted
    * toward the top, RBO@k = (1−p)·Σ_{d=1..k} p^(d−1)·|A_d ∩ B_d|/d.
    * The overlap at depth d counts ids whose max(rank_A, rank_B) ≤ d, so
    * one join + a cumulative count over the BOUNDED depth frame computes
    * every depth at once. Weights p^(d−1) are built by repeated
    * multiplication (no libm pow — identical literals replay in SQL);
    * the k-term sum is floor-scale-12 exact so reduce order can't move
    * it. Returns one row (k, p, overlap_at_k, rbo).
    *
    * Scale note: inputs are top-k RETRIEVAL LISTS (bounded by
    * construction, the rrfFuse contract) — every frame here is ≤ k
    * rows. */
  def rboOverlap(a: DataFrame, b: DataFrame, idCol: String,
                 scoreCol: String, p: Double, k: Int): DataFrame = {
    graft.functions.VecKernels.register(a.sparkSession)
    require(p > 0.0 && p < 1.0 && k >= 1)
    val spark = a.sparkSession
    import spark.implicits._
    def ranked(df: DataFrame, rName: String) = {
      val w = Window.orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
      df.select(col(idCol).as("id"), col(scoreCol))
        .withColumn(rName, row_number().over(w))
        .filter(col(rName) <= k)
        .select(col("id"), col(rName))
    }
    val m = ranked(a, "__ra").join(ranked(b, "__rb"), "id")
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
    // weights p^(d-1) via repeated multiplication — deterministic
    val weights = {
      var w = 1.0
      (1 to k).map { d => val cur = w; w *= p; (d, cur) }
    }
    val depths = weights.toDF("d", "w")
    val terms = depths.join(m, col("__m") <= col("d"), "left")
      .groupBy(col("d"), col("w"))
      .agg(count(col("__m")).as("__ov"))
      .select(col("d"), col("__ov"),
        (col("w") * col("__ov").cast("double") / col("d").cast("double"))
          .as("__term"))
    terms.agg(
        max(when(col("d") === k, col("__ov"))).as("overlap_at_k"),
        (lit(1.0 - p) * graft.ops.Reductions.isum(col("__term"), 12))
          .as("rbo"))
      .select(lit(k).as("k"), lit(p).as("p"), col("overlap_at_k"),
        col("rbo"))
  }

  /** k-nearest-neighbor classification over an embedding column: each
    * query vector takes the majority label among its k nearest corpus
    * vectors by exact cosine. Vote ties break deterministically by
    * (votes DESC, best (lowest) rank ASC, label ASC) — total, and
    * replayable in SQL. Returns
    * (query_id, true_label, pred_label, votes, correct).
    *
    * This is the exact brute-force baseline (same plan as
    * [[bruteForceTopK]]: corpus scan × broadcast queries, one window
    * top-k); at scale the corpus side swaps to the IVF candidate path
    * ([[ivfTopKPortable]]'s probed-cell join) exactly as hardNegatives
    * documents — the vote step is unchanged since it only sees k rows
    * per query. */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int,
                  idCol: String = "vec_id", embCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("true_label"), col(embCol).as("q_emb"))
      .withColumn("q_norm", normExact(col("q_emb")))
    val c = graft.ops.Layout.spreadScan(corpus).select(col(idCol).as("corpus_id"),
        col(labelCol).as("c_label"), col(embCol).as("c_emb"))
      .withColumn("c_norm", normExact(col("c_emb")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        safeCosine(dotExact(col("q_emb"), col("c_emb")),
          col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val votes = topk.groupBy(col("query_id"), col("true_label"),
        col("c_label"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("best_rank").asc, col("c_label").asc)
    votes.withColumn("__vr", row_number().over(vw))
      .filter(col("__vr") === 1)
      .select(col("query_id"), col("true_label"),
        col("c_label").as("pred_label"), col("votes"),
        (col("c_label") === col("true_label")).as("correct"))
  }

  /** HARD-NEGATIVE MINING for contrastive/embedding training data: for each
    * query vector, the k most-similar corpus vectors with a DIFFERENT
    * label — the "looks like it but isn't" examples a retrieval or
    * classification trainer wants as negatives (the standard ANCE/DPR prep
    * step). Same plan as [[bruteForceTopK]] plus the label-inequality
    * predicate pushed into the scoring join; at scale the corpus side swaps
    * to the IVF candidate path ([[ivfTopKPortable]]'s cell join) — this is
    * the exact-baseline form, so it is the one the oracle replays. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).as("q_label"), col(embCol).as("q_emb"))
      .withColumn("q_norm", normExact(col("q_emb")))
    val c = graft.ops.Layout.spreadScan(corpus).select(col(idCol).as("corpus_id"),
        col(labelCol).as("c_label"), col(embCol).as("c_emb"))
      .withColumn("c_norm", normExact(col("c_emb")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id") &&
        col("q_label") =!= col("c_label"))
      .withColumn("cosine",
        safeCosine(dotExact(col("q_emb"), col("c_emb")),
          col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"),
        col("c_label").as("neg_label"), col("cosine"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine N retrieval
    * rankings of the same id space into one score
    * Σ_i 1/(k + rank_i), missing-from-list contributing 0. The standard
    * way to merge lexical (BM25) and dense (cosine) retrieval without
    * score calibration. Each input frame carries (idCol, scoreCol);
    * ranks are dense row_numbers under (score DESC NULLS LAST, id ASC).
    *
    * Scale note: inputs are top-N RETRIEVAL LISTS (bounded by
    * construction — callers limit upstream), so the per-list rank window
    * is over N rows, not the corpus; the fusion join is trivially
    * broadcastable. Summation is a fixed left-to-right fold over the
    * list order — deterministic IEEE. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranking")
    graft.functions.VecKernels.register(lists.head.sparkSession)
    val ranked = lists.zipWithIndex.map { case (df, i) =>
      val w = Window.orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
      df.select(col(idCol).as("id"),
        row_number().over(w).as(s"__rank_$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    joined.select(col("id").as(idCol),
      ranked.indices.map(i =>
        coalesce(lit(1.0) / (lit(k.toDouble) + col(s"__rank_$i").cast(DoubleType)),
          lit(0.0))).reduce(_ + _).as("rrf"))
  }

  /** MMR (maximal-marginal-relevance, Carbonell & Goldstein 1998)
    * diversified selection: greedily pick `k` items maximizing
    * λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s) — the standard
    * "relevant but not redundant" re-rank for retrieval results and for
    * picking diverse exemplars out of a near-dup cluster.
    *
    * The input is a BOUNDED candidate frame (a top-N retrieval list —
    * the output of bruteForceTopK/ivfTopKPortable — never a corpus);
    * greedy MMR is inherently sequential in the selection, so the
    * candidates are collected and scored driver-side (O(N·k·dim) work,
    * refused loudly above `maxCandidates`). All similarities use the
    * same floor-scaled exact dot as the distributed ops, and the 1−λ
    * damping is computed as the literal IEEE expression `1.0 − λ`, so an
    * external engine replays every pick (oracle q161). Null rel /
    * zero-norm similarities rank last, ties break on ascending id. */
  def mmrSelect(candidates: DataFrame, idCol: String, embCol: String,
                relCol: String, k: Int, lambda: Double,
                maxCandidates: Int = 100000): DataFrame = {
    graft.functions.VecKernels.register(candidates.sparkSession)
    require(k >= 1 && lambda >= 0 && lambda <= 1)
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(col(idCol).cast(LongType), col(embCol),
        col(relCol).cast(DoubleType))
      .collectBounded(maxCandidates, "bounded candidate frame")
    require(rows.length <= maxCandidates,
      s"mmrSelect: ${rows.length} candidates exceed $maxCandidates — " +
        "pass a top-N retrieval list, not a corpus")
    case class Cand(id: Long, emb: Array[Double], rel: Option[Double])
    val cands = rows.map { r =>
      val emb: Array[Double] =
        if (r.isNullAt(1)) Array.empty
        else r.getSeq[Any](1).map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
          case x => x.toString.toDouble
        }.toArray
      Cand(r.getLong(0), emb,
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toIndexedSeq
    def normOf(a: Array[Double]): Double =
      math.sqrt(a.map(x => math.floor(x * x * S).toLong).sum / S)
    val norms = cands.map(c => c.id -> normOf(c.emb)).toMap
    def sim(a: Cand, b: Cand): Option[Double] = {
      val na = norms(a.id); val nb = norms(b.id)
      if (na > 0 && nb > 0) {
        val dot = a.emb.zip(b.emb)
          .map { case (x, y) => math.floor(x * y * S).toLong }.sum / S
        Some(dot / (na * nb))
      } else None
    }
    // (score desc nulls-last, id asc) — the same total order the SQL
    // ORDER BY ... DESC NULLS LAST, id applies
    def pick(scored: Seq[(Cand, Option[Double])]): Cand =
      scored.minBy { case (c, s) =>
        (s.isEmpty, s.map(-_).getOrElse(0.0), c.id)
      }._1
    val selected = scala.collection.mutable.ArrayBuffer[Cand]()
    if (cands.nonEmpty) {
      selected += pick(cands.map(c => c -> c.rel))
      while (selected.length < math.min(k, cands.length)) {
        val rest = cands.filterNot(c => selected.exists(_.id == c.id))
        selected += pick(rest.map { c =>
          val maxSim: Option[Double] =
            selected.toSeq.flatMap(s => sim(c, s)).maxOption
          val score = c.rel.flatMap(r =>
            maxSim.map(m => lambda * r - (1.0 - lambda) * m))
          c -> score
        })
      }
    }
    selected.zipWithIndex
      .map { case (c, i) => (i + 1, c.id) }.toSeq
      .toDF("pick_idx", idCol)
  }

  /** Deterministic pseudo-random hyperplane component w(plane, dim) ∈ [-1, 1)
    * from md5 — stable across runs and cluster sizes. Computed DRIVER-SIDE
    * once (the matrix depends only on (plane, dim), not on rows — evaluating
    * md5 per element per row would dominate the operator's cost). */
  private[graft] def planeComponent(plane: Int, dim: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${plane}_$dim".getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString.take(7)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000).toDouble / 1000.0
  }

  /** Sign-bit LSH bucket id from `planes` random hyperplanes: bucket =
    * Σ 2^p·[⟨emb, w_p⟩ > 0]. Cosine-similar vectors collide with high
    * probability; the ANN query then joins only within buckets. The
    * hyperplane matrix rides in the plan as literal arrays (planes × dim
    * doubles), leaving one multiply-add pass per row. The per-plane dot is
    * SCALED-INTEGER (floor(x·wᵢ·1e12) summed as longs) so the sign test —
    * and therefore every bucket id — is bit-identical on any engine and any
    * summation order (a plain double fold could flip sign near 0 depending
    * on add order). */
  def lshBucket(emb: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val w = array((0 until dim).map(i => lit(planeComponent(p, i))): _*)
      val dot = aggregate(
        zip_with(emb, w, (x, wi) =>
          floor(x.cast(DoubleType) * wi * lit(S)).cast(LongType)),
        lit(0L), (acc, v) => acc + v)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k via LSH buckets: queries meet only same-bucket corpus vectors
    * (the scale path — shuffle on bucket id instead of a full cross join).
    * Recall is traded for the bucket fan-in; multi-probe = union over the
    * query's bucket neighbors at hamming distance 1. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 8,
              idCol: String = "vec_id", embCol: String = "embedding",
              multiProbe: Boolean = true, dim: Int = 64): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    val c = graft.ops.Layout.spreadScan(corpus).select(col(idCol).as("corpus_id"), col(embCol).as("c_emb"))
      .withColumn("bucket", lshBucket(col("c_emb"), planes, dim))
      .withColumn("c_norm", normExact(col("c_emb")))
    val q0 = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("bucket0", lshBucket(col("q_emb"), planes, dim))
      .withColumn("q_norm", normExact(col("q_emb")))
    // multi-probe: the exact bucket + all 1-bit flips
    val probes =
      if (multiProbe)
        array((col("bucket0") +: (0 until planes).map(p =>
          col("bucket0").bitwiseXOR(lit(1L << p)))): _*)
      else array(col("bucket0"))
    val q = q0.withColumn("bucket", explode(probes)).drop("bucket0")
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        safeCosine(dotExact(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.groupBy(col("query_id"), col("corpus_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: k-means centroids as the coarse quantizer.
    * Corpus vectors are assigned to their nearest centroid (the "inverted
    * list"); queries probe the `nProbe` nearest centroids and score only
    * those lists. The standard production trade (FAISS IVF-Flat shape):
    * recall dials = nCentroids × nProbe; shuffle key = centroid id, so list
    * occupancy — not corpus size — drives the join. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 3,
              idCol: String = "vec_id", embCol: String = "embedding",
              seed: Long = 42L): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val spark = corpus.sparkSession

    // NO spreadScan (r18 A/B): the ml-KMeans fit dominates and samples;
    // spreading the corpus first measured as a net loss (q61 0.95->1.4 s)
    val corpusVec = corpus.select(col(idCol).as("corpus_id"),
      col(embCol).as("c_emb"),
      array_to_vector(col(embCol).cast("array<double>")).as("__features"))
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("centroid")
      .fit(corpusVec)
    val c = model.transform(corpusVec).drop("__features")
      .withColumn("c_norm", normExact(col("c_emb")))

    // centroid table (tiny) — broadcast to score query→centroid distances
    val cents = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray)
    }
    import spark.implicits._
    val centDf = cents.toSeq.toDF("centroid", "cent_vec")

    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
      .withColumn("q_norm", normExact(col("q_emb")))
      .crossJoin(broadcast(centDf))
      .withColumn("cdist",
        aggregate(zip_with(col("q_emb"), col("cent_vec"),
          (x, y) => (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
          lit(0.0), (a, v) => a + v))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cdist").asc)
    val probed = q.withColumn("__pr", row_number().over(wq))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("q_norm"), col("centroid"))

    val scored = probed.join(c, Seq("centroid"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        safeCosine(dotExact(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate CANDIDATE pairs above a threshold,
    * LSH-bucketed (the embedding analog of MinHash dedup).
    *
    * Pair generation is LINEAR in bucket size — representative pairing
    * (everyone links to the bucket's min id) plus adjacent pairing (everyone
    * links to its id-order predecessor), exactly the design that fixed the
    * same quadratic in TextDedup.minhashCandidatePairs: a within-bucket
    * self-join is O(bucket²) = O(n²/2^planes) pair rows — a cartesian in
    * disguise once duplicate clusters exist. The rep+adjacent chain still
    * links every near-dup into a connected component for dedupGroups, at
    * O(bucket) pairs. Dial `planes` up with corpus size (buckets ≈ 2^planes;
    * keep expected bucket occupancy roughly constant).
    *
    * Single-pass shape: the partner's embedding/norm are CARRIED through the
    * one bucket-window shuffle (`first` over the id-ordered window is the
    * bucket min's value; `lag` is the predecessor's), so there is no join
    * back to the corpus, no second scan, and — unlike the former
    * persist-based design — no session-lifetime cache. One shuffle total,
    * keyed by bucket. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double, planes: Int = 8,
                         idCol: String = "vec_id",
                         embCol: String = "embedding", dim: Int = 64): DataFrame = {
    graft.functions.VecKernels.register(df.sparkSession)
    val v = graft.ops.Layout.spreadScan(df)
      .select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("bucket", lshBucket(col("emb"), planes, dim))
      .withColumn("norm", normExact(col("emb")))
    val wbOrd = Window.partitionBy(col("bucket")).orderBy(col("id"))
    // ordered by id, the partition's first row IS the bucket's min (the rep)
    val linked = v
      .withColumn("rep", first(col("id")).over(wbOrd))
      .withColumn("rep_emb", first(col("emb")).over(wbOrd))
      .withColumn("rep_norm", first(col("norm")).over(wbOrd))
      .withColumn("prev", lag(col("id"), 1).over(wbOrd))
      .withColumn("prev_emb", lag(col("emb"), 1).over(wbOrd))
      .withColumn("prev_norm", lag(col("norm"), 1).over(wbOrd))
    linked
      .select(col("id"), col("emb"), col("norm"),
        explode(array(
          struct(col("rep").as("id_a"), col("rep_emb").as("emb_a"),
            col("rep_norm").as("norm_a")),
          struct(col("prev").as("id_a"), col("prev_emb").as("emb_a"),
            col("prev_norm").as("norm_a")))).as("p"))
      .filter(col("p.id_a").isNotNull && col("p.id_a") =!= col("id"))
      .select(col("p.id_a").as("id_a"), col("id").as("id_b"),
        safeCosine(dotExact(col("p.emb_a"), col("emb")),
          col("p.norm_a"), col("norm")).as("cosine"))
      // rep and prev coincide for the bucket's second row — same pair twice
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= threshold)
  }

  /** Squared L2 distance between two double-array columns, folded
    * left-to-right over dims in IEEE doubles — a fixed op sequence any
    * engine can replay (the centroid side arrives via a broadcast join of
    * the tiny centroid table; embedding the centroids as literal arrays
    * instead produced megabyte codegen functions that took seconds to
    * compile per job). */
  private def sqDist(emb: Column, cent: Column): Column =
    aggregate(
      zip_with(emb, cent, (x, y) =>
        (x.cast(DoubleType) - y) * (x.cast(DoubleType) - y)),
      lit(0.0), (a, v) => a + v)

  private def centroidFrame(spark: org.apache.spark.sql.SparkSession,
                            cents: Seq[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.map { case (ci, a) => (ci, a.toSeq) }.toDF("centroid", "cent_vec")
  }

  /** Per-row nearest-centroid id: a PROJECTION, not a join — the centroid
    * matrix rides as ONE ArrayType literal (`typedLit`), so the expression
    * tree and generated code are constant-size regardless of nCentroids
    * (the historical Janino blowup came from expanding per-element literal
    * expressions, not from a single array literal), and assignment needs no
    * crossJoin row expansion and no groupBy(id) shuffle — the corpus never
    * reshuffles for assignment at any scale. Distances use the same
    * ascending-dim [[sqDist]] fold; ties go to the lower centroid index
    * (strict `<` while scanning indices ascending). */
  private[graft] def argminCentroid(emb: Column,
                                    cents: Seq[(Int, Array[Double])]): Column = {
    val ordered = cents.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices,
      s"centroid ids must be 0..${ordered.size - 1}")
    val mat = typedLit(ordered.map(_._2.toSeq))
    // seed with centroid 0 (not a -1 sentinel): an all-NaN distance row —
    // e.g. an embedding containing NaN — then stays assigned to centroid 0,
    // matching the former min(struct) aggregation's NaN ordering, instead
    // of silently vanishing from every inverted list via c = -1
    if (ordered.size == 1) lit(0) // sequence(1, 0) would run DESCENDING
    else aggregate(sequence(lit(1), lit(ordered.size - 1)),
      struct(sqDist(emb, element_at(mat, 1)).as("d"), lit(0).as("c")),
      (acc, ci) => {
        val d = sqDist(emb, element_at(mat, ci + 1))
        when(d < acc.getField("d"), struct(d.as("d"), ci.as("c")))
          .otherwise(acc)
      }).getField("c")
  }

  /** Kernel-backed nearest-centroid assignment — [[argminCentroid]] is the
    * executable spec (its `aggregate` fold is CodegenFallback and runs
    * interpreted per row; LlmOpsSpec pins kernel == HOF incl. the NaN→0
    * seed). A centroid set IS a single-subspace PQ codebook, so this
    * reuses [[graft.functions.PqKernels.encode]] and takes element 1 of the
    * one-element code array. Registration captures the centroid values, so
    * call sites re-register per fit iteration. */
  private def argminCentroidKernel(spark: org.apache.spark.sql.SparkSession,
                                   emb: Column,
                                   cents: Seq[(Int, Array[Double])]): Column = {
    val ordered = cents.sortBy(_._1)
    require(ordered.map(_._1) == ordered.indices,
      s"centroid ids must be 0..${ordered.size - 1}")
    graft.functions.PqKernels.register(spark, Seq(ordered.map(_._2).toSeq))
    element_at(call_function("graft_pq_encode", emb), 1)
  }

  /** Deterministic, engine-portable k-means coarse quantizer — the fit step
    * of [[ivfTopKPortable]]. Every step is a pure function of the data, so
    * the fit reproduces bit-for-bit on any partitioning, cluster size, or
    * engine (q61's DuckDB oracle replays it):
    *  - init: the `nCentroids` corpus vectors with the smallest
    *    (md5(id), id) — a seedless reproducible "random" pick;
    *  - assignment: [[argminCentroid]] — a per-row projection over a single
    *    centroid-matrix literal, ties to the lower centroid index; NO join,
    *    NO shuffle, and no per-centroid row expansion;
    *  - update: per-dim exact Int128 sums of floor(x·10⁶) (order-independent)
    *    through the fixed (sum/10⁶)/n double sequence; empty clusters keep
    *    their center;
    *  - a FIXED iteration count (no data-dependent stop).
    * Per iteration: one aggregation shuffling nCentroids·dim partial sums,
    * O(nCentroids·dim) scalars to the driver. MLlib's KMeans ([[ivfTopK]])
    * remains the library alternative; its float-merge-order dependence is
    * why it cannot be oracle-checked. */
  def kmeansPortable(corpus: DataFrame, nCentroids: Int, iters: Int,
                     idCol: String = "vec_id",
                     embCol: String = "embedding",
                     fitFraction: Double = 1.0): Seq[(Int, Array[Double])] = {
    graft.functions.VecKernels.register(corpus.sparkSession)
    require(nCentroids >= 1 && iters >= 0)
    require(fitFraction > 0 && fitFraction <= 1.0,
      s"fitFraction must be in (0,1], got $fitFraction")
    // The SCALE knob: with fitFraction < 1 the quantizer trains on a
    // deterministic md5-Bernoulli sample (h mod 10⁶ < fitFraction·10⁶ —
    // value-derived, so the sample and therefore the centroids are identical
    // on any partitioning/engine, q121 oracle). Centroid quality needs
    // samples-per-centroid, not the corpus: at 10⁹ vectors a 1% fit pays
    // 100× less per iteration and assigns the full corpus exactly once at
    // the end — the standard IVF train-on-sample design.
    // NO spreadScan here (r18 A/B): the fit collects a SAMPLE to the
    // driver — a pre-sample shuffle of the full corpus is pure loss
    val vh = corpus
      .select(col(idCol).cast(LongType).as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("h", TextDedup.h60(col("id").cast(StringType)))
    val v = (if (fitFraction >= 1.0) vh
             else vh.filter(pmod(col("h"), lit(1000000L)) <
               math.round(fitFraction * 1e6)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Seq[(Int, Array[Double])] =
      v.orderBy(col("h"), col("id")).limit(nCentroids)
        .select(col("emb")).collectBounded(nCentroids, "O(k) centroid init").toSeq
        .map(_.getSeq[Double](0).toArray).zipWithIndex.map(_.swap)
    require(cents.nonEmpty, "fit sample is empty — raise fitFraction")
    val spark = corpus.sparkSession
    for (_ <- 1 to iters) {
      val sums = v.withColumn("centroid",
          argminCentroidKernel(spark, col("emb"), cents))
        .select(col("centroid"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("centroid"), col("pos"))
        .agg(graft.ops.Reductions.isum(col("x"), 6).as("s"),
          count(lit(1)).as("n"))
        .collectBounded(1 << 22, "O(k*d) centroid sums")
      val byCent = sums.groupBy(_.getAs[Int]("centroid"))
      cents = cents.map { case (ci, old) =>
        byCent.get(ci) match {
          case None => (ci, old)
          case Some(rows) =>
            val n = rows.head.getAs[Long]("n").toDouble
            val arr = old.clone()
            rows.foreach(r => arr(r.getAs[Int]("pos")) = r.getAs[Double]("s") / n)
            (ci, arr)
        }
      }
    }
    v.unpersist()
    cents
  }

  /** Embedding outlier detection against per-label centroids: distance of
    * every vector to its label's mean embedding, flagged when it exceeds
    * mean + z·σ of the label's distance distribution — the standard
    * embedding-space QA pass for labeled corpora (mislabeled / corrupted
    * vectors sit in the tail). Everything is aggregation + broadcast join:
    * centroids are a groupBy over (label, dim) — O(labels·dim) rows, never
    * collected — and the mean/σ gate is a second tiny aggregate, so no
    * window, no sort, no driver readout anywhere; the corpus is scanned
    * twice and shuffled zero times (both joins broadcast).
    *
    * Determinism: per-dim centroid means and the distance sums use
    * floor-scaled exact integer sums (order-independent on any partition
    * layout), and every remaining step is an IEEE-exact op, so the flags
    * replay bit-identically in SQL. */
  def centroidOutliers(df: DataFrame, idCol: String = "vec_id",
                       embCol: String = "embedding",
                       labelCol: String = "label",
                       z: Double = 2.0): DataFrame = {
    graft.functions.VecKernels.register(df.sparkSession)
    val e = graft.ops.Layout.spreadScan(df).select(col(idCol), col(labelCol),
      col(embCol).cast("array<double>").as("__e"))
    val cent = e
      .select(col(labelCol), posexplode(col("__e")).as(Seq("__i", "__x")))
      .groupBy(col(labelCol), col("__i"))
      .agg((sum(floor(col("__x") * lit(1e6)).cast(DecimalType(30, 0)))
        .cast(DoubleType) / lit(1e6) / count(lit(1))).as("__m"))
      .groupBy(col(labelCol))
      .agg(transform(array_sort(collect_list(struct(col("__i"), col("__m")))),
        s => s.getField("__m")).as("__cent"))
    val dist = e.join(broadcast(cent), labelCol)
      .withColumn("sq_dist",
        aggregate(zip_with(col("__e"), col("__cent"),
          (x, c) => floor((x - c) * (x - c) * lit(1e6)).cast(LongType)),
          lit(0L), (a, v) => a + v).cast(DoubleType) / lit(1e6))
    val stats = dist.groupBy(col(labelCol).as("__lbl"))
      .agg(graft.ops.Reductions.isum(col("sq_dist"), 6).as("__s"),
        graft.ops.Reductions.isum(col("sq_dist") * col("sq_dist"), 6).as("__s2"),
        count(lit(1)).cast(DoubleType).as("__n"))
      .select(col("__lbl"), (col("__s") / col("__n")).as("__mean"),
        (col("__s2") / col("__n")).as("__msq"))
      .withColumn("__thresh", col("__mean") + lit(z) *
        sqrt(greatest(col("__msq") - col("__mean") * col("__mean"), lit(0.0))))
    dist.join(broadcast(stats), col(labelCol) === col("__lbl"))
      .select(col(idCol), col(labelCol), col("sq_dist"),
        (col("sq_dist") > col("__thresh")).as("is_outlier"))
  }

  /** IVF ANN with the portable quantizer: queries probe their `nProbe`
    * nearest centroids (same fixed-order distance fold, ties to lower
    * index), candidates are the corpus vectors assigned to those lists,
    * ranked by exact cosine. Same plan shape as [[ivfTopK]] — corpus
    * shuffles once on the centroid id; the probe table is tiny — but
    * bit-for-bit reproducible, so q61 is DuckDB-oracle-checked. */
  def ivfTopKPortable(queries: DataFrame, corpus: DataFrame, k: Int,
                      nCentroids: Int = 16, nProbe: Int = 3, iters: Int = 2,
                      idCol: String = "vec_id",
                      embCol: String = "embedding",
                      fitFraction: Double = 1.0): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    val cents = kmeansPortable(corpus, nCentroids, iters, idCol, embCol,
      fitFraction)
    val centDf = centroidFrame(corpus.sparkSession, cents)
    // final inverted-list assignment is ONE map pass over the corpus — no
    // join-back, no shuffle (the former design recomputed assignment via a
    // crossJoin(broadcast)+groupBy(id) shuffle and then joined it back)
    val c = corpus
      .select(col(idCol).cast(LongType).as("corpus_id"),
        col(embCol).as("c_emb"))
      .withColumn("centroid",
        argminCentroidKernel(corpus.sparkSession,
          col("c_emb").cast("array<double>"), cents))
      .withColumn("c_norm", normExact(col("c_emb")))
    // probe lists: nProbe nearest centroids per query (ties → lower index)
    val qv = queries.select(col(idCol).cast(LongType).as("id"),
      col(embCol).cast("array<double>").as("emb"))
    val wp = Window.partitionBy(col("id"))
      .orderBy(col("d").asc, col("centroid").asc)
    val probes = qv.crossJoin(broadcast(centDf))
      .withColumn("d", sqDist(col("emb"), col("cent_vec")))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= nProbe)
      .select(col("id").as("query_id"), col("centroid"))
    val q = queries.select(col(idCol).cast(LongType).as("query_id"),
        col(embCol).as("q_emb"))
      .join(probes, "query_id")
      .withColumn("q_norm", normExact(col("q_emb")))
    val scored = q.join(c, Seq("centroid"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine",
        safeCosine(dotExact(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** SemDeDup — semantic near-duplicate pruning over an embedding column
    * (the cluster-then-prune design of the SemDeDup paper: Abbas et al.
    * 2023, arXiv:2303.09540). The corpus is partitioned into `nClusters`
    * k-means cells by the portable quantizer (same deterministic fit as
    * [[ivfTopKPortable]]: md5-ordered seeding, floor-scaled exact centroid
    * means), and only WITHIN a cell is any pair compared: a vector whose
    * max cosine to a lower-id cell-mate reaches `tau` is marked a
    * duplicate (keep-first in id order — the paper keeps one point per
    * ε-ball; id order makes the choice deterministic on any partitioning
    * or engine). Pair work is O(Σ n_c²), not O(n²); at 100 TB `nClusters`
    * grows with the corpus (≈√n keeps cells ≈√n) and the pair frame is a
    * self-join on the cell id — one shuffle per side, no corpus-sized
    * window, nothing collected beyond the O(centroids·dim) fit readout.
    *
    * Returns one row per input vector: (idCol, cluster, max_lower_cos,
    * kept) — `max_lower_cos` null when the vector has no lower-id
    * cell-mate with a defined cosine. Reference analog: the dedup family
    * of tech.ml.dataset has no embedding-space member; this extends
    * `cosineNearDupPairs` with the clustered scale path. */
  def semDedup(df: DataFrame, nClusters: Int, tau: Double, iters: Int = 2,
               idCol: String = "vec_id", embCol: String = "embedding",
               fitFraction: Double = 1.0): DataFrame = {
    graft.functions.VecKernels.register(df.sparkSession)
    val cents = kmeansPortable(df, nClusters, iters, idCol, embCol,
      fitFraction)
    val spark = df.sparkSession
    val v = graft.ops.Layout.spreadScan(df)
      .select(col(idCol).cast(LongType).as("id"), col(embCol).as("emb"))
      .withColumn("cluster",
        argminCentroidKernel(spark, col("emb").cast("array<double>"), cents))
      .withColumn("norm", normExact(col("emb")))
    val lo = v.select(col("cluster"), col("id").as("id_a"),
      col("emb").as("emb_a"), col("norm").as("norm_a"))
    val hi = v.select(col("cluster"), col("id").as("id_b"),
      col("emb").as("emb_b"), col("norm").as("norm_b"))
    // max-aggregation instead of exists+distinct: one pass over the pair
    // frame yields both the keep bit and the nearest-lower-neighbor score
    val best = lo.join(hi, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b"),
        safeCosine(dotExact(col("emb_a"), col("emb_b")),
          col("norm_a"), col("norm_b")).as("cos"))
      .groupBy(col("id_b")).agg(max(col("cos")).as("max_lower_cos"))
    v.join(best, col("id") === col("id_b"), "left")
      .select(col("id").as(idCol), col("cluster"), col("max_lower_cos"),
        (col("max_lower_cos").isNull || col("max_lower_cos") < tau)
          .as("kept"))
  }

  /** SQ8 scalar quantization (FAISS ScalarQuantizer-QT_8bit shape): each
    * vector is scaled by its own max-|x| to int8 codes in [-127, 127] —
    * 4× smaller than float32, 8× smaller than the float64 Spark would
    * otherwise shuffle. Because cosine is scale-invariant, the per-vector
    * scale CANCELS in the quantized score, so scoring needs only integer
    * dot products: exact, summation-order-independent, engine-portable
    * (no float accumulation anywhere). floor(x+0.5) rounding rather than
    * round() keeps the halfway case identical across engines. */
  def sq8Quantize(df: DataFrame, embCol: String = "embedding",
                  out: String = "q_emb"): DataFrame = {
    graft.functions.VecKernels.register(df.sparkSession)
    val m = array_max(transform(col(embCol), x => abs(x.cast(DoubleType))))
    df.withColumn("__m", m)
      .withColumn(out,
        when(col("__m") > 0,
          transform(col(embCol), x =>
            floor(x.cast(DoubleType) * lit(127.0) / col("__m") + lit(0.5))
              .cast(LongType)))
        .otherwise(transform(col(embCol), _ => lit(0L))))
      .drop("__m")
  }

  /** Integer dot product of two int8-code columns (≤ 127²·dim ≪ 2^63). */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Brute-force top-k over SQ8 codes: the memory-bandwidth-bound scan path
    * a 100 TB corpus actually wants — the corpus-side scan touches 1/4 the
    * bytes of float32 (codes can live in memory at 4× the corpus size), and
    * every score is integer-exact so results are deterministic and
    * oracle-checkable. Queries broadcast; corpus stays partitioned. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    val q = sq8Quantize(queries, embCol)
      .select(col(idCol).as("query_id"), col("q_emb"))
      .withColumn("q_self", qdot(col("q_emb"), col("q_emb")))
    val c = sq8Quantize(corpus, embCol)
      .select(col(idCol).as("corpus_id"), col("q_emb").as("c_emb"))
      .withColumn("c_self", qdot(col("c_emb"), col("c_emb")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("qcos",
        when(col("q_self") > 0 && col("c_self") > 0,
          qdot(col("q_emb"), col("c_emb")).cast(DoubleType) /
            (sqrt(col("q_self").cast(DoubleType)) * sqrt(col("c_self").cast(DoubleType)))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc_nulls_last, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("qcos"), col("rank"))
  }

  /** Product-Quantization codebooks (Jégou et al. 2011): the embedding is
    * split into `numSub` contiguous subvectors and each subspace gets its
    * own k-means codebook, so a vector compresses to `numSub` small codes
    * (here ints; 8×64 codewords ≈ 6 bits/subspace — a 64-dim float32
    * vector becomes ~8 bytes). Training is the same deterministic portable
    * k-means recipe as [[kmeansPortable]] — md5 bottom-k init (the SAME
    * sample rows seed every subspace, as FAISS trains all subquantizers on
    * one sample), fixed-order distance folds, exact floor-scaled centroid
    * sums, fixed iterations — but ALL subspaces train in one set of jobs:
    * rows explode to (id, subspace, subvector) and each iteration is a
    * single aggregation shuffling numSub·k·dsub partial sums. Returns
    * books(m)(ci) = codeword vector; every step replays in SQL (q123).
    * `fitFraction` samples the training set exactly as kmeansPortable. */
  def pqTrainPortable(corpus: DataFrame, numSub: Int, k: Int, iters: Int,
                      idCol: String = "vec_id", embCol: String = "embedding",
                      fitFraction: Double = 1.0): Seq[Seq[Array[Double]]] = {
    graft.functions.VecKernels.register(corpus.sparkSession)
    require(numSub >= 1 && k >= 1 && iters >= 0)
    require(fitFraction > 0 && fitFraction <= 1.0)
    // NO spreadScan here (r18 A/B): the fit collects a SAMPLE to the
    // driver — a pre-sample shuffle of the full corpus is pure loss
    val vh = corpus
      .select(col(idCol).cast(LongType).as("id"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("h", TextDedup.h60(col("id").cast(StringType)))
    val fit = (if (fitFraction >= 1.0) vh
               else vh.filter(pmod(col("h"), lit(1000000L)) <
                 math.round(fitFraction * 1e6)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val initRows = fit.orderBy(col("h"), col("id")).limit(k)
      .select(col("emb")).collectBounded(k, "O(k) centroid init").map(_.getSeq[Double](0).toArray)
    require(initRows.nonEmpty, "fit sample is empty — raise fitFraction")
    val dim = initRows.head.length
    require(dim % numSub == 0, s"dim $dim not divisible by numSub $numSub")
    val dsub = dim / numSub
    var books: Seq[Seq[Array[Double]]] = (0 until numSub).map(m =>
      initRows.toSeq.map(r => r.slice(m * dsub, (m + 1) * dsub)))
    val spark = corpus.sparkSession
    // assignment via the codegen encode kernel (bit-identical to the
    // pqArgmin HOF fold — DedupKernelsSpec-style pin in LlmOpsSpec);
    // re-registered each iteration to capture the updated codebooks
    for (_ <- 1 to iters) {
      graft.functions.PqKernels.register(spark, books)
      val sums = fit
        .select(col("emb"),
          posexplode(expr("graft_pq_encode(emb)")).as(Seq("m", "ci")))
        .select(col("m"), col("ci"),
          posexplode(slice(col("emb"), col("m") * dsub + 1, lit(dsub)))
            .as(Seq("pos", "x")))
        .groupBy(col("m"), col("ci"), col("pos"))
        .agg(graft.ops.Reductions.isum(col("x"), 6).as("s"),
          count(lit(1)).as("n"))
        .collectBounded(1 << 22, "O(m*k*dsub) codebook sums")
      val byKey = sums.map(r => ((r.getAs[Int]("m"), r.getAs[Int]("ci"))) -> r)
        .groupBy(_._1).map { case (kk, vs) => kk -> vs.map(_._2) }
      books = books.zipWithIndex.map { case (cb, m) =>
        cb.zipWithIndex.map { case (old, ci) =>
          byKey.get((m, ci)) match {
            case None => old
            case Some(rows) =>
              val n = rows.head.getAs[Long]("n").toDouble
              val arr = old.clone()
              rows.foreach(r =>
                arr(r.getAs[Int]("pos")) = r.getAs[Double]("s") / n)
              arr
          }
        }
      }
    }
    fit.unpersist()
    books
  }

  /** Nearest-codeword index for one subspace's subvector — the EXECUTABLE
    * SPEC of [[graft.functions.PqKernels.encode]] (the HOF fold is
    * CodegenFallback, so production paths use the kernel; LlmOpsSpec pins
    * kernel == HOF bit-exactly). Codebooks ride as ONE nested-array
    * `typedLit`, distances are the ascending-dim [[sqDist]] fold, ties to
    * the lower code. */
  private[graft] def pqArgmin(sv: Column, m: Column,
                              books: Seq[Seq[Array[Double]]]): Column = {
    val mat = typedLit(books.map(_.map(_.toSeq)))
    val cents = element_at(mat, m + 1)
    val k = books.head.size
    if (k == 1) lit(0)
    else aggregate(sequence(lit(1), lit(k - 1)),
      struct(sqDist(sv, element_at(cents, 1)).as("d"), lit(0).as("c")),
      (acc, ci) => {
        val d = sqDist(sv, element_at(cents, ci + 1))
        when(d < acc.getField("d"), struct(d.as("d"), ci.as("c")))
          .otherwise(acc)
      }).getField("c")
  }

  /** PQ-ADC top-k (asymmetric distance computation, cosine form): the
    * corpus is scanned as CODES — `numSub` ints per vector instead of the
    * float embedding, the memory-compression that lets a 100 TB corpus'
    * index live in RAM — while queries stay exact floats. Reconstructed
    * cosine = Σₘ dot(qₘ, codeword) / (|q|·√Σₘ|codeword|²) (subspaces are
    * orthogonal, so the reconstruction norm is exact), every fold in fixed
    * ascending order → bit-reproducible and SQL-replayable (q123). Queries
    * broadcast; the corpus never shuffles (the rank window partitions by
    * query over the top candidates only after the scan). Production note:
    * a real deployment hoists the per-query k·numSub distance table out of
    * the scan loop; the per-pair fold here is the same arithmetic in the
    * same order, chosen so the oracle replays it. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, topK: Int,
             numSub: Int = 8, k: Int = 64, iters: Int = 2,
             idCol: String = "vec_id", embCol: String = "embedding",
             fitFraction: Double = 1.0): DataFrame = {
    graft.functions.VecKernels.register(queries.sparkSession)
    val books = pqTrainPortable(corpus, numSub, k, iters, idCol, embCol,
      fitFraction)
    graft.functions.PqKernels.register(corpus.sparkSession, books)
    val enc = graft.ops.Layout.spreadScan(corpus)
      .select(col(idCol).cast(LongType).as("corpus_id"),
        col(embCol).cast("array<double>").as("c_emb"))
      .withColumn("codes", expr("graft_pq_encode(c_emb)"))
      .select(col("corpus_id"), col("codes"))
    val q = queries.select(col(idCol).cast(LongType).as("query_id"),
        col(embCol).cast("array<double>").as("q_emb"))
      .withColumn("q_norm", sqrt(aggregate(
        transform(col("q_emb"), x => x * x), lit(0.0), (a, v) => a + v)))
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("adc_cosine", expr("graft_pq_adc(q_emb, codes, q_norm)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("corpus_id"), col("adc_cosine"),
        col("rank").cast("int").as("rank"))
  }

  /** STANDALONE CLUSTER READOUT of [[kmeansPortable]] — the quantizer
    * exposed as a user-facing clustering operator: fit, assign the full
    * corpus through the codegen argmin kernel (one scan, zero joins —
    * centroids ride as literals), and report each cluster's size plus its
    * first `headDims` centroid coordinates (the full vector stays in the
    * fitted model; a 64-double column would only defeat the oracle's
    * column compare). Empty clusters report n_points = 0 with their
    * carried centroid. Returns (centroid, n_points, c1..c{headDims}). */
  def kmeansClusters(df: DataFrame, nCentroids: Int, iters: Int,
                     idCol: String = "vec_id", embCol: String = "embedding",
                     headDims: Int = 4): DataFrame = {
    graft.functions.VecKernels.register(df.sparkSession)
    require(headDims >= 1, s"headDims=$headDims")
    val spark = df.sparkSession
    val cents = kmeansPortable(df, nCentroids, iters, idCol, embCol)
    val counts = df
      .select(col(embCol).cast("array<double>").as("emb"))
      .withColumn("centroid", argminCentroidKernel(spark, col("emb"), cents))
      .groupBy(col("centroid")).agg(count(lit(1)).as("n_points"))
    val centRows = cents.sortBy(_._1).map { case (ci, arr) =>
      org.apache.spark.sql.Row.fromSeq(ci +: arr.take(headDims).toSeq) }
    val schema = StructType(
      StructField("centroid", IntegerType, nullable = false) +:
        (1 to headDims).map(i => StructField(s"c$i", DoubleType,
          nullable = true)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(centRows, 1), schema)
      .join(counts, Seq("centroid"), "left")
      .select(col("centroid") +:
        coalesce(col("n_points"), lit(0L)).as("n_points") +:
        (1 to headDims).map(i => col(s"c$i")): _*)
  }

  /** SIMPLIFIED SILHOUETTE of the [[kmeansPortable]] model: per point
    * a = distance to its nearest centroid, b = to the second-nearest,
    * s = (b−a)/max(a,b) (0 when both are 0) — the O(n·k) clustering
    * quality readout (the exact silhouette's O(n²) pairwise pass has no
    * place at corpus scale; the simplified form is the standard
    * substitute). One assignment-shaped scan: per-centroid distances via
    * the same ordered [[sqDist]] fold the fit uses, sorted as (d, cid)
    * structs so a/b are elements 1 and 2 and ties replay the fit's
    * lower-centroid rule. Cluster means are floor-scaled exact sums.
    * Returns (cluster, n_points, mean_silhouette). */
  def kmeansSilhouette(df: DataFrame, nCentroids: Int, iters: Int,
                       idCol: String = "vec_id",
                       embCol: String = "embedding"): DataFrame = {
    graft.functions.VecKernels.register(df.sparkSession)
    require(nCentroids >= 2, "silhouette needs k >= 2")
    val cents = kmeansPortable(df, nCentroids, iters, idCol, embCol)
      .sortBy(_._1)
    val mat = typedLit(cents.map(_._2.toSeq))
    val e = df.select(col(embCol).cast("array<double>").as("__e"))
    val structs = cents.map { case (ci, _) =>
      struct(sqDist(col("__e"), element_at(mat, ci + 1)).as("d"),
        lit(ci).as("c"))
    }
    val sorted = array_sort(array(structs: _*))
    val aa = sqrt(element_at(sorted, 1).getField("d"))
    val bb = sqrt(element_at(sorted, 2).getField("d"))
    val sil = when(greatest(aa, bb) > 0.0, (bb - aa) / greatest(aa, bb))
      .otherwise(lit(0.0))
    e.withColumn("__cid", element_at(sorted, 1).getField("c"))
      .withColumn("__sil", sil)
      .groupBy(col("__cid"))
      .agg(count(lit(1)).as("n_points"),
        (graft.ops.Reductions.isum(col("__sil"), 6) /
          count(lit(1)).cast(DoubleType)).as("mean_silhouette"))
      .select(col("__cid").as("cluster"), col("n_points"),
        col("mean_silhouette"))
  }

  /** DOMAIN CENTROID SIMILARITY — the source×source cosine matrix over
    * per-domain mean embeddings: the "which data sources are
    * semantically close" readout that drives domain-mix decisions
    * (merge near-identical sources, upweight isolated ones) without an
    * O(corpus²) pass — the pair frame is O(domains²·dims).
    *
    * Exactness: per-dimension means come from ONE floor-scaled (10⁹)
    * exact sum per (domain, dim); the pairwise dot products fold
    * floor-scaled products, so centroid and cosine replay bit-for-bit
    * in SQL. Returns (g_a, g_b, cosine) for g_a < g_b (zero-norm
    * centroids → null cosine, the [[safeCosine]] rule). */
  def domainCentroidSimilarity(df: DataFrame, groupCol: String,
                               embCol: String = "embedding"): DataFrame = {
    graft.functions.VecKernels.register(df.sparkSession)
    val ex = graft.ops.Layout.spreadScan(df)
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).cast(StringType).as("g"),
        posexplode(col(embCol).cast("array<double>")).as(Seq("d", "x")))
    val cent = ex.groupBy(col("g"), col("d"))
      .agg((graft.ops.Reductions.isum(col("x"), 9) /
        count(lit(1)).cast(DoubleType)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = cent.select(col("g").as("g_a"), col("d"), col("c").as("__ca"))
    val b = cent.select(col("g").as("g_b"), col("d"), col("c").as("__cb"))
    val dots = a.join(b, "d")
      .filter(col("g_a") <= col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(graft.ops.Reductions.isum(col("__ca") * col("__cb"), 9)
        .as("__dot"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = dots.filter(col("g_a") === col("g_b"))
      .select(col("g_a").as("__g"), sqrt(col("__dot")).as("__n"))
    val out = dots.filter(col("g_a") < col("g_b"))
      .join(norms.select(col("__g").as("g_a"), col("__n").as("__na")), "g_a")
      .join(norms.select(col("__g").as("g_b"), col("__n").as("__nb")), "g_b")
      .select(col("g_a"), col("g_b"),
        safeCosine(col("__dot"), col("__na"), col("__nb")).as("cosine"))
      .localCheckpoint(true)
    cent.unpersist(); dots.unpersist()
    out
  }
}
