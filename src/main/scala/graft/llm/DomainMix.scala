package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Domain-mixture resampling for training-data pipelines: hit a target
  * mixture over a domain column (source, language, quality bucket) by
  * down-sampling some domains and up-sampling ("multiple epochs") others —
  * the Pile/DoReMi-style domain-weights step, expressed as pure columnar
  * filtering + row replication.
  *
  * Rates are basis points of one epoch (10000 = keep exactly once,
  * 2500 = keep 25%, 15000 = one full copy plus a 50% chance of a second).
  * The fractional keep decision is an md5-derived uniform over the row's key
  * columns — a pure function of the data, so results are reproducible on any
  * cluster size/engine (oracle-checkable), and a given row's keep decision
  * never changes when the corpus around it changes.
  *
  * Scale: no shuffle at all — the filter and the `explode(sequence(...))`
  * replication are map-side; downstream shuffles operate on the resampled
  * (smaller or replicated) stream.
  */
object DomainMix {

  /** md5-derived uniform in [0, 10000) over the key columns. */
  private def uBp(keyCols: Seq[Column]): Column =
    pmod(conv(substring(md5(concat_ws("#", keyCols: _*)), 1, 15), 16, 10)
      .cast(LongType), lit(10000L))

  /** Resample to a target domain mixture. `rateBp` maps domain value →
    * basis points (see object doc); unlisted domains use `defaultBp`.
    * Output rows carry `copy_id` (0-based epoch index) — rows with zero
    * copies are dropped. */
  def sampleByDomain(df: DataFrame, domainCol: Column,
                     rateBp: Map[String, Int], defaultBp: Int,
                     keyCols: Seq[Column]): DataFrame = {
    require(defaultBp >= 0 && rateBp.values.forall(_ >= 0),
      "rates must be non-negative basis points")
    // full epochs and the fractional remainder are split driver-side so the
    // runtime arithmetic (and its oracle mirror) is two integer CASE chains
    val full = rateBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp / 10000)) {
      case (acc, (k, v)) => when(domainCol === k, v / 10000).otherwise(acc)
    }
    val frac = rateBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp % 10000)) {
      case (acc, (k, v)) => when(domainCol === k, v % 10000).otherwise(acc)
    }
    val copies = (full + when(uBp(keyCols) < frac, 1).otherwise(0)).cast(LongType)
    df.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** TEMPERATURE-BASED domain rebalancing (UniMax / T5-style α-sampling,
    * Xue et al. 2021 §3.1; Chung et al. 2023 UniMax): resample so domain
    * d's share of the output is ∝ n_d^α instead of its natural share n_d
    * — α < 1 flattens the mixture, boosting small domains (multiple
    * epochs) and trimming the head, with total output volume ≈ the input
    * volume. The expected copy count for a row of domain d is
    *   rate_d = (n_d^α / Σ_d' n_d'^α) · N / n_d
    * realized as floor(rate) full epochs plus an md5-uniform fractional
    * keep (same reproducible-draw policy as [[sampleByDomain]]/
    * [[dsirResample]] — a pure function of the doc id, engine-portable).
    *
    * The default α = 1/2 keeps the whole computation bit-portable across
    * engines: IEEE sqrt is correctly rounded everywhere, the weight sum is
    * a floor-scaled exact sum, and the final rate is one pinned IEEE op
    * sequence floored at 10⁶ (oracle q278). Other α values use pow(),
    * whose last ulp is libm-specific — deterministic within Spark, but
    * the SQL replay is only rate-approximate.
    *
    * Scale: ONE keyed count to O(domains) rows, broadcast back; the
    * replication is the map-side explode — no corpus shuffle at all.
    * Returns one row per output copy:
    * (idCol, domainCol, n_domain, rate_ppm, copy_id). */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
                        alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val cnt = df.groupBy(col(domainCol).as("__d"))
      .agg(count(lit(1)).as("__nd"))
    val w = if (alpha == 0.5) sqrt(col("__nd").cast("double"))
            else pow(col("__nd").cast("double"), lit(alpha))
    val weights = cnt.select(col("__d"), col("__nd"), w.as("__w"))
    val tot = weights.agg(sum(col("__nd")).as("__n"),
      graft.ops.Reductions.isum(col("__w"), 9).as("__s"))
    // pinned op order: w / S * N / n_d * 1e6, floored — identical sequence
    // in the SQL mirror
    val rates = weights.crossJoin(broadcast(tot))
      .select(col("__d"), col("__nd"),
        floor(col("__w") / col("__s") * col("__n").cast("double") /
          col("__nd").cast("double") * lit(1000000.0)).cast(LongType)
          .as("__ppm"))
    val u = pmod(conv(substring(md5(concat(lit("temp#"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast(LongType),
      lit(1000000L))
    df.select(col(idCol), col(domainCol))
      .join(broadcast(rates), col(domainCol) === col("__d"))
      .withColumn("__copies",
        expr("__ppm div 1000000") +
          when(u < pmod(col("__ppm"), lit(1000000L)), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("__copies") - 1)))
      .select(col(idCol), col(domainCol), col("__nd").as("n_domain"),
        col("__ppm").as("rate_ppm"), col("copy_id"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169):
    * score every document by how target-like its hashed-unigram profile is,
    * then keep it with probability equal to that score. Two smoothed
    * unigram models over `nBuckets` hashed token buckets — target rows
    * (`isTarget`) vs the rest — give each bucket a target AFFINITY
    *   a(b) = p_t(b) / (p_t(b) + p_r(b))
    *        = (c_t+1)(N_r+B) / ((c_t+1)(N_r+B) + (c_r+1)(N_t+B))
    * (add-one smoothing; the ratio form keeps every term an exact integer
    * product and ONE double division — no log, which differs in last-ulp
    * across math libraries; same policy as the bigram-LM and TF-IDF ops).
    * A document's affinity is the exact-sum mean of its tokens' bucket
    * affinities, and the resample keep is an md5-uniform draw under it —
    * reproducible on any engine/cluster, so the whole pipeline is
    * oracle-checkable.
    *
    * Scale: token→bucket is map-side; the model is ONE aggregation to
    * `nBuckets` rows (map-side combined), broadcast back; the per-doc mean
    * is a key-bucketed aggregation on the doc id. Nothing is collected;
    * the only corpus-sized shuffles carry (id, bucket) pairs. Returns
    * (idCol, n_tok, affinity, selected) for every input document. */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
                   isTarget: Column, nBuckets: Int = 4096): DataFrame = {
    val b = lit(nBuckets.toLong)
    // the repartition plants ONE shuffle whose map side pays the
    // tokenize+md5 pass; both consumers (model counts, per-doc scoring)
    // want __b partitioning, so Spark's exchange reuse computes it once —
    // without it each consumer re-tokenizes the corpus (measured 2× at
    // sf1.0)
    // degenerate-layout guard (Layout.spreadScan scaladoc): the
    // tokenize+md5 pass is the map side of the __b shuffle below and
    // must not serialize on a one-row-group scan
    val tok = graft.ops.Layout.spreadScan(df)
      .select(col(idCol).as("__id"), isTarget.as("__tgt"),
        explode_outer(TextDedup.tokens(col(textCol))).as("__tok"))
      .filter(col("__tok").isNotNull)
      .withColumn("__b", pmod(TextDedup.h28(col("__tok")), b))
      .drop("__tok")
      .repartition(col("__b"))
    val counts = tok.groupBy(col("__b"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("__cr"))
    val totals = counts.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cr")).as("__nr"))
    val aff = counts.crossJoin(broadcast(totals))
      .select(col("__b"),
        (((col("__ct") + 1L) * (col("__nr") + b)).cast("double") /
          ((col("__ct") + 1L) * (col("__nr") + b) +
            (col("__cr") + 1L) * (col("__nt") + b)).cast("double")).as("__a"))
    val perDoc = tok.join(broadcast(aff), Seq("__b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tok"),
        (graft.ops.Reductions.isum(col("__a"), 6) / count(lit(1)))
          .as("affinity"))
    val u = (pmod(conv(substring(md5(concat(lit("dsir#"),
      col("__id").cast("string"))), 1, 15), 16, 10).cast(LongType),
      lit(1000000L)).cast("double") / lit(1000000.0))
    perDoc.select(col("__id").as(idCol), col("n_tok"), col("affinity"),
      (u < col("affinity")).as("selected"))
  }
}
