package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.ops.Bounded._

/** GPT-style sequence packing for training-data pipelines: documents are
  * concatenated in a named total order and chunked into fixed-length token
  * sequences (the standard "concatenate, then split every L tokens" packing
  * used to build LLM training batches). Each document learns its global
  * token offset and the range of training sequences it lands in — the
  * mapping a packing loader needs to locate any document's tokens.
  *
  * Scale: the global prefix sum is computed WITHOUT a single-task window.
  * `orderBy` range-partitions on the order key; one per-partition pass
  * produces partition token totals (O(partitions) rows to the driver), whose
  * running offsets are handed back into a second per-partition pass that
  * attaches each row's exclusive prefix. Same two-pass shape as
  * `TableOps.withRowIndexDistributed`. Both passes share ONE captured RDD:
  * its shuffle dependency (and the range partitioner's sampled bounds) is
  * fixed when the first job runs, so the second pass and any later
  * re-materialization see the identical partitioning via Spark's
  * shuffle-file reuse (skipped stages) — consistency without persist(), so
  * repeated calls leak no storage blocks.
  */
object SeqPack {

  /** Exclusive global prefix sum of `valueCol` (LongType, null→0) over the
    * total order `order`, attached as `name`.
    *
    * DETERMINISM: if `order` ties, within-partition row order could differ
    * between the offsets pass and a later lineage recompute (executor loss
    * replays the sort map stage), assigning different prefixes to the tied
    * rows. A deterministic whole-row hash is therefore appended as the last
    * sort key: rows tied on `order` get a fixed relative order, and rows
    * identical in every column remain interchangeable (swapping them is
    * unobservable). Callers that pass a genuinely total order (q75's
    * doc_id) are unaffected — the tiebreaker never fires. */
  def withPrefixSum(df: DataFrame, order: Seq[Column], valueCol: String,
                    name: String = "prefix_sum"): DataFrame = {
    val spark = df.sparkSession
    val tiebreak = xxhash64(df.columns.map(col).toIndexedSeq: _*)
    val sorted = df.orderBy(order :+ tiebreak.asc: _*)
    // Capture .rdd ONCE: both jobs below hang off the same shuffle
    // dependency, so the sampled range bounds cannot diverge between passes
    // and the second job reuses the first's shuffle files.
    val sortedRdd = sorted.rdd
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def v(r: Row): Long = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)
    val partSums = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += v(r)); Iterator((i, s))
    }.collectBounded(1 << 20, "O(P) partition sums").sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var s = offsets(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ s); s += v(r); out }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Pack rows into `seqLen`-token training sequences along `order`.
    * Adds: `n_tokens` (from `tokens`, null→0), `token_start` (global
    * exclusive prefix), `first_seq`/`last_seq` (training-sequence ids this
    * document's tokens straddle; empty docs get first_seq on both), and
    * `n_seqs`. All integer arithmetic — engine-portable and oracle-exact. */
  def packSequences(df: DataFrame, order: Seq[Column], tokens: Column,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val withTok = df.withColumn("n_tokens", coalesce(tokens.cast(LongType), lit(0L)))
    withPrefixSum(withTok, order, "n_tokens", "token_start")
      .withColumn("first_seq", floor(col("token_start") / seqLen))
      .withColumn("last_seq",
        when(col("n_tokens") === 0, col("first_seq"))
          .otherwise(floor((col("token_start") + col("n_tokens") - 1) / seqLen)))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
  }

  /** PER-DOCUMENT overlapping token-window chunking — the RAG-indexing /
    * context-window-preparation counterpart of [[packSequences]] (which
    * packs ACROSS documents; this one never crosses a document boundary).
    * Each doc yields ceil((n - chunk)/stride) + 1 windows of `chunkTokens`
    * whitespace tokens advancing by `strideTokens` (overlap = chunk -
    * stride); a doc at or under `chunkTokens` yields itself as one chunk,
    * and the final window is allowed to run short rather than re-reading
    * tokens before it.
    *
    * Scale: tokenize → per-row `sequence` explode → `slice`, all column
    * expressions on one map pass — no shuffle, no state; the natural plan
    * at any corpus size (chunks inherit the input partitioning). Oracle
    * q122 replays the windows verbatim. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    val toks = TextStats.tokens(col(textCol))
    // n counts split cells (empty text → one empty token), matching the SQL
    // mirror's len(regexp_split_to_array(...)) so both sides chunk alike
    val n = size(toks)
    // ceil((n-chunk)/stride)+1; the int values are tiny so the double
    // round-trip through `/` is exact
    val nChunks = when(n <= chunkTokens, lit(1)).otherwise(
      floor((n - chunkTokens + (strideTokens - 1)) / strideTokens).cast("int") + 1)
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__toks"),
          col("chunk_id") * strideTokens + 1, lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__toks"),
          col("chunk_id") * strideTokens + 1, lit(chunkTokens))).as("n_chunk_tokens"))
  }
}
