package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm._
import graft.ops.TableOps._
import graft.ops.Bounded._

/** LLM-data-pipeline operator queries (dedup, similarity search, text
  * analysis, multimodal) over the documents/embeddings tables. Oracle SQL is
  * provided wherever the computation is expressible engine-portably (md5 is
  * identical in Spark and DuckDB; dot products use exact scaled-integer sums);
  * the sketch-based ops (MinHash/SimHash/LSH) get rows-only checks plus
  * ScalaTest invariants.
  */
object LlmQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // text statistics per language: exact integer sums, deterministic ratios.
    "q26_text_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_tok", TextStats.tokenCount(col("text")))
        .withColumn("n_punct", TextStats.classCount(col("text"), ".,!?;:"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast(LongType)).as("sum_tokens"),
          (sum(col("n_tok").cast(LongType)).cast(DoubleType) / count(lit(1))).as("avg_tokens"),
          sum(col("n_punct").cast(LongType)).as("sum_punct"),
          (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
        .orderBy(col("lang"))
    },

    // exact dedup via md5 fingerprint of normalized text (SURVEY §2 +
    // pipeline ops: exact dedup). Keep smallest doc_id per fingerprint.
    "q27_exact_dedup" -> { (s, dir) =>
      TextDedup.exactDedup(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("keep_id"))
    },

    // exact n-gram Jaccard similarity, all pairs in a small block (the
    // verify stage of near-dup detection; quadratic block kept tiny).
    "q28_ngram_jaccard" -> { (s, dir) =>
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text"))
      val a = d.select(col("doc_id").as("id_a"), col("text").as("text_a"))
      val b = d.select(col("doc_id").as("id_b"), col("text").as("text_b"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          TextDedup.ngramJaccard(col("text_a"), col("text_b"), 3).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // MinHash + LSH candidate pairs (the scale path for near-dup dedup).
    "q29_minhash_pairs" -> { (s, dir) =>
      TextDedup.minhashCandidatePairs(t(s, dir, "documents"), "doc_id", "text",
        shingleLen = 3, numHashes = 64, bands = 32)
        .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
        .limit(100)
    },

    // EXACT Jaccard self-join via the lossless PPJoin prefix filter — the
    // oracle is the BRUTE-FORCE pair join, so a hash match proves the
    // pruning missed nothing.
    "q306_jaccard_join" -> { (s, dir) =>
      TextDedup.jaccardJoin(t(s, dir, "documents"), "doc_id", "text",
          k = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },

    // APPROXIMATE Jaccard self-join (q306's documented escalation):
    // LSH routes, bucket cap bounds the pair mass, exact intersection
    // verifies — returned pairs are true ≥-threshold pairs (precision 1,
    // recall measured in BENCH_SF1.md). The oracle replays the banding
    // and the cap deterministically.
    "q373_jaccard_approx" -> { (s, dir) =>
      TextDedup.jaccardJoinApprox(t(s, dir, "documents"), "doc_id", "text",
          k = 3, threshold = 0.5, numHashes = 64, bands = 32,
          maxBucket = 1024)
        .orderBy(col("id_a"), col("id_b"))
    },

    // q373's bucket-cap TELEMETRY, oracle-verified: with the cap forced
    // low, the capped-bucket count, the candidate-pair mass those
    // buckets dropped, and the surviving verified-pair count are all
    // pure functions of the text (band keys are md5-derived) — so the
    // recall-decay readout a 100 TB caller asserts on is itself
    // bit-exact against the SQL replay, not just a log line.
    "q390_lsh_cap_telemetry" -> { (s, dir) =>
      val (out, st) = TextDedup.jaccardJoinApproxWithStats(
        t(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.5, numHashes = 64, bands = 32, maxBucket = 4)
      val nPairs = out.count()
      graft.ops.Checkpoints.releaseLocalCheckpoint(out)
      import s.implicits._
      Seq((st.cappedBuckets, st.droppedPairs, nPairs))
        .toDF("capped_buckets", "dropped_pairs", "surviving_pairs")
    },

    // TextRank keywords: integer fixed-point PageRank over the adjacent
    // co-occurrence token graph — tokens important because their
    // NEIGHBORS are important, not merely frequent.
    "q379_textrank" -> { (s, dir) =>
      TextStats.textRankKeywords(t(s, dir, "documents"), "text",
          minCount = 5L, iters = 3)
        .orderBy(col("rank").desc, col("token")).limit(20)
    },

    // Domain centroid cosine matrix over the embedding labels — which
    // sources are semantically close, from O(domains^2 * dims) work.
    "q382_domain_centroids" -> { (s, dir) =>
      Similarity.domainCentroidSimilarity(t(s, dir, "embeddings"), "label")
        .orderBy(col("g_a"), col("g_b"))
    },


    // Duplicate-cluster size profile — the dup-mass Pareto the dedup
    // run is sized by; exact fingerprint clusters, descending cumulate.
    "q383_dup_clusters" -> { (s, dir) =>
      TextDedup.dupClusterProfile(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("cluster_size"))
    },

    // Repetition-loop detector over a DECORATED corpus (q124 policy —
    // the synthetic docs carry no loops, so every 50th doc gets a
    // cycle-1 and a cycle-2 tail; the oracle decorates identically).
    "q384_repetition_loops" -> { (s, dir) =>
      val decorated = t(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" loop loop loop loop ab cd ab cd ab")))
          .otherwise(col("text")))
      TextStats.repetitionLoops(decorated, "doc_id", "text", maxCycle = 3)
        .orderBy(col("doc_id"))
    },


    // Mean-IDF document rarity — boilerplate vs information; df from
    // per-doc distinct tokens, instance-weighted mean idf per doc.
    "q388_mean_idf" -> { (s, dir) =>
      TextStats.meanIdf(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("id"))
    },

    // c-TF-IDF cluster term profiles (BERTopic labeling step): the top-5
    // terms that CHARACTERIZE each source, not just occur in it.
    "q308_cluster_terms" -> { (s, dir) =>
      TextStats.clusterTerms(t(s, dir, "documents"), "source", "text",
          topK = 5)
        .orderBy(col("cluster"), col("rank"))
    },

    // Edit-distance-VERIFIED near-dup pairs: LSH proposes, exact
    // prefix-Levenshtein disposes — the sketch→exact verification ladder.
    "q155_lev_dedup" -> { (s, dir) =>
      TextDedup.levenshteinVerifiedPairs(t(s, dir, "documents"),
        "doc_id", "text", shingleLen = 3, numHashes = 64, bands = 32,
        minEstJaccard = 0.2, prefixLen = 200, maxDist = 40)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Jaro-Winkler-verified near-dup pairs through the native codegen
    // kernel — two independent JW implementations must agree bit-for-bit.
    "q171_jaro_dedup" -> { (s, dir) =>
      TextDedup.jaroWinklerVerifiedPairs(t(s, dir, "documents"),
        "doc_id", "text", shingleLen = 3, numHashes = 64, bands = 32,
        minEstJaccard = 0.2, prefixLen = 80, minSim = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },

    // SimHash near-dup candidates.
    "q30_simhash_pairs" -> { (s, dir) =>
      TextDedup.simhashCandidatePairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 30)
        .orderBy(col("hamming").asc, col("id_a"), col("id_b"))
        .limit(100)
    },

    // brute-force cosine top-k over embeddings (exact, oracle-checked).
    "q31_cosine_topk" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // ANN via LSH random-hyperplane buckets (approximate scale path).
    "q32_ann_lsh" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, 3, planes = 8)
        .orderBy(col("query_id"), col("rank"))
    },

    // SQ8-quantized cosine top-k: int8 codes, integer-exact scores (the
    // per-vector scale cancels in cosine) — 4x less scan bandwidth than
    // float32 at corpus scale, deterministic on any engine.
    "q79_sq8_ann" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.sq8TopK(emb.filter(col("vec_id") < 5), emb, 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // embedding-cosine near-duplicate pairs (LSH-bucketed).
    "q33_cosine_near_dup" -> { (s, dir) =>
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.3,
        planes = 6)
        .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
        .limit(100)
    },

    // quality scoring (Gopher/C4-style heuristics), exact arithmetic.
    "q34_quality_score" -> { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          TextStats.tokenCount(col("text")).as("n_tok"),
          TextStats.qualityScore(col("text")).as("q_score"))
        .orderBy(col("doc_id"))
    },

    // language identification heuristic + accuracy vs the labeled column.
    "q35_lang_id" -> { (s, dir) =>
      TextStats.withLangId(t(s, dir, "documents"), "text")
        .selectColumns("doc_id", "lang", "pred_lang", "lang_conf")
        .orderBy(col("doc_id"))
    },

    // multimodal: binary attach → batched decode (stub) → features table.
    // REAL image decode through the correctness gate: deterministic PNGs
    // (dimensions/pixels a closed-form function of doc_id) are generated,
    // PNG-encoded, and decoded back with javax.imageio; the oracle replays
    // the pixel formula. Decoded width/height/channels and the exact R+G+B
    // sum prove the codec actually ran (PNG is lossless).
    "q36_multimodal" -> { (s, dir) =>
      Multimodal.imageFeatures(s,
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
        .orderBy(col("doc_id"))
    },

    // winnowing-style bottom-m fingerprint sketch per document. The sketch
    // is emitted as a comma-joined string: scalar output is required by the
    // oracle compare (array cells can't be sorted/hashed) and is itself a
    // useful join/group key for containment checks.
    "q37_fingerprint_sketch" -> { (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          concat_ws(",", transform(TextStats.fingerprintSketch(col("text"), 5, 8),
            x => x.cast(StringType))).as("sketch"))
        .orderBy(col("doc_id"))
    },

    // Gopher-style repetition metrics: duplicate bigram/trigram fraction +
    // most-common-bigram fraction per doc (the standard repetitious-text
    // filters). n-gram identity is the md5 shingle hash — oracle-exact.
    "q74_repetition" -> { (s, dir) =>
      TextStats.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // multimodal audio: REAL WAV decode through the correctness gate —
    // deterministic PCM (samples a closed-form function of doc_id) is
    // RIFF/WAVE-encoded and decoded back with javax.sound.sampled; the
    // oracle replays the sample formula. Exact sample sum + peak prove the
    // codec ran (PCM is lossless).
    "q85_audio" -> { (s, dir) =>
      Multimodal.audioFeatures(s,
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id")
        .orderBy(col("doc_id"))
    },

    // multimodal video: REAL container decode through the correctness
    // gate — deterministic uncompressed AVI (RIFF + DIB frames, pixels a
    // closed-form function of doc_id) round-trips the standard container
    // layout; the oracle replays the pixel formula. Compressed codecs
    // remain the one documented stub (no JVM codec).
    "q86_video" -> { (s, dir) =>
      Multimodal.videoFeatures(s,
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id")
        .orderBy(col("doc_id"))
    },

    // multimodal COMPRESSED video: MJPEG AVIs (real JPEG-per-frame
    // streams, JDK ImageIO codec both ways) through the correctness
    // gate. Dimensions/frame counts are closed-form in doc_id (the
    // oracle surface); pixel sums are JPEG-codec-defined, so they're
    // asserted in-spec against an independent decode, not here.
    "q314_mjpeg_video" -> { (s, dir) =>
      Multimodal.videoFeaturesMjpeg(s,
        t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id")
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))
    },

    // corpus TF-IDF, top term per doc (ratio idf — exact, no log; see
    // TextStats.tfIdfTopTerm Scaladoc for the scale shape).
    "q83_tfidf" -> { (s, dir) =>
      TextStats.tfIdfTopTerm(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // corpus-duplicated n-gram span fraction per doc (cross-doc dup
    // attribution — the shuffle-bounded relative of substring dedup).
    "q84_dup_ngram_spans" -> { (s, dir) =>
      TextStats.dupNgramSpanStats(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minCount = 2)
        .orderBy(col("doc_id"))
    },

    // bigram-LM fluency score (CCNet/KenLM-style perplexity signal in
    // exactly-replayable ratio form): corpus-fitted transition
    // probabilities, mean per doc.
    "q113_bigram_lm" -> { (s, dir) =>
      TextStats.bigramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // cross-corpus decontamination: flag training docs sharing any verbatim
    // 3-word shingle with the held-out benchmark slice (doc_id % 97 == 0).
    "q73_decontaminate" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      TextDedup.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", shingleLen = 3)
        .orderBy(col("doc_id"))
    },

    // Bloom-prefiltered decontamination (the no-broadcast 100 TB shape):
    // bench shingle hashes fold into one distributed BloomFilterAggregate,
    // train shingles drop through codegen'd might_contain BEFORE the shuffle,
    // exact confirm join after. Result must be IDENTICAL to q73 — the bloom
    // pass only prunes — so the oracle replays the exact-join semantics.
    "q119_bloom_decontam" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      TextDedup.decontaminateBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", shingleLen = 3, fpp = 0.01)
        .orderBy(col("doc_id"))
    },

    // Gopher rule-set filter (Rae et al. §A1.1): per-rule boolean flags +
    // keep per doc, thresholds chosen to actually split this corpus.
    "q120_gopher_rules" -> { (s, dir) =>
      TextStats.gopherQualityFlags(t(s, dir, "documents"), "doc_id", "text",
        minWords = 30, maxWords = 80, minMeanWordLen = 4.5)
        .orderBy(col("doc_id"))
    },

    // per-document overlapping token-window chunking (RAG indexing / context
    // windows): 32-token windows advancing by 24 (8-token overlap), final
    // window short, docs <= 32 tokens pass through whole. Pure map pass.
    "q122_doc_chunking" -> { (s, dir) =>
      SeqPack.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, strideTokens = 24)
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // Unicode normalization (NFC compose + accent strip): the corpus text is
    // DECORATED with decomposed combining sequences (U+0308/U+0301 riding
    // separate code points) so the oracle proves both engines implement the
    // same UAX #15 composition + Mn-strip tables — ASCII-only input would
    // make the check vacuous.
    "q124_unicode_norm" -> { (s, dir) =>
      graft.functions.TextKernels.register(s)
      t(s, dir, "documents").select(col("doc_id"),
          TextStats.stripAccents(TextStats.nfcNormalize(
            concat(lit("U\u0308ni\u0308co\u0308de\u0301 "),
              substring(col("text"), 1, 40),
              lit(" cafe\u0301")))).as("norm_text"))
        .withColumn("n_chars_norm", length(col("norm_text")))
        .orderBy(col("doc_id"))
    },

    // GPT-style sequence packing: concat docs in doc_id order, chunk into
    // 2048-token training sequences; per-doc token offset + sequence range.
    // Distributed prefix sum (no single-task window) — all integer math.
    "q75_seq_pack" -> { (s, dir) =>
      SeqPack.packSequences(
        t(s, dir, "documents").selectColumns("doc_id", "text"),
        Seq(col("doc_id")), TextStats.tokenCount(col("text")), 2048)
        .selectColumns("doc_id", "n_tokens", "token_start", "first_seq",
          "last_seq", "n_seqs")
        .orderBy(col("doc_id"))
    },

    // domain-mixture resampling (Pile/DoReMi-style domain weights): per-lang
    // epoch rates in basis points; md5-keyed fractional keeps; up-sampled
    // domains emit copy_id epochs. Aggregated per lang for the check.
    "q76_domain_mix" -> { (s, dir) =>
      DomainMix.sampleByDomain(
        t(s, dir, "documents").selectColumns("doc_id", "lang", "n_chars"),
        col("lang"),
        Map("en" -> 15000, "de" -> 10000, "fr" -> 5000, "es" -> 2500),
        defaultBp = 12500, keyCols = Seq(col("doc_id")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          max(col("copy_id")).as("max_copy"))
        .orderBy(col("lang"))
    },

    // EXACT vocabulary heavy hitters via frequent-items sketch + exact
    // recount (Reductions.heavyHittersExact): the sketch pass is O(4096)
    // memory and finds a provably complete candidate set; the second pass
    // exact-counts candidates only — no vocabulary-wide shuffle. Output is
    // exact, so the oracle is a plain GROUP BY ... HAVING.
    "q78_heavy_hitters" -> { (s, dir) =>
      val toks = graft.ops.Layout.spreadScan(t(s, dir, "documents"))
        .select(explode_outer(TextDedup.tokens(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
      graft.ops.Reductions.heavyHittersExact(toks, "token", phi = 0.002)
        .orderBy(col("cnt").desc, col("token"))
    },

    // multimodal REAL-FILE ingestion: deterministic fixture files (PNG +
    // WAV + AVI per id) are written to a scratch directory, then the
    // PRODUCTION entry point — a distributed `binaryFile` scan, glob-
    // filtered per media kind — feeds the real decoders; the oracle
    // replays the closed-form generators. This exercises the path q36/q85/
    // q86 only simulate: actual files on disk through spark.read.
    "q87_media_files" -> { (s, dir) =>
      import s.implicits._
      val ids = t(s, dir, "documents").filter(col("doc_id") < 64)
        .select(col("doc_id").cast(LongType)).as[Long].collectBounded(64, "doc_id < 64 id list").toSeq
      val tmp = java.nio.file.Files.createTempDirectory("graft_media_files")
      tmp.toFile.deleteOnExit()
      Multimodal.writeMediaFixtures(tmp, ids)
      Multimodal.mediaFileFeatures(s, tmp.toString)
        .orderBy(col("kind"), col("doc_id"))
    },

    // Okapi BM25 retrieval: top-20 documents for a fixed query-term bag
    // (rational-idf form — every step IEEE-exact, see TextStats.bm25).
    "q126_bm25" -> { (s, dir) =>
      TextStats.bm25(t(s, dir, "documents"), "doc_id", "text",
          Seq("join", "hash", "vector"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    },

    // Reciprocal-rank fusion of lexical (BM25 top-50) and dense (cosine
    // top-50 for query vector 0) retrieval — hybrid-search merging without
    // score calibration.
    "q159_rrf_fusion" -> { (s, dir) =>
      val bm = TextStats.bm25(t(s, dir, "documents"), "doc_id", "text",
          Seq("join", "hash", "vector"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        .select(col("doc_id").as("id"), col("bm25").as("score"))
      val emb = t(s, dir, "embeddings")
      val cos = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 0),
          emb, 50)
        .select(col("corpus_id").as("id"), col("cosine").as("score"))
      Similarity.rrfFuse(Seq(bm, cos), "id", "score", 60)
        .orderBy(col("rrf").desc, col("id")).limit(20)
    },

    // MMR diversified selection: 5 "relevant but not redundant" picks out
    // of the top-20 cosine candidates for query vector 0.
    "q161_mmr_select" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val cos = Similarity.bruteForceTopK(emb.filter(col("vec_id") === 0),
        emb, 20)
      val cand = cos
        .join(emb.select(col("vec_id").as("corpus_id"), col("embedding")),
          "corpus_id")
        .select(col("corpus_id").as("id"), col("embedding"),
          col("cosine").as("rel"))
      Similarity.mmrSelect(cand, "id", "embedding", "rel", 5, 0.7)
        .orderBy(col("pick_idx"))
    },

    // CCNet-style per-language perplexity thirds under the corpus bigram LM
    // (head/middle/tail, ntile(3) semantics without its single-task window).
    "q127_perplexity_buckets" -> { (s, dir) =>
      TextStats.perplexityBuckets(t(s, dir, "documents"), "doc_id", "text",
          "lang")
        .select(col("doc_id"), col("lang"), col("n_bigrams"), col("mean_p"),
          col("bucket"))
        .orderBy(col("doc_id"))
    },

    // cross-document repeated 4-gram inventory (the fixed-n shuffle-native
    // form of exact-substring duplicate mining).
    "q128_crossdoc_ngrams" -> { (s, dir) =>
      TextDedup.crossDocNgrams(t(s, dir, "documents"), "doc_id", "text",
          n = 4, minDocs = 2)
        .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("ngram"))
        .limit(200)
    },

    // exact per-language stratified 80/20 split (md5-rank deterministic).
    "q129_stratified_split" -> { (s, dir) =>
      graft.ops.Ml.stratifiedSplit(t(s, dir, "documents")
          .select(col("doc_id"), col("lang")), "doc_id", "lang", 0.8)
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy(col("doc_id"))
    },

    // sentence segmentation stats. The synthetic corpus carries no sentence
    // punctuation, so the text is DECORATED first (deterministic word→punct
    // rewrites, same in both engines) — the q124 policy: an input that
    // cannot exercise the operator would make the oracle vacuous.
    "q130_sentence_stats" -> { (s, dir) =>
      val decorated = t(s, dir, "documents").withColumn("text",
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          " slow ", ". "), " fast ", "! "), " window ", "? "))
      TextStats.sentenceStats(decorated, "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    // HTML/markup stripping — the crawl→text extraction gate. The corpus
    // is plain text, so each doc is DECORATED into an HTML payload first
    // (q124 policy: scripts/styles with angle brackets inside, attributes,
    // comments, a double-encodable entity), then stripMarkup recovers the
    // prose and markupStats reports the markup share.
    "q286_strip_markup" -> { (s, dir) =>
      val html = t(s, dir, "documents").withColumn("html",
        concat(lit("<html><head><style>p{color:red}</style></head>" +
            "<body data-id=\""),
          col("doc_id").cast(StringType),
          lit("\"><p>"),
          regexp_replace(col("text"), " the ", " &amp;the "),
          lit("</p><br/><script type=\"text/javascript\">var x = 1 < 2;" +
            "</script><!-- trailer --></body></html>")))
      TextStats.markupStats(html, "doc_id", "html")
        .orderBy(col("doc_id"))
    },

    // embedding outliers vs label centroid (mean + 2σ distance gate).
    "q131_embedding_outliers" -> { (s, dir) =>
      Similarity.centroidOutliers(t(s, dir, "embeddings"), "vec_id",
          "embedding", "label", z = 2.0)
        .select(col("vec_id"), col("label"), col("sq_dist"),
          col("is_outlier"))
        .orderBy(col("vec_id"))
    },

    // BPE ENCODE: documents to token-id sequences under the trained
    // vocabulary (dense ids in symbol sort order) — the final tokenizer
    // output a training pipeline ships.
    "q143_bpe_encode" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val (_, vocab) = Bpe.train(docs, "text", 8)
      Bpe.encode(docs.filter(col("doc_id") < 200), "doc_id", "text", vocab)
        .orderBy(col("doc_id"))
    },

    // hard-negative mining: top-3 most-similar DIFFERENT-label vectors per
    // query — the contrastive-training negatives prep (exact baseline).
    "q142_hard_negatives" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb.filter(col("vec_id") < 10), emb, 3)
        .orderBy(col("query_id"), col("rank"))
    },

    // kNN classification (k=5) of a held-out query split against the rest
    // of the corpus — exact-cosine neighbors + deterministic majority
    // vote; the label-recovery eval for an embedding space.
    "q183_knn_classify" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.knnClassify(emb.filter(col("vec_id") < 40),
          emb.filter(col("vec_id") >= 40), 5)
        .orderBy(col("query_id"))
    },

    // Collocation mining by lift (log-free PMI): the phrase-extraction
    // pass — word bigrams beating independence, integer counts with one
    // final division chain.
    "q218_collocations" -> { (s, dir) =>
      TextStats.collocations(t(s, dir, "documents"), "text", minCount = 5L)
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(100)
    },

    // Rank-biased overlap between two queries' cosine top-20 lists —
    // "how much do these two queries agree?" weighted toward the top;
    // truncated RBO with repeated-multiplication weights.
    "q205_rbo" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      def top(q: Long) = Similarity
        .bruteForceTopK(emb.filter(col("vec_id") === q), emb, 20)
        .select(col("corpus_id").as("id"), col("cosine").as("score"))
      Similarity.rboOverlap(top(0L), top(1L), "id", "score", p = 0.9, k = 20)
    },

    // Exact duplicated-span REMOVAL (the Lee-et-al dedup ACTION, not
    // just the q84 measurement): tokens covered by any corpus-repeated
    // 3-gram are stripped, survivors rejoined in position order.
    "q204_remove_dup_spans" -> { (s, dir) =>
      TextDedup.removeDupSpans(t(s, dir, "documents"), "doc_id", "text",
          n = 3, minCount = 2)
        .orderBy(col("doc_id"))
    },

    // Flesch-Kincaid readability per language: vowel-group syllable
    // proxy, sentence-run counting, the standard grade formula — pure
    // codegen regexp counting, exact-sum language means.
    "q202_readability" -> { (s, dir) =>
      t(s, dir, "documents").filter(col("lang").isNotNull)
        .withColumn("fk", TextStats.fleschKincaid(col("text")))
        .groupBy(col("lang"))
        .agg(count(col("fk")).as("n_docs"),
          (graft.ops.Reductions.isum(col("fk"), 6) / count(col("fk")))
            .as("mean_fk"),
          min(col("fk")).as("min_fk"), max(col("fk")).as("max_fk"))
        .orderBy(col("lang"))
    },

    // Tokenizer-fertility report per language: the tokens/word and
    // chars/token table a tokenizer release ships (which languages pay
    // more tokens per word under this vocab?) — BPE fit + apply + one
    // keyed aggregation over exact integer counts.
    "q198_tokenizer_fertility" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val (_, vocab) = Bpe.train(docs, "text", 8)
      Bpe.tokenCounts(docs, "doc_id", "text", vocab)
        .join(docs.select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id")
        .filter(col("lang").isNotNull)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
          sum(col("n_chars")).as("n_chars"),
          (sum(col("n_bpe_tokens")).cast(DoubleType) /
            sum(col("n_words")).cast(DoubleType)).as("tokens_per_word"),
          (sum(col("n_chars")).cast(DoubleType) /
            sum(col("n_bpe_tokens")).cast(DoubleType)).as("chars_per_token"))
        .orderBy(col("lang"))
    },

    // corpus card: the per-source audit table (docs, tokens, quality,
    // exact-dup share) a curation pipeline publishes with a release.
    "q141_corpus_report" -> { (s, dir) =>
      TextStats.corpusReport(t(s, dir, "documents"), "text", "source")
        .orderBy(col("source"))
    },

    // BPE tokenizer TRAINING: 8 greedy merges learned from the corpus
    // vocabulary (pair argmax totally ordered by count DESC, pair ASC);
    // output is the learned merge table itself.
    "q139_bpe_train" -> { (s, dir) =>
      val (merges, _) = Bpe.train(t(s, dir, "documents"), "text", 8)
      import s.implicits._
      merges.map(m => (m.idx, m.left, m.right, m.count))
        .toDF("merge_idx", "lhs", "rhs", "pair_count")
        .orderBy(col("merge_idx"))
    },

    // BPE application: per-doc token counts under the 8-merge vocabulary —
    // one broadcast join of the token stream against the trained vocab.
    "q140_bpe_tokenize" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val (_, vocab) = Bpe.train(docs, "text", 8)
      Bpe.tokenCounts(docs, "doc_id", "text", vocab)
        .orderBy(col("doc_id"))
    },

    // DSIR importance resampling: hashed-unigram target-vs-raw affinity
    // (ratio form, no log), md5-uniform keep under the doc's affinity.
    // Target domain = source 'src0'.
    "q136_dsir_resample" -> { (s, dir) =>
      DomainMix.dsirResample(t(s, dir, "documents"), "doc_id", "text",
          col("source") === "src0", nBuckets = 4096)
        .orderBy(col("doc_id"))
    },

    // UniMax/T5 temperature rebalancing at α = ½ (the bit-portable sqrt
    // case): one keyed count to O(domains) rows broadcast back, map-side
    // epoch replication, md5-uniform fractional keep.
    "q278_temperature_sample" -> { (s, dir) =>
      DomainMix.temperatureSample(t(s, dir, "documents"), "doc_id", "source")
        .orderBy(col("doc_id"), col("copy_id"))
    },

    // multi-eval-set contamination matrix: ONE hash-keyed join answers
    // per-suite contamination for every suite at once (q73's shingle
    // hashes; src0-src2 stand in for held-out benchmarks).
    "q283_contamination_matrix" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val sets = Seq("src0", "src1", "src2")
      TextDedup.contaminationMatrix(
        docs.filter(!col("source").isin(sets: _*)), "doc_id", "text",
        docs.filter(col("source").isin(sets: _*)), "source", "text",
        shingleLen = 3)
    },

    // sharded JSONL export + release manifest: md5-deterministic shard
    // assignment (cluster-size/engine independent), one shard-keyed write,
    // O(shards) manifest. The oracle replays the manifest; the files
    // themselves are round-trip-checked in LlmOpsSpec.
    "q280_export_manifest" -> { (s, dir) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q280").toString
      Export.exportJsonlShards(t(s, dir, "documents"), "doc_id", "text",
          s"$tmp/shards", nShards = 8)
        .orderBy(col("shard"))
    },

    // content-defined chunk dedup report: CDC boundaries (windowed
    // md5 ≡ 0 mod 64), chunk fingerprints, per-source duplicate-chunk
    // share — the partial-overlap dedup audit a fixed-size chunker
    // cannot provide.
    "q279_cdc_chunks" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      TextDedup.cdcChunks(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk_md5")).as("n_unique_chunks"),
          sum(col("chunk_len")).as("sum_chunk_len"),
          ((count(lit(1)) - countDistinct(col("chunk_md5")))
            .cast(DoubleType) / count(lit(1))).as("dup_share"))
        .orderBy(col("source"))
    },

    // quality-aware near-dup retention: connected components from the LSH
    // candidate graph, each keeping its best-quality member (ties → lowest
    // id) — composition of the q60 dedup machinery with the q34 scorer.
    "q135_dedup_keep_best" -> { (s, dir) =>
      val docs = t(s, dir, "documents").withColumn("q_score",
        TextStats.qualityScore(col("text")))
      TextDedup.nearDupKeepBest(docs, "doc_id", "text", "q_score",
          minEstJaccard = 0.5)
        .orderBy(col("doc_id"))
    },

    // Fuzzy MinHash-LSH join: every 50th doc, lightly perturbed (' data '
    // → ' info ') and re-keyed +1e6, probes the corpus by Jaccard — the
    // similarity-keyed join with no equality key.
    "q134_fuzzy_join" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val probes = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000L).as("probe_id"),
          expr("replace(text, ' data ', ' info ')").as("probe_text"))
      TextDedup.fuzzyJoin(docs, probes, "doc_id", "text",
          "probe_id", "probe_text", minEstJaccard = 0.5)
        .orderBy(col("left_id"), col("right_id"))
    },

    // CCNet-style line-level boilerplate removal. The corpus carries no
    // newlines, so line breaks are DECORATED in first (literal word→\n
    // rewrites, identical left-to-right replace in both engines — the
    // q124/q130 policy).
    "q133_line_dedup" -> { (s, dir) =>
      val decorated = t(s, dir, "documents").withColumn("text",
        expr("replace(replace(replace(text, ' slow ', '\n'), ' fast ', '\n'), ' window ', '\n')"))
      TextDedup.lineDedup(decorated, "doc_id", "text", minDocs = 2)
        .orderBy(col("doc_id"))
    },

    // Zipf-slope corpus health: log-log OLS over the top-500 term
    // frequencies from the house tokenizer — natural corpora sit near
    // slope −1; boilerplate floods flatten it.
    "q238_zipf" -> { (s, dir) =>
      TextStats.zipfSlope(t(s, dir, "documents"), "text", topN = 500)
    },

    // Embedding-dimension ablation (the Matryoshka question): how much
    // of the exact top-10 survives truncating 64 dims to the first 16?
    // recall@k per query from two brute-force rankings.
    "q248_dim_truncation" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val trunc = emb.withColumn("embedding", slice(col("embedding"), 1, 16))
      val full = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
        emb, 10)
      val cut = Similarity.bruteForceTopK(trunc.filter(col("vec_id") < 5),
        trunc, 10)
      full.select(col("query_id"), col("corpus_id"))
        .join(cut.select(col("query_id"), col("corpus_id"),
          lit(1L).as("__hit")), Seq("query_id", "corpus_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          coalesce(sum(col("__hit")), lit(0L)).as("overlap"),
          (coalesce(sum(col("__hit")), lit(0L)).cast(DoubleType) /
            count(lit(1))).as("recall_at_k"))
        .orderBy(col("query_id"))
    },

    // Label-centroid affinity matrix: which embedding classes sit close
    // together? Exact-sum centroids (O(labels × dims) frame), pairwise
    // centroid cosine — the clustering-confusion audit.
    "q266_label_affinity" -> { (s, dir) =>
      val comp = t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("label"), col("pos"), col("v").cast(DoubleType).as("v"))
      val cent = comp.groupBy(col("label"), col("pos"))
        .agg((graft.ops.Reductions.isum(col("v"), 9) / count(lit(1)))
          .as("c"))
      val norms = cent.groupBy(col("label"))
        .agg(sqrt(graft.ops.Reductions.isum(col("c") * col("c"), 12))
          .as("nrm"))
      val a = cent.select(col("label").as("la"), col("pos"),
        col("c").as("ca"))
      val b = cent.select(col("label").as("lb"), col("pos"),
        col("c").as("cb"))
      a.join(b, "pos").filter(col("la") < col("lb"))
        .groupBy(col("la"), col("lb"))
        .agg(graft.ops.Reductions.isum(col("ca") * col("cb"), 12).as("dot"))
        .join(broadcast(norms.select(col("label").as("la"),
          col("nrm").as("na"))), "la")
        .join(broadcast(norms.select(col("label").as("lb"),
          col("nrm").as("nb"))), "lb")
        .select(col("la"), col("lb"),
          (col("dot") / (col("na") * col("nb"))).as("cosine"))
        .orderBy(col("la"), col("lb"))
    },

    // URL canonicalization dedup: the crawl-curation kernel (fragment /
    // query-string / scheme+host case / trailing slash), per-host dup
    // recovery report. URLs are decorated deterministically from the
    // documents table (the corpus carries none) — the q133 policy.
    "q251_url_canonical" -> { (s, dir) =>
      val docs = t(s, dir, "documents").withColumn("url",
        concat(lit("HTTPS://"), upper(col("source")), lit(".Example.COM/Page/"),
          (col("doc_id") % 50).cast(StringType),
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source="), col("lang"), lit("#sec")))
      TextStats.urlDedupReport(docs, "url")
    },

    // Incremental cross-snapshot dedup: the doc_id%5==0 slice plays the
    // NEWLY-ARRIVED batch, screened against the rest of the corpus via the
    // band-join of minhash sketch indexes — the production daily-ingest
    // loop (no old-vs-old re-pairing).
    "q368_incremental_dedup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      TextDedup.incrementalMinhashDedup(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", shingleLen = 3, numHashes = 64, bands = 32,
        threshold = 0.5)
        .orderBy(col("id"))
    },

    // Unicode script profile per document — the char-class router
    // (Latin/digit/CJK/Cyrillic/space/other + dominant-script label);
    // pure codegen regexp counts, zero shuffle.
    "q417_script_profile" -> { (s, dir) =>
      TextStats.scriptProfile(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("id"))
    },

    // MinHash sketch calibration: estimated vs EXACT Jaccard over the
    // LSH candidate pairs — the error telemetry that justifies a
    // numHashes/bands budget before a 100 TB dedup run.
    "q418_minhash_calibration" -> { (s, dir) =>
      TextDedup.minhashCalibration(t(s, dir, "documents"), "doc_id",
        "text", shingleLen = 3, numHashes = 64, bands = 32)
    }
  )

  private val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** DuckDB SQL mirroring TextDedup's MinHash pipeline (same md5-derived
    * 28-bit shingle hashes, same universal-hash coefficients, same LSH
    * banding and rep+adjacent pairing), shared by q29 and q60. Yields
    * `pairs0(id_a, id_b)` + `sig(id, sig)` CTEs; callers append the final
    * select. */
  private[graft] def minhashCandidateCtes(bands: Int): String = {
    val P = TextDedup.P
    val coefs = (0 until 64).map(i =>
      (((2L * i + 1) * 2654435761L) % P, (i.toLong * 40503L + 7) % P))
    val sigElems = coefs.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a*h + $b) % $P))"
    }.mkString(", ")
    val r = 64 / bands
    require(r == 2, "band-key SQL below is written for rowsPerBand = 2")
    s"""d AS (SELECT doc_id AS id, string_split($normSql, ' ') AS w FROM documents),
       sh AS (SELECT id, CASE WHEN len(w) >= 3
           THEN list_transform(range(len(w) - 2), i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))
           ELSE [array_to_string(w, ' ')] END AS s FROM d),
       hsx AS (SELECT id, list_transform(s, g -> CAST(concat('0x', substr(md5(g), 1, 7)) AS BIGINT)) AS hs FROM sh),
       sig AS (SELECT id, [$sigElems] AS sig FROM hsx),
       banded AS (
         SELECT id, concat(CAST(j AS VARCHAR), '#', md5(concat(
           CAST(sig[CAST(j*2+1 AS INT)] AS VARCHAR), ',',
           CAST(sig[CAST(j*2+2 AS INT)] AS VARCHAR)))) AS band
         FROM sig CROSS JOIN range($bands) t(j)),
       p1 AS (SELECT id, band, min(id) OVER (PARTITION BY band) AS rep,
              lag(id) OVER (PARTITION BY band ORDER BY id) AS prev FROM banded),
       pairs0 AS (SELECT DISTINCT id_a, id_b FROM (
           SELECT rep AS id_a, id AS id_b FROM p1 WHERE id <> rep
           UNION ALL
           SELECT prev AS id_a, id AS id_b FROM p1 WHERE prev IS NOT NULL AND prev <> id) u)"""
  }

  /** DuckDB replay of Bpe.train: vocabulary chars, then per-iteration
    * pair-count argmax (count DESC, pair ASC) and a positional recursion
    * applying the greedy leftmost-nonoverlapping merge fold — the same
    * accumulator semantics as Bpe.applyMerge. Emits s1..s{n+1} (vocab
    * states) and b1..bn (chosen merges). */
  private def bpeCtes(nMerges: Int): String = {
    def iter(i: Int) =
      s"""p$i AS (SELECT syms[CAST(j AS INT)] AS x, syms[CAST(j+1 AS INT)] AS y,
             SUM(cnt) AS c
           FROM s$i CROSS JOIN range(1, 64) t(j)
           WHERE j+1 <= len(syms) GROUP BY 1, 2),
         b$i AS (SELECT x AS bx, y AS by, c FROM p$i
           ORDER BY c DESC, x, y LIMIT 1),
         am$i AS (
           SELECT w, cnt, syms, bx, by, 1 AS pos,
             CAST([] AS VARCHAR[]) AS acc
           FROM s$i CROSS JOIN b$i
           UNION ALL
           SELECT w, cnt, syms, bx, by, pos+1,
             CASE WHEN len(acc) > 0 AND acc[-1] = bx
                   AND syms[CAST(pos AS INT)] = by
               THEN list_append(acc[1:len(acc)-1], bx || by)
               ELSE list_append(acc, syms[CAST(pos AS INT)]) END
           FROM am$i WHERE pos <= len(syms)),
         s${i + 1} AS (SELECT w, cnt, acc AS syms FROM am$i
           WHERE pos = len(syms)+1)"""
    s"""w0 AS (SELECT unnest(string_split($normSql, ' ')) AS w FROM documents),
       wc AS (SELECT w, COUNT(*) AS cnt FROM w0 GROUP BY 1),
       s1 AS (SELECT w, cnt, list_transform(range(1, length(w)+1),
           i -> substr(w, CAST(i AS INT), 1)) AS syms FROM wc),
       ${(1 to nMerges).map(iter).mkString(",\n")}"""
  }

  /** Signature CTEs for ONE side of the fuzzy join: `src` must yield
    * (id, text); emits w$tag/sh$tag/hs$tag/sig$tag replaying
    * normalize→shingle→h28→minhash with the shared coefficient family. */
  private def minhashSigCtes(tag: String, src: String,
                             shingleLen: Int = 3): String = {
    val P = TextDedup.P
    val coefs = (0 until 64).map(i =>
      (((2L * i + 1) * 2654435761L) % P, (i.toLong * 40503L + 7) % P))
    val sigElems = coefs.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a*h + $b) % $P))"
    }.mkString(", ")
    val catShingle = (1 to shingleLen).map(k => s"w[i+$k]")
      .mkString("concat(", ", ' ', ", ")")
    s"""w$tag AS (SELECT id, string_split($normSql, ' ') AS w FROM $src),
       sh$tag AS (SELECT id, CASE WHEN len(w) >= $shingleLen
           THEN list_transform(range(len(w) - ${shingleLen - 1}), i -> $catShingle)
           ELSE [array_to_string(w, ' ')] END AS s FROM w$tag),
       hs$tag AS (SELECT id, list_transform(s, g -> CAST(concat('0x', substr(md5(g), 1, 7)) AS BIGINT)) AS hs FROM sh$tag),
       sig$tag AS (SELECT id, [$sigElems] AS sig FROM hs$tag)"""
  }

  /** Band-key CTE over sig$tag for `bands` bands of `r` rows (matches
    * TextDedup.lshBandKeys: md5 of the comma-joined band slice). */
  private def bandCte(tag: String, bands: Int, r: Int): String =
    s"""band$tag AS (SELECT id, concat(CAST(j AS VARCHAR), '#',
         md5(array_to_string(list_transform(
           sig[CAST(j*$r+1 AS INT):CAST(j*$r+$r AS INT)],
           x -> CAST(x AS VARCHAR)), ','))) AS band
       FROM sig$tag CROSS JOIN range($bands) t(j))"""

  private[graft] val estJaccardSql =
    """CAST(list_sum(list_transform(range(64),
       i -> CASE WHEN sa.sig[CAST(i+1 AS INT)] = sb.sig[CAST(i+1 AS INT)]
                 THEN 1 ELSE 0 END)) AS DOUBLE) / 64"""

  /** The Similarity hyperplane matrix as a DuckDB list-of-lists literal —
    * the SAME md5-derived driver-side constants the Spark plan carries
    * (Similarity.planeComponent), so bucket ids are engine-portable. */
  private def planesLiteral(planes: Int, dim: Int): String =
    (0 until planes).map(p =>
      (0 until dim).map(i => Similarity.planeComponent(p, i).toString)
        .mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")

  /** Mirrors Similarity.lshBucket over `w` (list-of-lists plane matrix):
    * scaled-integer per-plane dot signs — exact longs, so the sum order
    * DuckDB uses cannot flip a sign. */
  private def bucketSql(planes: Int): String =
    s"""CAST(list_sum(list_transform(range($planes), p ->
       CASE WHEN list_sum(list_transform(range(64), i ->
         CAST(FLOOR(CAST(embedding[CAST(i+1 AS INT)] AS DOUBLE)
           * w[CAST(p+1 AS INT)][CAST(i+1 AS INT)] * 1e12) AS BIGINT))) > 0
       THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE CAST(0 AS BIGINT) END))
       AS BIGINT)"""

  /** Mirrors Similarity.normExact. */
  private val vecNormSql =
    """sqrt(CAST(list_sum(list_transform(embedding,
       x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS BIGINT)))
       AS DOUBLE) / 1e12)"""

  /** Mirrors Similarity.dotExact between two embedding list refs. */
  private def dotSql(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(range(64), i ->
       CAST(FLOOR(CAST($a[CAST(i+1 AS INT)] AS DOUBLE)
         * CAST($b[CAST(i+1 AS INT)] AS DOUBLE) * 1e12) AS BIGINT)))
       AS DOUBLE) / 1e12"""

  val oracleSql: Map[String, String] = Map(
    "q26_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS sum_tokens,
         CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END) AS DOUBLE) / COUNT(*) AS avg_tokens,
         CAST(SUM(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) AS BIGINT) AS sum_punct,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q27_exact_dedup" ->
      s"""SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY keep_id""",

    // bigram-LM mirror: same normalize/split, same "w1 w2" bigram keys,
    // same MLE ratio cb/cu and floor-scaled exact mean per doc.
    "q113_bigram_lm" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         p AS (SELECT doc_id,
             unnest(list_transform(range(len(w) - 1),
               i -> concat(w[i+1], ' ', w[i+2]))) AS bg
           FROM d WHERE len(w) >= 2),
         q AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM p),
         cb AS (SELECT bg, COUNT(*) AS cb FROM q GROUP BY 1),
         cu AS (SELECT w1, COUNT(*) AS cu FROM q GROUP BY 1),
         s AS (SELECT q.doc_id,
             CAST(cb.cb AS DOUBLE) / CAST(cu.cu AS DOUBLE) AS pr
           FROM q JOIN cb USING (bg) JOIN cu USING (w1))
         SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(FLOOR((pr) * 1000000.0) AS DECIMAL(30,0))) AS DOUBLE) / 1000000.0
             / COUNT(*) AS mean_p
         FROM s GROUP BY 1 ORDER BY 1""",

    "q28_ngram_jaccard" ->
      s"""WITH d AS (
           SELECT doc_id, string_split($normSql, ' ') AS w
           FROM documents WHERE doc_id < 40),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(w) >= 3
               THEN list_distinct(list_transform(range(len(w) - 2),
                      i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])))
               ELSE [array_to_string(w, ' ')] END AS s
           FROM d)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
             len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         ORDER BY id_a, id_b""",

    "q31_cosine_topk" ->
      """WITH n AS (
           SELECT vec_id, sqrt(CAST(SUM(CAST(FLOOR(
             CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1e12)
             AS DECIMAL(30,0))) AS DOUBLE) / 1e12) AS nrm
           FROM embeddings CROSS JOIN range(0, 64) t(i) GROUP BY 1),
         dots AS (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             CAST(SUM(CAST(FLOOR(
               CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings q
           CROSS JOIN embeddings c
           CROSS JOIN range(0, 64) t(i)
           WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
           GROUP BY 1, 2),
         scored AS (
           SELECT query_id, corpus_id,
             dot / (nq.nrm * nc.nrm) AS cosine,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot / (nq.nrm * nc.nrm) DESC, corpus_id ASC) AS rank
           FROM dots
           JOIN n nq ON nq.vec_id = query_id
           JOIN n nc ON nc.vec_id = corpus_id)
         SELECT query_id, corpus_id, cosine, CAST(rank AS INT) AS rank
         FROM scored WHERE rank <= 5 ORDER BY query_id, rank""",

    "q34_quality_score" ->
      """SELECT doc_id, n_tok,
         least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.4 +
         least(CAST(sw_hits AS DOUBLE) / greatest(n_tok, 1) * 4.0, 1.0) * 0.3 +
         (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(n_chars2, 1) * 5.0, 1.0)) * 0.15 +
         (1.0 - least(CAST(n_digit AS DOUBLE) / greatest(n_chars2, 1) * 5.0, 1.0)) * 0.15 AS q_score
         FROM (
           SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
             length(text) AS n_chars2,
             length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               tk -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'], tk))) AS sw_hits
           FROM documents WHERE doc_id < 100) t
         ORDER BY doc_id""",

    // mirrors TextStats.withLangId: marker-word hit counts per language,
    // argmax with ties to the lexicographically greatest code.
    "q35_lang_id" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split($normSql, ' ') AS w
           FROM documents),
         sc AS (SELECT doc_id, lang, w,
           len(list_filter(w, t -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], t))) AS h_de,
           len(list_filter(w, t -> list_contains(['the','and','of','to','is','that','with','for'], t))) AS h_en,
           len(list_filter(w, t -> list_contains(['el','la','los','y','es','no','por','que'], t))) AS h_es,
           len(list_filter(w, t -> list_contains(['le','la','les','et','est','pas','pour','que'], t))) AS h_fr,
           len(list_filter(w, t -> list_contains(['de','shi','bu','le','wo','ni','zai','you'], t))) AS h_zh
           FROM d)
         SELECT doc_id, lang,
           CASE WHEN h_zh = best THEN 'zh' WHEN h_fr = best THEN 'fr'
                WHEN h_es = best THEN 'es' WHEN h_en = best THEN 'en'
                ELSE 'de' END AS pred_lang,
           CAST(best AS DOUBLE) / greatest(len(w), 1) AS lang_conf
         FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr, h_zh) AS best FROM sc) t
         ORDER BY doc_id""",

    // mirrors Similarity.lshTopK end-to-end: the hyperplane matrix rides in
    // the SQL as a literal list-of-lists (same md5-derived constants as the
    // Spark plan), bucket ids are scaled-integer sign sums, cosines exact
    // scaled-int dots — the whole ANN path is engine-portable.
    "q32_ann_lsh" ->
      s"""WITH ws AS (SELECT ${planesLiteral(8, 64)} AS w),
         v AS (SELECT vec_id, embedding, ${bucketSql(8)} AS bucket,
               $vecNormSql AS norm
               FROM embeddings CROSS JOIN ws),
         q0 AS (SELECT vec_id AS query_id, embedding AS q_emb,
                bucket AS bucket0, norm AS q_norm
                FROM v WHERE vec_id < 10),
         probes AS (
           SELECT query_id, q_emb, q_norm,
             CASE WHEN j = 0 THEN bucket0
                  ELSE xor(bucket0, (CAST(1 AS BIGINT) << CAST(j-1 AS INT))) END AS bucket
           FROM q0 CROSS JOIN range(9) t(j)),
         scored AS (
           SELECT p.query_id, c.vec_id AS corpus_id,
             CASE WHEN p.q_norm > 0 AND c.norm > 0
                  THEN (${dotSql("p.q_emb", "c.embedding")}) / (p.q_norm * c.norm) END AS cosine
           FROM probes p JOIN v c ON c.bucket = p.bucket
           WHERE p.query_id <> c.vec_id),
         agg AS (SELECT query_id, corpus_id, max(cosine) AS cosine
                 FROM scored GROUP BY 1, 2),
         rk AS (SELECT query_id, corpus_id, cosine,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, corpus_id ASC) AS rank FROM agg)
         SELECT query_id, corpus_id, cosine, CAST(rank AS INT) AS rank
         FROM rk WHERE rank <= 3 ORDER BY query_id, rank""",

    // mirrors Similarity.cosineNearDupPairs: same bucket literals, same
    // rep+adjacent linear pairing, same exact cosine.
    "q33_cosine_near_dup" ->
      s"""WITH ws AS (SELECT ${planesLiteral(6, 64)} AS w),
         v AS (SELECT vec_id AS id, embedding, ${bucketSql(6)} AS bucket,
               $vecNormSql AS norm
               FROM embeddings CROSS JOIN ws),
         p1 AS (SELECT id, min(id) OVER (PARTITION BY bucket) AS rep,
                lag(id) OVER (PARTITION BY bucket ORDER BY id) AS prev FROM v),
         pairs0 AS (SELECT DISTINCT id_a, id_b FROM (
             SELECT rep AS id_a, id AS id_b FROM p1 WHERE id <> rep
             UNION ALL
             SELECT prev AS id_a, id AS id_b FROM p1 WHERE prev IS NOT NULL) u),
         scored AS (SELECT p.id_a, p.id_b,
             CASE WHEN a.norm > 0 AND b.norm > 0
                  THEN (${dotSql("a.embedding", "b.embedding")}) / (a.norm * b.norm) END AS cosine
           FROM pairs0 p JOIN v a ON a.id = p.id_a JOIN v b ON b.id = p.id_b)
         SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.3
         ORDER BY cosine DESC, id_a, id_b LIMIT 100""",

    // mirrors TextDedup.jaccardJoin by BRUTE FORCE — no prefix filter at
    // all: the hash match against the engine's pruned plan proves the
    // prefix filter is lossless. The length prefilter below is implied by
    // J >= t (min/max >= t), so it cannot change the result set.
    "q306_jaccard_join" ->
      s"""WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS w
           FROM documents),
         g AS (SELECT doc_id, CASE WHEN len(w) >= 3
             THEN list_distinct(list_transform(range(len(w) - 2),
               i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])))
             ELSE [array_to_string(w, ' ')] END AS ts FROM w),
         s AS (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS l FROM g
           WHERE len(ts) > 0),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
             a.l AS la, b.l AS lb
           FROM s a JOIN s b ON a.doc_id < b.doc_id
             AND b.l >= ceil(0.5 * a.l) AND a.l >= ceil(0.5 * b.l))
         SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(la + lb - i AS DOUBLE) AS jaccard
         FROM p
         WHERE CAST(i AS DOUBLE) / CAST(la + lb - i AS DOUBLE) >= 0.5
         ORDER BY 1, 2""",

    // mirrors TextDedup.jaccardJoinApprox: the q29 minhash/banding CTEs
    // (same 64-hash signatures, 32 band keys), bucket sizes + the 1024
    // cap, all-pairs within surviving buckets, exact list_intersect
    // verify at threshold 0.5 — the banding and the cap are pure
    // functions of the text, so the replay is bit-exact.
    "q373_jaccard_approx" ->
      s"""WITH ${minhashCandidateCtes(32)},
         sets AS (SELECT id, list_distinct(s) AS ts FROM sh
           WHERE len(s) > 0),
         bsz AS (SELECT band, COUNT(*) AS n FROM banded GROUP BY 1),
         okb AS (SELECT b.id, b.band FROM banded b
           JOIN bsz z USING (band) WHERE z.n <= 1024),
         cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
           FROM okb x JOIN okb y ON x.band = y.band AND x.id < y.id),
         p AS (SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
             CAST(len(a.ts) AS BIGINT) AS la,
             CAST(len(b.ts) AS BIGINT) AS lb
           FROM cand c JOIN sets a ON a.id = c.id_a
             JOIN sets b ON b.id = c.id_b)
         SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(la + lb - i AS DOUBLE) AS jaccard
         FROM p
         WHERE CAST(i AS DOUBLE) / CAST(la + lb - i AS DOUBLE) >= 0.5
         ORDER BY 1, 2""",

    // mirrors jaccardJoinApproxWithStats' LshCapStats at maxBucket = 4:
    // bucket sizes off the same banding CTEs, capped-bucket count +
    // n(n-1)/2 pair mass over the > 4 buckets, and the surviving
    // verified-pair count over the <= 4 buckets.
    "q390_lsh_cap_telemetry" ->
      s"""WITH ${minhashCandidateCtes(32)},
         sets AS (SELECT id, list_distinct(s) AS ts FROM sh
           WHERE len(s) > 0),
         bsz AS (SELECT band, COUNT(*) AS n FROM banded GROUP BY 1),
         cap AS (SELECT COUNT(*) AS cb,
             COALESCE(SUM(n * (n - 1) // 2), 0) AS dp FROM bsz WHERE n > 4),
         okb AS (SELECT b.id, b.band FROM banded b
           JOIN bsz z USING (band) WHERE z.n <= 4),
         cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
           FROM okb x JOIN okb y ON x.band = y.band AND x.id < y.id),
         p AS (SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(a.ts, b.ts)) AS BIGINT) AS i,
             CAST(len(a.ts) AS BIGINT) AS la,
             CAST(len(b.ts) AS BIGINT) AS lb
           FROM cand c JOIN sets a ON a.id = c.id_a
             JOIN sets b ON b.id = c.id_b),
         surv AS (SELECT COUNT(*) AS sp FROM p
           WHERE CAST(i AS DOUBLE) / CAST(la + lb - i AS DOUBLE) >= 0.5)
         SELECT CAST(cap.cb AS BIGINT) AS capped_buckets,
           CAST(cap.dp AS BIGINT) AS dropped_pairs,
           CAST(surv.sp AS BIGINT) AS surviving_pairs
         FROM cap, surv""",

    // mirrors TextStats.textRankKeywords: vocab >= 5 with 60-bit md5
    // ids, distinct symmetric adjacent-pair edges, the q149 integer
    // PageRank replay (3 rounds, damp 85), min-token exemplars.
    "q379_textrank" -> {
      val iters = (1 to 3).map { k =>
        s"""r$k AS (SELECT e.dst AS id,
             (SELECT b FROM base) + (85 * SUM(r.r // d.outdeg)) // 100 AS r
           FROM e JOIN r${k - 1} r ON e.src = r.id
           JOIN deg d ON d.src = e.src
           GROUP BY e.dst)"""
      }.mkString(",\n         ")
      s"""WITH d AS (SELECT string_split($normSql, ' ') AS w FROM documents),
         t AS (SELECT unnest(w) AS w FROM d),
         vc AS (SELECT w, COUNT(*) AS c FROM t WHERE w <> '' GROUP BY 1),
         vocab AS MATERIALIZED (SELECT w,
             CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS id
           FROM vc WHERE c >= 5),
         pr0 AS (SELECT unnest(CASE WHEN len(w) >= 2
             THEN list_transform(range(len(w) - 1),
               i -> [w[CAST(i AS INT) + 1], w[CAST(i AS INT) + 2]])
             ELSE [] END) AS p FROM d),
         pq AS (SELECT DISTINCT va.id AS a, vb.id AS b
           FROM (SELECT p[1] AS w1, p[2] AS w2 FROM pr0) pr
           JOIN vocab va ON pr.w1 = va.w
           JOIN vocab vb ON pr.w2 = vb.w
           WHERE pr.w1 <> pr.w2),
         e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
             SELECT a AS src, b AS dst FROM pq
             UNION ALL SELECT b, a FROM pq) u),
         deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
           FROM e GROUP BY 1),
         n AS (SELECT COUNT(*) AS nn FROM deg),
         base AS (SELECT (15 * (1000000000000 // nn)) // 100 AS b FROM n),
         r0 AS (SELECT src AS id,
             (SELECT 1000000000000 // nn FROM n) AS r FROM deg),
         $iters,
         names AS (SELECT id, MIN(w) AS token FROM vocab GROUP BY 1)
         SELECT nm.token, CAST(r.r AS BIGINT) AS rank
         FROM r3 r JOIN names nm ON r.id = nm.id
         ORDER BY rank DESC, token LIMIT 20"""
    },

    // mirrors Similarity.domainCentroidSimilarity: per-(label, dim)
    // floor-scaled exact means, floor-scaled pairwise dots, diagonal
    // norms, the safeCosine null gate.
    "q382_domain_centroids" ->
      """WITH ex AS (SELECT CAST(label AS VARCHAR) AS g,
             unnest(range(len(embedding))) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS x
           FROM embeddings WHERE label IS NOT NULL),
         cent AS (SELECT g, d,
             CAST(SUM(CAST(FLOOR(x * 1000000000.0) AS DECIMAL(38,0)))
               AS DOUBLE) / 1000000000.0 / CAST(COUNT(*) AS DOUBLE) AS c
           FROM ex GROUP BY 1, 2),
         dots AS (SELECT a.g AS g_a, b.g AS g_b,
             CAST(SUM(CAST(FLOOR(a.c * b.c * 1000000000.0)
               AS DECIMAL(38,0))) AS DOUBLE) / 1000000000.0 AS dot
           FROM cent a JOIN cent b ON a.d = b.d AND a.g <= b.g
           GROUP BY 1, 2),
         norms AS (SELECT g_a AS g, sqrt(dot) AS nr FROM dots
           WHERE g_a = g_b)
         SELECT d.g_a, d.g_b,
           CASE WHEN na.nr > 0 AND nb.nr > 0
             THEN d.dot / (na.nr * nb.nr) END AS cosine
         FROM dots d JOIN norms na ON d.g_a = na.g
         JOIN norms nb ON d.g_b = nb.g
         WHERE d.g_a < d.g_b ORDER BY 1, 2""",


    // mirrors TextDedup.dupClusterProfile: the q27 fingerprint clusters
    // rolled up by size, share + descending cumulative share.
    "q383_dup_clusters" ->
      s"""WITH fp AS (SELECT md5($normSql) AS fp, COUNT(*) AS n_copies
           FROM documents GROUP BY 1),
         cs AS (SELECT n_copies AS cluster_size,
             CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(n_copies * COUNT(*) AS BIGINT) AS n_docs
           FROM fp GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn FROM cs)
         SELECT c.cluster_size, c.n_clusters, c.n_docs,
           CAST(c.n_docs AS DOUBLE) / CAST(t.nn AS DOUBLE) AS doc_share,
           CAST(SUM(c.n_docs) OVER (ORDER BY c.cluster_size DESC
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(t.nn AS DOUBLE)
             AS cum_share
         FROM cs c CROSS JOIN tot t ORDER BY c.cluster_size""",

    // mirrors TextStats.repetitionLoops on the same decorated corpus:
    // the identical (cur << 32 | best) integer fold via list_reduce
    // with a prepended zero seed.
    "q384_repetition_loops" -> {
      def loopSql(c: Int): String =
        s"""CASE WHEN len(w) > $c THEN list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range($c, len(w)), i -> CAST(i AS BIGINT))),
             (st, i) -> CASE WHEN w[CAST(i AS INT) + 1] = w[CAST(i AS INT) - ${c - 1}]
               THEN (((st >> 32) + 1) << 32)
                 | greatest(st & 4294967295, (st >> 32) + 1)
               ELSE greatest(st & 4294967295, CAST(0 AS BIGINT)) END
           ) & 4294967295 ELSE 0 END AS loop$c"""
      s"""WITH dec AS (SELECT doc_id,
             CASE WHEN doc_id % 50 = 0
               THEN concat(text, ' loop loop loop loop ab cd ab cd ab')
               ELSE text END AS text
           FROM documents),
         d AS (SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS w
           FROM dec)
         SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
           ${loopSql(1)}, ${loopSql(2)}, ${loopSql(3)}
         FROM d ORDER BY doc_id"""
    },


    // mirrors TextStats.meanIdf: per-doc distinct df, ln((N+1)/(df+1)),
    // instance join, floor-scaled (1e9) exact per-doc mean.
    "q388_mean_idf" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w
           FROM documents),
         n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
         dfreq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM (
             SELECT DISTINCT doc_id, unnest(list_distinct(w)) AS t FROM d) u
           WHERE t <> '' GROUP BY 1),
         idf AS (SELECT t, ln((n.nd + 1.0) / (CAST(df AS DOUBLE) + 1.0)) AS idf
           FROM dfreq CROSS JOIN n),
         inst AS (SELECT doc_id, unnest(w) AS t FROM d),
         j AS (SELECT i.doc_id, x.idf FROM inst i JOIN idf x ON i.t = x.t
           WHERE i.t <> '')
         SELECT doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(FLOOR(idf * 1000000000.0) AS DECIMAL(38,0)))
             AS DOUBLE) / 1000000000.0 / CAST(COUNT(*) AS DOUBLE)
             AS mean_idf
         FROM j GROUP BY 1 ORDER BY 1""",

    // mirrors TextStats.clusterTerms: the same c-TF-IDF closed form,
    // score floor-scaled (10^9) BEFORE the per-cluster rank so near-tie
    // order cannot drift, ties by term.
    "q308_cluster_terms" ->
      s"""WITH toks AS (SELECT source AS cluster,
             unnest(string_split($normSql, ' ')) AS term
           FROM documents WHERE source IS NOT NULL),
         cell AS (SELECT cluster, term, CAST(COUNT(*) AS BIGINT) AS n_term
           FROM toks WHERE term <> '' GROUP BY 1, 2),
         nc AS (SELECT cluster, CAST(SUM(n_term) AS BIGINT) AS nc
           FROM cell GROUP BY 1),
         kw AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS kw
           FROM cell GROUP BY 1),
         kt AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM nc),
         scored AS (SELECT cell.cluster, cell.term, cell.n_term,
             CAST(FLOOR(CAST(n_term AS DOUBLE) / CAST(nc AS DOUBLE)
               * ln(1.0 + CAST(k AS DOUBLE) / CAST(kw AS DOUBLE))
               * 1000000000.0) AS BIGINT) AS s
           FROM cell JOIN nc USING (cluster) JOIN kw USING (term)
           CROSS JOIN kt),
         ranked AS (SELECT cluster, term, n_term,
             CAST(s AS DOUBLE) / 1000000000.0 AS score,
             CAST(ROW_NUMBER() OVER (PARTITION BY cluster
               ORDER BY s DESC, term ASC) AS BIGINT) AS rank
           FROM scored)
         SELECT cluster, term, n_term, score, rank FROM ranked
         WHERE rank <= 5 ORDER BY cluster, rank""",

    // mirrors TextDedup.minhashCandidatePairs end-to-end (signatures,
    // banding, rep+adjacent pairing, estimated Jaccard) — every hash is
    // md5-derived, so the whole sketch pipeline is engine-portable.
    "q29_minhash_pairs" ->
      s"""WITH ${minhashCandidateCtes(32)}
         SELECT p.id_a, p.id_b, $estJaccardSql AS est_jaccard
         FROM pairs0 p JOIN sig sa ON sa.id = p.id_a JOIN sig sb ON sb.id = p.id_b
         ORDER BY est_jaccard DESC, id_a, id_b LIMIT 100""",

    // mirrors TextDedup.levenshteinVerifiedPairs: the q29 candidate CTEs,
    // the est-Jaccard gate, then DuckDB's own levenshtein over the same
    // 200-char prefixes — two independent edit-distance implementations
    // must agree pair for pair.
    "q155_lev_dedup" ->
      s"""WITH ${minhashCandidateCtes(32)},
         cand AS (SELECT p.id_a, p.id_b, $estJaccardSql AS est_jaccard
           FROM pairs0 p
           JOIN sig sa ON sa.id = p.id_a JOIN sig sb ON sb.id = p.id_b
           WHERE $estJaccardSql >= 0.2),
         pref AS (SELECT doc_id AS pid, substr(text, 1, 200) AS pr
                  FROM documents)
         SELECT c.id_a, c.id_b, c.est_jaccard,
           CAST(levenshtein(pa.pr, pb.pr) AS INT) AS lev
         FROM cand c
         JOIN pref pa ON pa.pid = c.id_a JOIN pref pb ON pb.pid = c.id_b
         WHERE levenshtein(pa.pr, pb.pr) <= 40
         ORDER BY c.id_a, c.id_b""",

    // mirrors TextDedup.jaroWinklerVerifiedPairs: q29's candidate CTEs +
    // DuckDB's own jaro_winkler_similarity (the kernel is pinned to it
    // byte-for-byte, incl. the bytes-not-codepoints comparison, the
    // ""→0 edge, and the 0.7 boost threshold).
    "q171_jaro_dedup" ->
      s"""WITH ${minhashCandidateCtes(32)},
         cand AS (SELECT p.id_a, p.id_b, $estJaccardSql AS est_jaccard
           FROM pairs0 p
           JOIN sig sa ON sa.id = p.id_a JOIN sig sb ON sb.id = p.id_b
           WHERE $estJaccardSql >= 0.2),
         pref AS (SELECT doc_id AS pid, substr(text, 1, 80) AS pr
                  FROM documents)
         SELECT c.id_a, c.id_b, c.est_jaccard,
           jaro_winkler_similarity(pa.pr, pb.pr) AS jw
         FROM cand c
         JOIN pref pa ON pa.pid = c.id_a JOIN pref pb ON pb.pid = c.id_b
         WHERE jaro_winkler_similarity(pa.pr, pb.pr) >= 0.8
         ORDER BY c.id_a, c.id_b""",

    // mirrors TextDedup.simhashCandidatePairs: 60-bit per-bit majority vote
    // of md5-derived token hashes, 4×15-bit band collisions, exact hamming.
    "q30_simhash_pairs" -> {
      val terms = (0 until 60).map(j =>
        s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $j) & 1)*2 - 1)) > 0 " +
          s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id AS id, string_split($normSql, ' ') AS w FROM documents),
         hsx AS (SELECT id, list_transform(w, t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)) AS hs FROM d),
         shx AS (SELECT id, $terms AS sh FROM hsx),
         banded AS (SELECT id, j AS band, (sh >> CAST(15*j AS INT)) & 32767 AS key
                    FROM shx CROSS JOIN range(4) t(j)),
         p1 AS (SELECT id, min(id) OVER (PARTITION BY band, key) AS rep FROM banded),
         pairs0 AS (SELECT DISTINCT rep AS id_a, id AS id_b FROM p1 WHERE id <> rep)
         SELECT p.id_a, p.id_b, bit_count(xor(sa.sh, sb.sh)) AS hamming
         FROM pairs0 p JOIN shx sa ON sa.id = p.id_a JOIN shx sb ON sb.id = p.id_b
         WHERE bit_count(xor(sa.sh, sb.sh)) <= 30
         ORDER BY hamming ASC, id_a, id_b LIMIT 100"""
    },

    // mirrors Multimodal.mediaFeatures over the UTF-8 payload bytes: the
    // decode STUB's fake features are pure byte arithmetic, so the whole
    // plumbing (attach → batch → decode → features) is oracle-checkable.
    // replays Multimodal.syntheticPng's pixel generator in closed form:
    // the Spark side round-trips these values through a real PNG
    // encode/decode (lossless), so equality proves the codec ran.
    "q36_multimodal" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(16 + doc_id % 16 AS INT) AS width,
             CAST(16 + (doc_id // 16) % 16 AS INT) AS height
           FROM documents WHERE doc_id < 200),
         px AS (
           SELECT doc_id, width, height,
             UNNEST(range(width)) AS x
           FROM d),
         pxy AS (
           SELECT doc_id, width, height, x, UNNEST(range(height)) AS y
           FROM px)
         SELECT doc_id, width, height, 3 AS channels,
           CAST(SUM((x + doc_id) % 256 + (y + 2 * doc_id) % 256
                    + (x + y) % 256) AS BIGINT) AS pixel_sum
         FROM pxy GROUP BY 1, 2, 3 ORDER BY doc_id""",

    // mirrors TextStats.fingerprintSketch: 5-gram shingles → 28-bit md5-prefix
    // hashes → bottom-8, comma-joined.
    "q37_fingerprint_sketch" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w
           FROM documents WHERE doc_id < 100),
         sh AS (SELECT doc_id,
           CASE WHEN len(w) >= 5
             THEN list_transform(range(len(w) - 4),
                    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3], ' ', w[i+4], ' ', w[i+5]))
             ELSE [array_to_string(w, ' ')] END AS s
           FROM d)
         SELECT doc_id,
           array_to_string(list_transform(
             list_sort(list_transform(s,
               g -> CAST(concat('0x', substr(md5(g), 1, 7)) AS BIGINT)))[1:8],
             x -> CAST(x AS VARCHAR)), ',') AS sketch
         FROM sh ORDER BY doc_id""",

    // mirrors TextDedup.decontaminate: distinct 60-bit md5 shingle-hash
    // semi-overlap counts between the train slice and the benchmark slice.
    "q73_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2), i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         ex AS (SELECT doc_id,
             unnest(list_distinct(list_transform(s,
               g -> CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)))) AS h
           FROM sh),
         bench AS (SELECT DISTINCT h FROM ex WHERE doc_id % 97 = 0)
         SELECT e.doc_id, COUNT(*) AS overlap_shingles
         FROM ex e JOIN bench b USING (h)
         WHERE e.doc_id % 97 <> 0
         GROUP BY e.doc_id HAVING COUNT(*) >= 1
         ORDER BY e.doc_id""",

    // mirrors TextDedup.decontaminateBloom — semantically q73 exactly (the
    // Bloom filter is a pure prefilter; the confirm join restores exactness).
    "q119_bloom_decontam" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2), i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         ex AS (SELECT doc_id,
             unnest(list_distinct(list_transform(s,
               g -> CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)))) AS h
           FROM sh),
         bench AS (SELECT DISTINCT h FROM ex WHERE doc_id % 97 = 0)
         SELECT e.doc_id, COUNT(*) AS overlap_shingles
         FROM ex e JOIN bench b USING (h)
         WHERE e.doc_id % 97 <> 0
         GROUP BY e.doc_id HAVING COUNT(*) >= 1
         ORDER BY e.doc_id""",

    // mirrors SeqPack.chunkDocuments: same whitespace tokens, same
    // ceil-division chunk count, 1-based inclusive list windows.
    "q122_doc_chunking" ->
      """WITH d AS (SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         c AS (SELECT doc_id, w,
             CASE WHEN len(w) <= 32 THEN 1
                  ELSE (len(w) - 32 + 23) // 24 + 1 END AS nc
           FROM d),
         e AS (SELECT doc_id, w,
             CAST(unnest(range(0, nc)) AS INT) AS chunk_id FROM c)
         SELECT doc_id, chunk_id,
           array_to_string(w[chunk_id*24 + 1 : chunk_id*24 + 32], ' ') AS chunk_text,
           CAST(len(w[chunk_id*24 + 1 : chunk_id*24 + 32]) AS INT) AS n_chunk_tokens
         FROM e ORDER BY doc_id, chunk_id""",

    // mirrors TextStats.nfcNormalize/stripAccents: the ̈/́
    // combining marks resolve at the Scala level, so both engines receive
    // byte-identical decomposed input and must agree on UAX #15 composition
    // and Mn-stripping to hash-match.
    "q124_unicode_norm" ->
      s"""SELECT doc_id,
           strip_accents(nfc_normalize('Ünïcödé ' || substr(text, 1, 40) || ' café')) AS norm_text,
           CAST(length(strip_accents(nfc_normalize('Ünïcödé ' || substr(text, 1, 40) || ' café'))) AS INT) AS n_chars_norm
         FROM documents ORDER BY doc_id""",

    // mirrors TextStats.gopherQualityFlags: same normalized tokens, each
    // ratio one int/int double division, flags as ints.
    "q120_gopher_rules" ->
      s"""WITH d AS (SELECT doc_id, text, string_split($normSql, ' ') AS w FROM documents),
         m AS (SELECT doc_id,
             len(w) AS nw_raw, greatest(len(w), 1) AS nw,
             CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE)
               / greatest(len(w), 1) AS mean_len,
             (len(text) - len(replace(text, '#', ''))
               + (len(text) - len(replace(text, '...', ''))) // 3) AS n_sym,
             string_split(text, chr(10)) AS lines,
             len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS n_alpha,
             len(list_intersect(w, ['the','a','an','and','or','of','to','in',
               'is','it','that','for','on','with','as','was','at','by','be',
               'this'])) AS stop_hits
           FROM d),
         f AS (SELECT doc_id, nw_raw, nw, mean_len, n_sym, n_alpha, stop_hits,
             greatest(len(lines), 1) AS nl,
             len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS n_bullet,
             len(list_filter(lines, l -> regexp_matches(rtrim(l), '\\.\\.\\.$$'))) AS n_ell
           FROM m)
         SELECT doc_id, CAST(nw_raw AS INT) AS n_words, mean_len AS mean_word_len,
           CAST(nw_raw >= 30 AND nw_raw <= 80 AS INT) AS ok_words,
           CAST(mean_len >= 4.5 AND mean_len <= 10.0 AS INT) AS ok_word_len,
           CAST(CAST(n_sym AS DOUBLE) / nw <= 0.1 AS INT) AS ok_symbol,
           CAST(CAST(n_bullet AS DOUBLE) / nl <= 0.9 AS INT) AS ok_bullet,
           CAST(CAST(n_ell AS DOUBLE) / nl <= 0.3 AS INT) AS ok_ellipsis,
           CAST(CAST(n_alpha AS DOUBLE) / nw >= 0.8 AS INT) AS ok_alpha,
           CAST(stop_hits >= 2 AS INT) AS ok_stop,
           CAST((nw_raw >= 30 AND nw_raw <= 80)
             AND (mean_len >= 4.5 AND mean_len <= 10.0)
             AND (CAST(n_sym AS DOUBLE) / nw <= 0.1)
             AND (CAST(n_bullet AS DOUBLE) / nl <= 0.9)
             AND (CAST(n_ell AS DOUBLE) / nl <= 0.3)
             AND (CAST(n_alpha AS DOUBLE) / nw >= 0.8)
             AND (stop_hits >= 2) AS INT) AS keep
         FROM f ORDER BY doc_id""",

    // mirrors TextStats.repetitionMetrics: bigram/trigram md5-hash identity,
    // duplicate fraction = 1 − distinct/total, top fraction = max bigram
    // count / total (same double op order as the Spark side).
    // replays Multimodal.syntheticAvi's closed-form pixels:
    // w = 8+id%8, h = 8+(id/8)%8, n = 2+id%3,
    // channels b=(x+id+f)%256, g=(y+2id)%256, r=(x+y+f)%256
    "q86_video" ->
      """SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           CAST(d.n AS BIGINT) AS n_frames,
           CAST(SUM((x + d.doc_id + f) % 256 + (y + 2 * d.doc_id) % 256
                    + (x + y + f) % 256) AS BIGINT) AS pixel_sum
         FROM (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id // 8) % 8 AS h,
                      2 + doc_id % 3 AS n
               FROM documents WHERE doc_id < 100) d
         CROSS JOIN range(0, 15) tx(x)
         CROSS JOIN range(0, 15) ty(y)
         CROSS JOIN range(0, 4) tf(f)
         WHERE x < d.w AND y < d.h AND f < d.n
         GROUP BY d.doc_id, d.w, d.h, d.n ORDER BY d.doc_id""",

    // replays Multimodal.syntheticMjpegAvi's closed-form container
    // metadata (dims + frame count share syntheticAvi's formulas); the
    // JPEG payload pixels are codec-defined and spec-asserted instead
    "q314_mjpeg_video" ->
      """SELECT doc_id, CAST(8 + doc_id % 8 AS INT) AS width,
           CAST(8 + (doc_id // 8) % 8 AS INT) AS height,
           CAST(2 + doc_id % 3 AS BIGINT) AS n_frames
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    // replays Multimodal.syntheticWav's closed-form samples:
    // s(i) = (i*31 + id*17) % 65536 - 32768 over n = 256 + id%256 frames
    "q85_audio" ->
      """SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
           CAST(n AS BIGINT) AS n_frames,
           CAST(SUM((i * 31 + doc_id * 17) % 65536 - 32768) AS BIGINT) AS sample_sum,
           CAST(MAX(ABS((i * 31 + doc_id * 17) % 65536 - 32768)) AS INT) AS peak
         FROM (SELECT doc_id, 256 + doc_id % 256 AS n
               FROM documents WHERE doc_id < 200) d
         CROSS JOIN range(0, 512) t(i)
         WHERE i < n
         GROUP BY doc_id, n ORDER BY doc_id""",

    // mirrors TextStats.tfIdfTopTerm: same normalized tokens, ratio idf,
    // tf·N/df in the same IEEE order, same (score desc, term asc) tie-break
    "q83_tfidf" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM toks WHERE term <> '' GROUP BY 1, 2),
         dfc AS (SELECT term, COUNT(*) AS dfc FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n FROM documents),
         scored AS (SELECT doc_id, term, tf,
             CAST(tf AS DOUBLE) * CAST(n.n AS DOUBLE) / CAST(dfc.dfc AS DOUBLE) AS tfidf
           FROM tf CROSS JOIN n JOIN dfc USING (term))
         SELECT doc_id, term AS top_term, tf, tfidf FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term ASC) AS rn
           FROM scored) t
         WHERE rn = 1 ORDER BY doc_id""",

    // mirrors TextStats.dupNgramSpanStats: same md5 60-bit trigram shingle
    // hash (q74 idiom), per-(doc, hash) counts, global count join, rollup
    "q84_dup_ngram_spans" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         g AS (SELECT doc_id, CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2), i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         h AS (SELECT doc_id, unnest(list_transform(s,
             g2 -> CAST(concat('0x', substr(md5(g2), 1, 15)) AS BIGINT))) AS hh FROM g),
         k AS (SELECT doc_id, hh, COUNT(*) AS k FROM h GROUP BY 1, 2),
         c AS (SELECT hh, SUM(k) AS c FROM k GROUP BY 1)
         SELECT k.doc_id, CAST(SUM(k.k) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN c.c >= 2 THEN k.k ELSE 0 END) AS BIGINT) AS dup_occ,
           CAST(SUM(CASE WHEN c.c >= 2 THEN k.k ELSE 0 END) AS DOUBLE)
             / CAST(SUM(k.k) AS DOUBLE) AS dup_frac
         FROM k JOIN c USING (hh) GROUP BY 1 ORDER BY 1""",

    "q74_repetition" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         g2 AS (SELECT doc_id, CASE WHEN len(w) >= 2
             THEN list_transform(range(len(w) - 1), i -> concat(w[i+1], ' ', w[i+2]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         g3 AS (SELECT doc_id, CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2), i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         h2 AS (SELECT doc_id, list_transform(s,
             g -> CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)) AS h FROM g2),
         h3 AS (SELECT doc_id, list_transform(s,
             g -> CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)) AS h FROM g3),
         m2 AS (SELECT doc_id, CAST(len(h) AS BIGINT) AS n_bigrams,
             1.0 - CAST(len(list_distinct(h)) AS DOUBLE) / CAST(len(h) AS DOUBLE) AS dup_bigram_frac
           FROM h2),
         m3 AS (SELECT doc_id,
             1.0 - CAST(len(list_distinct(h)) AS DOUBLE) / CAST(len(h) AS DOUBLE) AS dup_trigram_frac
           FROM h3),
         cnt AS (SELECT doc_id, g, COUNT(*) AS c
           FROM (SELECT doc_id, unnest(h) AS g FROM h2) GROUP BY doc_id, g),
         top AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY doc_id)
         SELECT m2.doc_id, m2.n_bigrams, m2.dup_bigram_frac, m3.dup_trigram_frac,
           CAST(top.topc AS DOUBLE) / CAST(m2.n_bigrams AS DOUBLE) AS top_bigram_frac
         FROM m2 JOIN m3 USING (doc_id) JOIN top USING (doc_id)
         ORDER BY m2.doc_id""",

    // mirrors SeqPack.packSequences: same whitespace token count as q26, an
    // exclusive window prefix sum, and integer chunk arithmetic.
    "q75_seq_pack" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(COALESCE(CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END, 0) AS BIGINT) AS n_tokens
           FROM documents),
         p AS (
           SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start
           FROM d)
         SELECT doc_id, n_tokens, token_start,
           CAST(FLOOR(token_start / 2048) AS BIGINT) AS first_seq,
           CASE WHEN n_tokens = 0 THEN CAST(FLOOR(token_start / 2048) AS BIGINT)
                ELSE CAST(FLOOR((token_start + n_tokens - 1) / 2048) AS BIGINT) END AS last_seq,
           CASE WHEN n_tokens = 0 THEN CAST(FLOOR(token_start / 2048) AS BIGINT)
                ELSE CAST(FLOOR((token_start + n_tokens - 1) / 2048) AS BIGINT) END
             - CAST(FLOOR(token_start / 2048) AS BIGINT) + 1 AS n_seqs
         FROM p ORDER BY doc_id""",

    // mirrors DomainMix.sampleByDomain: same md5 basis-point uniform, same
    // full-epoch + fractional-keep split, copies expanded by generate_series.
    "q76_domain_mix" ->
      """WITH r AS (
           SELECT doc_id, lang, n_chars,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS u,
             CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 1 WHEN 'fr' THEN 0
                       WHEN 'es' THEN 0 ELSE 1 END AS full_epochs,
             CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 0 WHEN 'fr' THEN 5000
                       WHEN 'es' THEN 2500 ELSE 2500 END AS frac_bp
           FROM documents),
         c AS (
           SELECT doc_id, lang, n_chars,
             full_epochs + CASE WHEN u < frac_bp THEN 1 ELSE 0 END AS n_copies
           FROM r),
         x AS (
           SELECT doc_id, lang, n_chars, unnest(generate_series(0, n_copies - 1)) AS copy_id
           FROM c WHERE n_copies > 0)
         SELECT lang, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars, CAST(MAX(copy_id) AS BIGINT) AS max_copy
         FROM x GROUP BY lang ORDER BY lang""",

    // mirrors DomainMix.temperatureSample at α = ½: sqrt weights (IEEE
    // correctly-rounded on both engines), floor-scaled exact weight sum,
    // the pinned w/S*N/n_d*1e6 rate sequence, and the md5-uniform
    // fractional epoch.
    "q278_temperature_sample" ->
      """WITH cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nd
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(sqrt(CAST(nd AS DOUBLE)) * 1000000000.0)
               AS DECIMAL(30,0))) AS DOUBLE) / 1000000000.0 AS s
           FROM cnt),
         r AS (SELECT source, nd,
             CAST(FLOOR(sqrt(CAST(nd AS DOUBLE)) / s * CAST(n AS DOUBLE)
               / CAST(nd AS DOUBLE) * 1000000.0) AS BIGINT) AS ppm
           FROM cnt CROSS JOIN tot),
         j AS (SELECT d.doc_id, d.source, r.nd, r.ppm,
             r.ppm // 1000000 + CASE WHEN
               CAST(concat('0x', substr(md5(concat('temp#',
                 CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000
               < r.ppm % 1000000 THEN 1 ELSE 0 END AS copies
           FROM documents d JOIN r USING (source))
         SELECT doc_id, source, nd AS n_domain, ppm AS rate_ppm,
           CAST(unnest(generate_series(0, copies - 1)) AS BIGINT) AS copy_id
         FROM j WHERE copies > 0 ORDER BY doc_id, copy_id""",

    // mirrors TextDedup.contaminationMatrix: q73's 60-bit shingle hashes,
    // distinct per side, one hash join, per-set distinct-doc counts.
    "q283_contamination_matrix" ->
      s"""WITH d AS (SELECT doc_id, source,
             string_split($normSql, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, source, CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2), i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         ex AS (SELECT doc_id, source,
             unnest(list_distinct(list_transform(s,
               g -> CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)))) AS h
           FROM sh),
         ev AS (SELECT DISTINCT source AS eval_set, h FROM ex
           WHERE source IN ('src0', 'src1', 'src2')),
         co AS (SELECT DISTINCT doc_id, h FROM ex
           WHERE source NOT IN ('src0', 'src1', 'src2')),
         hits AS (SELECT eval_set,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_contaminated
           FROM co JOIN ev USING (h) GROUP BY 1),
         sizes AS (SELECT source AS eval_set,
             CAST(COUNT(*) AS BIGINT) AS n_eval_docs FROM documents
           WHERE source IN ('src0', 'src1', 'src2') GROUP BY 1),
         nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus_docs
           FROM documents WHERE source NOT IN ('src0', 'src1', 'src2'))
         SELECT s.eval_set, s.n_eval_docs, nc.n_corpus_docs,
           COALESCE(h.n_contaminated, 0) AS n_contaminated,
           CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / nc.n_corpus_docs
             AS share
         FROM sizes s LEFT JOIN hits h USING (eval_set) CROSS JOIN nc
         ORDER BY eval_set""",

    // mirrors Export.shardManifest: the same md5 shard draw and per-shard
    // aggregates (tokenization per the q26 whitespace contract).
    "q280_export_manifest" ->
      """WITH m AS (SELECT doc_id, text,
             CAST(concat('0x', substr(md5(concat('shard#',
               CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8 AS shard,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
           FROM documents)
         SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         FROM m GROUP BY 1 ORDER BY 1""",

    // mirrors TextDedup.cdcChunks: same normalization, boundary at
    // h28(window) % 64 == 0 for i in 2..len-7, [1]-prefixed starts,
    // substring slicing between consecutive starts, md5 fingerprints.
    "q279_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, source,
             lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
           FROM documents),
         s AS (SELECT doc_id, source, t, length(t) AS len,
             CASE WHEN length(t) >= 9 THEN
               [1] || list_filter(range(2, length(t) - 6),
                 i -> CAST(concat('0x', substr(md5(substr(t,
                   CAST(i AS INT), 8)), 1, 7)) AS BIGINT) % 64 = 0)
             ELSE [1] END AS sts
           FROM d),
         c AS (SELECT doc_id, source,
             unnest(list_transform(range(len(sts)), j ->
               substr(t, CAST(sts[CAST(j+1 AS INT)] AS INT),
                 CAST(coalesce(sts[CAST(j+2 AS INT)], len + 1)
                   - sts[CAST(j+1 AS INT)] AS INT)))) AS chunk
           FROM s)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT md5(chunk)) AS BIGINT) AS n_unique_chunks,
           CAST(SUM(length(chunk)) AS BIGINT) AS sum_chunk_len,
           CAST(COUNT(*) - COUNT(DISTINCT md5(chunk)) AS DOUBLE) / COUNT(*)
             AS dup_share
         FROM c GROUP BY 1 ORDER BY 1""",

    // mirrors Reductions.heavyHittersExact: exact token counts with a
    // ceil(phi·n) threshold (same IEEE double multiply + ceil as the Spark
    // driver). The sketch is only a candidate finder — output is exact.
    "q78_heavy_hitters" ->
      s"""WITH tt AS (
           SELECT unnest(string_split($normSql, ' ')) AS token FROM documents),
         tk AS (SELECT token FROM tt WHERE len(token) > 0),
         tot AS (SELECT COUNT(*) AS n FROM tk)
         SELECT token, COUNT(*) AS cnt
         FROM tk, tot
         GROUP BY token, tot.n
         HAVING COUNT(*) >= CEIL(0.002 * tot.n)
         ORDER BY cnt DESC, token""",

    // mirrors Similarity.sq8TopK: same per-vector max-|x| scale, same
    // floor(x*127/m + 0.5) rounding, integer dots (order-independent),
    // same double sqrt/divide op order for the final score.
    "q79_sq8_ann" ->
      """WITH m AS (
           SELECT vec_id, list_max(list_transform(embedding,
             v -> abs(CAST(v AS DOUBLE)))) AS mx
           FROM embeddings),
         q8 AS (
           SELECT e.vec_id,
             CASE WHEN mx > 0 THEN list_transform(e.embedding,
                 v -> CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / mx + 0.5) AS BIGINT))
               ELSE list_transform(e.embedding, v -> CAST(0 AS BIGINT)) END AS qe
           FROM embeddings e JOIN m USING (vec_id)),
         selfd AS (
           SELECT vec_id, CAST(SUM(qe[i+1] * qe[i+1]) AS BIGINT) AS sd
           FROM q8 CROSS JOIN range(0, 64) t(i) GROUP BY 1),
         dots AS (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             CAST(SUM(q.qe[i+1] * c.qe[i+1]) AS BIGINT) AS dot
           FROM q8 q CROSS JOIN q8 c CROSS JOIN range(0, 64) t(i)
           WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
           GROUP BY 1, 2),
         scored AS (
           SELECT query_id, corpus_id,
             CASE WHEN sq.sd > 0 AND sc.sd > 0 THEN
               CAST(dot AS DOUBLE) / (sqrt(CAST(sq.sd AS DOUBLE)) * sqrt(CAST(sc.sd AS DOUBLE)))
             END AS qcos
           FROM dots
           JOIN selfd sq ON sq.vec_id = query_id
           JOIN selfd sc ON sc.vec_id = corpus_id),
         ranked AS (
           SELECT query_id, corpus_id, qcos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY qcos DESC NULLS LAST, corpus_id ASC) AS rank
           FROM scored)
         SELECT query_id, corpus_id, qcos, CAST(rank AS INT) AS rank
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",

    // replays all three closed-form fixture generators behind the
    // binaryFile scan: syntheticPng (w=16+id%16, h=16+(id//16)%16, rgb
    // formula), syntheticWav (n=256+id%256, s(i)=(i*31+id*17)%65536-32768),
    // syntheticAvi (w=8+id%8, h=8+(id//8)%8, n=2+id%3, bgr formula) —
    // uniform (kind, doc_id, d1, d2, n, checksum) shape.
    "q87_media_files" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
         img AS (
           SELECT 'image' AS kind, d.doc_id,
             CAST(d.w AS BIGINT) AS d1, CAST(d.h AS BIGINT) AS d2,
             CAST(3 AS BIGINT) AS n,
             CAST(SUM((x + d.doc_id) % 256 + (y + 2 * d.doc_id) % 256
                      + (x + y) % 256) AS BIGINT) AS checksum
           FROM (SELECT doc_id, 16 + doc_id % 16 AS w,
                        16 + (doc_id // 16) % 16 AS h FROM ids) d
           CROSS JOIN range(0, 32) tx(x) CROSS JOIN range(0, 32) ty(y)
           WHERE x < d.w AND y < d.h
           GROUP BY d.doc_id, d.w, d.h),
         aud AS (
           SELECT 'audio' AS kind, d.doc_id,
             CAST(8000 AS BIGINT) AS d1, CAST(1 AS BIGINT) AS d2,
             CAST(d.n AS BIGINT) AS n,
             CAST(SUM((i * 31 + d.doc_id * 17) % 65536 - 32768) AS BIGINT) AS checksum
           FROM (SELECT doc_id, 256 + doc_id % 256 AS n FROM ids) d
           CROSS JOIN range(0, 512) t(i)
           WHERE i < d.n
           GROUP BY d.doc_id, d.n),
         vid AS (
           SELECT 'video' AS kind, d.doc_id,
             CAST(d.w AS BIGINT) AS d1, CAST(d.h AS BIGINT) AS d2,
             CAST(d.n AS BIGINT) AS n,
             CAST(SUM((x + d.doc_id + f) % 256 + (y + 2 * d.doc_id) % 256
                      + (x + y + f) % 256) AS BIGINT) AS checksum
           FROM (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id // 8) % 8 AS h,
                        2 + doc_id % 3 AS n FROM ids) d
           CROSS JOIN range(0, 15) tx(x) CROSS JOIN range(0, 15) ty(y)
           CROSS JOIN range(0, 4) tf(f)
           WHERE x < d.w AND y < d.h AND f < d.n
           GROUP BY d.doc_id, d.w, d.h, d.n)
         SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid
         ORDER BY kind, doc_id""",

    // BM25 mirror: same tokenization, same one-row corpus stats, and the
    // SAME IEEE op sequence per term (rational idf, constants forced to
    // DOUBLE so DuckDB's decimal literals don't change the arithmetic).
    "q126_bm25" -> {
      def term(t: String, dfc: String) =
        s"""((CAST(n - $dfc AS DOUBLE) + 0.5) / (CAST($dfc AS DOUBLE) + 0.5))
            * (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)
               * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
            / (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)
               + CAST(1.2 AS DOUBLE)
                 * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
                    + (CAST(0.75 AS DOUBLE) * CAST(len(w) AS DOUBLE))
                      / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))"""
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         st AS (SELECT COUNT(*) AS n, CAST(SUM(len(w)) AS BIGINT) AS sumdl,
           CAST(SUM(CASE WHEN list_contains(w, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
           CAST(SUM(CASE WHEN list_contains(w, 'hash') THEN 1 ELSE 0 END) AS BIGINT) AS df2,
           CAST(SUM(CASE WHEN list_contains(w, 'vector') THEN 1 ELSE 0 END) AS BIGINT) AS df3
           FROM d),
         sc AS (SELECT doc_id,
           ${term("join", "df1")} + ${term("hash", "df2")} + ${term("vector", "df3")} AS bm25
           FROM d CROSS JOIN st)
         SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT 20"""
    },

    // mirrors Similarity.rrfFuse(bm25 top-50, cosine top-50): the q126
    // BM25 CTEs + the q31 exact-cosine CTEs for query 0, per-list
    // row_number ranks, and the identical two-term reciprocal sum.
    "q159_rrf_fusion" -> {
      def term(t: String, dfc: String) =
        s"""((CAST(n - $dfc AS DOUBLE) + 0.5) / (CAST($dfc AS DOUBLE) + 0.5))
            * (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)
               * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
            / (CAST(len(list_filter(w, x -> x = '$t')) AS DOUBLE)
               + CAST(1.2 AS DOUBLE)
                 * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
                    + (CAST(0.75 AS DOUBLE) * CAST(len(w) AS DOUBLE))
                      / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))"""
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         st AS (SELECT COUNT(*) AS n, CAST(SUM(len(w)) AS BIGINT) AS sumdl,
           CAST(SUM(CASE WHEN list_contains(w, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
           CAST(SUM(CASE WHEN list_contains(w, 'hash') THEN 1 ELSE 0 END) AS BIGINT) AS df2,
           CAST(SUM(CASE WHEN list_contains(w, 'vector') THEN 1 ELSE 0 END) AS BIGINT) AS df3
           FROM d),
         sc AS (SELECT doc_id,
           ${term("join", "df1")} + ${term("hash", "df2")} + ${term("vector", "df3")} AS bm25
           FROM d CROSS JOIN st),
         bmtop AS (SELECT doc_id AS id, bm25 AS score FROM sc
           ORDER BY bm25 DESC, doc_id LIMIT 50),
         bmr AS (SELECT id,
           row_number() OVER (ORDER BY score DESC NULLS LAST, id) AS r1
           FROM bmtop),
         nrm AS (
           SELECT vec_id, sqrt(CAST(SUM(CAST(FLOOR(
             CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1e12)
             AS DECIMAL(30,0))) AS DOUBLE) / 1e12) AS nrm
           FROM embeddings CROSS JOIN range(0, 64) t(i) GROUP BY 1),
         dots AS (
           SELECT c.vec_id AS id,
             CAST(SUM(CAST(FLOOR(
               CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings q
           CROSS JOIN embeddings c
           CROSS JOIN range(0, 64) t(i)
           WHERE q.vec_id = 0 AND c.vec_id <> 0
           GROUP BY 1),
         cosl AS (SELECT dots.id,
             CASE WHEN qn.nrm > 0 AND cn.nrm > 0
                  THEN dot / (qn.nrm * cn.nrm) END AS score
           FROM dots
           JOIN nrm qn ON qn.vec_id = 0
           JOIN nrm cn ON cn.vec_id = dots.id),
         costop AS (SELECT id, score FROM cosl
           ORDER BY score DESC NULLS LAST, id LIMIT 50),
         cosr AS (SELECT id,
           row_number() OVER (ORDER BY score DESC NULLS LAST, id) AS r2
           FROM costop),
         f AS (SELECT COALESCE(bmr.id, cosr.id) AS id,
             COALESCE(CAST(1.0 AS DOUBLE)
               / (CAST(60.0 AS DOUBLE) + CAST(r1 AS DOUBLE)), CAST(0.0 AS DOUBLE))
           + COALESCE(CAST(1.0 AS DOUBLE)
               / (CAST(60.0 AS DOUBLE) + CAST(r2 AS DOUBLE)), CAST(0.0 AS DOUBLE))
             AS rrf
           FROM bmr FULL OUTER JOIN cosr ON bmr.id = cosr.id)
         SELECT id, rrf FROM f ORDER BY rrf DESC, id LIMIT 20"""
    },

    // mirrors Similarity.mmrSelect over the top-20 cosine candidates:
    // exact pairwise cosines, then each greedy pick as one unrolled CTE
    // with the identical λ·rel − (1−λ)·maxsim op order and
    // DESC NULLS LAST, id tie-break.
    "q161_mmr_select" -> {
      val steps = (2 to 5).map { t =>
        s"""s$t AS (SELECT c.id FROM cand c
             WHERE c.id NOT IN (SELECT id FROM sel${t - 1})
             ORDER BY (CAST(0.7 AS DOUBLE) * c.rel
               - (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
                 * (SELECT MAX(p.cs) FROM psim p
                    WHERE p.ia = c.id AND p.ib IN (SELECT id FROM sel${t - 1})))
               DESC NULLS LAST, c.id LIMIT 1),
           sel$t AS (SELECT id FROM sel${t - 1} UNION ALL SELECT id FROM s$t)"""
      }.mkString(",\n         ")
      s"""WITH nrm AS (
           SELECT vec_id, sqrt(CAST(SUM(CAST(FLOOR(
             CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1e12)
             AS DECIMAL(30,0))) AS DOUBLE) / 1e12) AS nrm
           FROM embeddings CROSS JOIN range(0, 64) t(i) GROUP BY 1),
         dots AS (
           SELECT c.vec_id AS id,
             CAST(SUM(CAST(FLOOR(
               CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings q CROSS JOIN embeddings c CROSS JOIN range(0, 64) t(i)
           WHERE q.vec_id = 0 AND c.vec_id <> 0
           GROUP BY 1),
         cosl AS (SELECT dots.id,
             CASE WHEN qn.nrm > 0 AND cn.nrm > 0
                  THEN dot / (qn.nrm * cn.nrm) END AS score
           FROM dots
           JOIN nrm qn ON qn.vec_id = 0
           JOIN nrm cn ON cn.vec_id = dots.id),
         costop AS (SELECT id, score FROM cosl
           ORDER BY score DESC NULLS LAST, id LIMIT 20),
         cand AS (SELECT id, score AS rel FROM costop),
         pd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             CAST(SUM(CAST(FLOOR(
               CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings a
           JOIN cand ca ON a.vec_id = ca.id
           JOIN embeddings b ON b.vec_id <> a.vec_id
           JOIN cand cb ON b.vec_id = cb.id
           CROSS JOIN range(0, 64) t(i)
           GROUP BY 1, 2),
         psim AS (SELECT ia, ib,
             CASE WHEN na.nrm > 0 AND nb.nrm > 0
                  THEN dot / (na.nrm * nb.nrm) END AS cs
           FROM pd JOIN nrm na ON na.vec_id = ia JOIN nrm nb ON nb.vec_id = ib),
         s1 AS (SELECT id FROM cand ORDER BY rel DESC NULLS LAST, id LIMIT 1),
         sel1 AS (SELECT id FROM s1),
         $steps
         SELECT * FROM (
           SELECT 1 AS pick_idx, id FROM s1
           UNION ALL SELECT 2, id FROM s2
           UNION ALL SELECT 3, id FROM s3
           UNION ALL SELECT 4, id FROM s4
           UNION ALL SELECT 5, id FROM s5) u
         ORDER BY pick_idx"""
    },

    // q113's LM CTEs + the lang join, with the per-language third-cut as a
    // plain ntile(3) window — the engine replays ntile semantics in exact
    // integer arithmetic without the single-task window.
    "q127_perplexity_buckets" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         p AS (SELECT doc_id,
             unnest(list_transform(range(len(w) - 1),
               i -> concat(w[i+1], ' ', w[i+2]))) AS bg
           FROM d WHERE len(w) >= 2),
         q AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM p),
         cb AS (SELECT bg, COUNT(*) AS cb FROM q GROUP BY 1),
         cu AS (SELECT w1, COUNT(*) AS cu FROM q GROUP BY 1),
         s AS (SELECT q.doc_id,
             CAST(cb.cb AS DOUBLE) / CAST(cu.cu AS DOUBLE) AS pr
           FROM q JOIN cb USING (bg) JOIN cu USING (w1)),
         sc AS (SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(CAST(FLOOR((pr) * 1000000.0) AS DECIMAL(30,0))) AS DOUBLE) / 1000000.0
             / COUNT(*) AS mean_p
           FROM s GROUP BY 1),
         j AS (SELECT sc.doc_id, dd.lang, sc.n_bigrams, sc.mean_p,
             ntile(3) OVER (PARTITION BY dd.lang
               ORDER BY sc.mean_p DESC, sc.doc_id) AS nt
           FROM sc JOIN documents dd USING (doc_id))
         SELECT doc_id, lang, n_bigrams, mean_p,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         FROM j ORDER BY doc_id""",

    // same shingle construction as q28/q84 (whole-doc fallback under 4
    // tokens), two-level aggregation, identical tiebreak under the LIMIT.
    "q128_crossdoc_ngrams" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         g AS (SELECT doc_id, CASE WHEN len(w) >= 4
             THEN list_transform(range(len(w) - 3),
               i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3], ' ', w[i+4]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         e AS (SELECT doc_id, unnest(s) AS ngram FROM g),
         pd AS (SELECT ngram, doc_id, COUNT(*) AS k FROM e GROUP BY 1, 2),
         x AS (SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(k) AS BIGINT) AS n_occurrences
           FROM pd GROUP BY 1)
         SELECT ngram, n_docs, n_occurrences FROM x WHERE n_docs >= 2
         ORDER BY n_docs DESC, n_occurrences DESC, ngram LIMIT 200""",

    // mirrors Ml.stratifiedSplit: md5-rank within language vs ⌊n·0.8⌋.
    "q129_stratified_split" ->
      """WITH r AS (SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
           COUNT(*) OVER (PARTITION BY lang) AS n
         FROM documents)
         SELECT doc_id, lang,
           CASE WHEN rk <= CAST(FLOOR(CAST(n AS DOUBLE) * 0.8) AS BIGINT)
             THEN 'train' ELSE 'test' END AS split
         FROM r ORDER BY doc_id""",

    // same punctuation decoration, same lookaround-free sentence split.
    "q130_sentence_stats" ->
      """WITH dec AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             ' slow ', '. ', 'g'), ' fast ', '! ', 'g'), ' window ', '? ', 'g') AS text
         FROM documents),
         s AS (SELECT doc_id,
           list_filter(string_split_regex(text, '[.!?]+\s+'),
             x -> length(trim(x)) > 0) AS sents
         FROM dec),
         tc AS (SELECT doc_id,
           list_transform(sents, x -> len(string_split_regex(trim(x), '\s+'))) AS tcs
         FROM s)
         SELECT doc_id,
           CAST(len(tcs) AS INT) AS n_sentences,
           CAST(list_sum(tcs) AS BIGINT) AS n_tokens,
           CAST(list_sum(tcs) AS DOUBLE) / len(tcs) AS mean_sent_tokens,
           CAST(list_max(tcs) AS INT) AS max_sent_tokens
         FROM tc ORDER BY doc_id""",

    // mirrors TextStats.stripMarkup step by step: script/style elements,
    // comments, tags, the six entities (&amp; last), [ \t\n\r]+ collapse —
    // identical pattern strings, 'g' because DuckDB replaces first-only
    // by default where Spark replaces all.
    "q286_strip_markup" ->
      """WITH h AS (SELECT doc_id,
           '<html><head><style>p{color:red}</style></head><body data-id="'
             || CAST(doc_id AS VARCHAR) || '"><p>'
             || regexp_replace(text, ' the ', ' &amp;the ', 'g')
             || '</p><br/><script type="text/javascript">var x = 1 < 2;</script><!-- trailer --></body></html>'
             AS html
         FROM documents),
         s AS (SELECT doc_id, html,
           trim(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(html,
                 '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]*>', ' ', 'g'),
               '&nbsp;', ' ', 'g'),
               '&lt;', '<', 'g'),
               '&gt;', '>', 'g'),
               '&quot;', '"', 'g'),
               '&#39;', '''', 'g'),
               '&amp;', '&', 'g'),
             '[ \t\n\r]+', ' ', 'g')) AS text
         FROM h)
         SELECT doc_id,
           CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
           CAST(length(html) AS BIGINT) AS raw_len,
           CAST(length(text) AS BIGINT) AS text_len,
           CASE WHEN length(html) > 0
             THEN (10000 * (CAST(length(html) AS BIGINT)
                            - CAST(length(text) AS BIGINT)))
                  // CAST(length(html) AS BIGINT)
             ELSE 0 END AS markup_bp,
           text
         FROM s ORDER BY doc_id""",

    // centroid means and distance sums replay the floor-scaled exact-sum
    // forms; the mean+2σ gate repeats the identical IEEE op sequence.
    "q131_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
         c AS (SELECT label, i,
             CAST(SUM(CAST(FLOOR(CAST(embedding[i+1] AS DOUBLE) * 1000000.0)
               AS DECIMAL(30,0))) AS DOUBLE) / 1000000.0 / COUNT(*) AS m
           FROM e CROSS JOIN range(0, 64) t(i) GROUP BY 1, 2),
         dist AS (SELECT e.vec_id, e.label,
             CAST(SUM(CAST(FLOOR((CAST(e.embedding[t.i+1] AS DOUBLE) - c.m)
               * (CAST(e.embedding[t.i+1] AS DOUBLE) - c.m) * 1000000.0)
               AS BIGINT)) AS DOUBLE) / 1000000.0 AS sq_dist
           FROM e CROSS JOIN range(0, 64) t(i)
           JOIN c ON c.label = e.label AND c.i = t.i
           GROUP BY 1, 2),
         st AS (SELECT label,
             CAST(SUM(CAST(FLOOR(sq_dist * 1000000.0) AS DECIMAL(30,0)))
               AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_d,
             CAST(SUM(CAST(FLOOR(sq_dist * sq_dist * 1000000.0) AS DECIMAL(30,0)))
               AS DOUBLE) / 1000000.0 / COUNT(*) AS msq
           FROM dist GROUP BY 1)
         SELECT d.vec_id, d.label, d.sq_dist,
           d.sq_dist > st.mean_d + CAST(2.0 AS DOUBLE)
             * sqrt(greatest(st.msq - st.mean_d * st.mean_d, CAST(0.0 AS DOUBLE))) AS is_outlier
         FROM dist d JOIN st USING (label) ORDER BY d.vec_id""",

    // mirrors Bpe.encode under the same replayed fit: dense symbol ids by
    // sort order, per-doc id sequence in (word, symbol) order.
    "q143_bpe_encode" ->
      s"""WITH RECURSIVE ${bpeCtes(8)},
         vid AS (SELECT sym, row_number() OVER (ORDER BY sym) - 1 AS id
           FROM (SELECT DISTINCT unnest(syms) AS sym FROM s9)),
         d2 AS (SELECT doc_id, string_split($normSql, ' ') AS ws
           FROM documents WHERE doc_id < 200),
         words AS (SELECT doc_id, wp, ws[CAST(wp + 1 AS INT)] AS w
           FROM d2 CROSS JOIN range(0, 4096) t(wp) WHERE wp < len(ws)),
         syms AS (SELECT wo.doc_id, wo.wp, sp, s9.syms[CAST(sp + 1 AS INT)] AS sym
           FROM words wo JOIN s9 USING (w)
           CROSS JOIN range(0, 64) u(sp) WHERE sp < len(s9.syms))
         SELECT s.doc_id, COUNT(*) AS n_ids,
           string_agg(CAST(v.id AS VARCHAR), ',' ORDER BY s.wp, s.sp) AS ids
         FROM syms s JOIN vid v USING (sym)
         GROUP BY 1 ORDER BY 1""",

    // mirrors Similarity.hardNegatives: q31's exact-cosine frame plus the
    // label-inequality predicate.
    "q142_hard_negatives" ->
      """WITH n AS (
           SELECT vec_id, sqrt(CAST(SUM(CAST(FLOOR(
             CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1e12)
             AS DECIMAL(30,0))) AS DOUBLE) / 1e12) AS nrm
           FROM embeddings CROSS JOIN range(0, 64) t(i) GROUP BY 1),
         dots AS (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             c.label AS neg_label,
             CAST(SUM(CAST(FLOOR(
               CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings q
           CROSS JOIN embeddings c
           CROSS JOIN range(0, 64) t(i)
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
             AND c.label <> q.label
           GROUP BY 1, 2, 3),
         scored AS (
           SELECT query_id, corpus_id, neg_label,
             dot / (nq.nrm * nc.nrm) AS cosine,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot / (nq.nrm * nc.nrm) DESC, corpus_id ASC) AS rank
           FROM dots
           JOIN n nq ON nq.vec_id = query_id
           JOIN n nc ON nc.vec_id = corpus_id)
         SELECT query_id, corpus_id, neg_label, cosine, CAST(rank AS INT) AS rank
         FROM scored WHERE rank <= 3 ORDER BY query_id, rank""",

    // mirrors Similarity.knnClassify: the q142 exact-cosine scoring with
    // a disjoint query/corpus split, k=5 window top-k, then the same
    // deterministic (votes DESC, best rank ASC, label ASC) vote pick.
    "q183_knn_classify" ->
      """WITH n AS (
           SELECT vec_id, sqrt(CAST(SUM(CAST(FLOOR(
             CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1e12)
             AS DECIMAL(30,0))) AS DOUBLE) / 1e12) AS nrm
           FROM embeddings CROSS JOIN range(0, 64) t(i) GROUP BY 1),
         dots AS (
           SELECT q.vec_id AS query_id, q.label AS true_label,
             c.vec_id AS corpus_id, c.label AS c_label,
             CAST(SUM(CAST(FLOOR(
               CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings q
           CROSS JOIN embeddings c
           CROSS JOIN range(0, 64) t(i)
           WHERE q.vec_id < 40 AND c.vec_id >= 40 AND c.vec_id <> q.vec_id
           GROUP BY 1, 2, 3, 4),
         topk AS (
           SELECT query_id, true_label, c_label,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot / (nq.nrm * nc.nrm) DESC, corpus_id ASC) AS rank
           FROM dots
           JOIN n nq ON nq.vec_id = query_id
           JOIN n nc ON nc.vec_id = corpus_id),
         votes AS (
           SELECT query_id, true_label, c_label,
             CAST(COUNT(*) AS BIGINT) AS votes,
             MIN(rank) AS best_rank
           FROM topk WHERE rank <= 5 GROUP BY 1, 2, 3),
         pick AS (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY votes DESC, best_rank ASC, c_label ASC) AS vr
           FROM votes)
         SELECT query_id, true_label, c_label AS pred_label, votes,
           c_label = true_label AS correct
         FROM pick WHERE vr = 1 ORDER BY query_id""",

    // mirrors TextStats.corpusReport: q34 scorer + fingerprint distincts,
    // floor-scaled exact mean.
    "q141_corpus_report" ->
      s"""WITH per AS (SELECT source,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
           length(text) AS n_chars2,
           length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
             tk -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'], tk))) AS sw_hits,
           md5($normSql) AS fp
         FROM documents),
         q AS (SELECT source, n_tok, fp,
           4000 * least(n_tok, 100)
           + (300000 * least(4 * sw_hits, greatest(n_tok, 1)))
             // greatest(n_tok, 1)
           + (150000 * (greatest(n_chars2, 1)
               - least(5 * n_punct, greatest(n_chars2, 1))))
             // greatest(n_chars2, 1)
           + (150000 * (greatest(n_chars2, 1)
               - least(5 * n_digit, greatest(n_chars2, 1))))
             // greatest(n_chars2, 1) AS ppm
         FROM per)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(ppm) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean_quality,
           COUNT(*) - COUNT(DISTINCT fp) AS n_exact_dups
         FROM q GROUP BY 1 ORDER BY 1""",

    // mirrors Bpe.train: the 8 chosen (pair, count) rows in learning order.
    "q139_bpe_train" ->
      s"""WITH RECURSIVE ${bpeCtes(8)}
         SELECT * FROM (
           ${(1 to 8).map(i =>
             s"SELECT CAST($i AS INT) AS merge_idx, bx AS lhs, by AS rhs, CAST(c AS BIGINT) AS pair_count FROM b$i")
             .mkString("\n UNION ALL ")}) u
         ORDER BY merge_idx""",

    // mirrors Bpe.tokenCounts under the same fit: token stream joined to
    // the final vocabulary state's symbol counts.
    "q140_bpe_tokenize" ->
      s"""WITH RECURSIVE ${bpeCtes(8)},
         d2 AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
           FROM documents)
         SELECT d2.doc_id, COUNT(*) AS n_words,
           CAST(SUM(len(s9.syms)) AS BIGINT) AS n_bpe_tokens
         FROM d2 JOIN s9 USING (w)
         GROUP BY 1 ORDER BY 1""",

    // mirrors TextStats.collocations: q74's bigram lists, unfiltered
    // pair total, identical lift op order, (lift DESC, w1, w2) cut.
    "q218_collocations" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         g2 AS (SELECT doc_id, CASE WHEN len(w) >= 2
             THEN list_transform(range(len(w) - 1), i -> concat(w[i+1], ' ', w[i+2]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         prs AS (SELECT unnest(s) AS s FROM g2),
         sp AS (SELECT string_split(s, ' ') AS p FROM prs),
         f AS (SELECT p[1] AS w1, p[2] AS w2 FROM sp WHERE len(p) = 2),
         pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
           FROM f GROUP BY 1, 2),
         np AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS np FROM pc),
         toks AS (SELECT unnest(w) AS w FROM d),
         uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
           FROM toks GROUP BY 1),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks)
         SELECT pc.w1, pc.w2, pc.n_pair,
           u1.cu AS n_w1, u2.cu AS n_w2,
           CAST(pc.n_pair AS DOUBLE) / CAST(np.np AS DOUBLE)
             / (CAST(u1.cu AS DOUBLE) / CAST(nt.n AS DOUBLE)
                * (CAST(u2.cu AS DOUBLE) / CAST(nt.n AS DOUBLE))) AS lift
         FROM pc
         JOIN uni u1 ON u1.w = pc.w1
         JOIN uni u2 ON u2.w = pc.w2
         CROSS JOIN np CROSS JOIN nt
         WHERE pc.n_pair >= 5
         ORDER BY lift DESC, pc.w1, pc.w2 LIMIT 100""",

    // mirrors Similarity.rboOverlap over the two cosine top-20 lists:
    // identical rank build, max-rank overlap counting, and the SAME
    // repeated-multiplication weight doubles embedded as e-notation
    // literals (a plain decimal literal would parse as DECIMAL).
    "q205_rbo" -> {
      val p = 0.9; val k = 20
      val weights = { var w = 1.0
        (1 to k).map { d => val cur = w; w *= p; (d, cur) } }
      val values = weights.map { case (d, w) =>
        f"($d, $w%.17e)" }.mkString(", ")
      val oneMinusP = f"${1.0 - p}%.17e"
      def side(q: Int, name: String) =
        s"""dots$name AS (
           SELECT c.vec_id AS id,
             CAST(SUM(CAST(FLOOR(
               CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings q CROSS JOIN embeddings c CROSS JOIN range(0, 64) t(i)
           WHERE q.vec_id = $q AND c.vec_id <> $q
           GROUP BY 1),
         cosl$name AS (SELECT dots$name.id,
             CASE WHEN qn.nrm > 0 AND cn.nrm > 0
                  THEN dot / (qn.nrm * cn.nrm) END AS score
           FROM dots$name
           JOIN nrm qn ON qn.vec_id = $q
           JOIN nrm cn ON cn.vec_id = dots$name.id),
         r$name AS (SELECT id, r FROM (SELECT id,
             row_number() OVER (ORDER BY score DESC NULLS LAST, id) AS r
           FROM cosl$name) z WHERE r <= $k)"""
      s"""WITH nrm AS (
           SELECT vec_id, sqrt(CAST(SUM(CAST(FLOOR(
             CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1e12)
             AS DECIMAL(30,0))) AS DOUBLE) / 1e12) AS nrm
           FROM embeddings CROSS JOIN range(0, 64) t(i) GROUP BY 1),
         ${side(0, "a")},
         ${side(1, "b")},
         m AS (SELECT GREATEST(ra.r, rb.r) AS m
           FROM ra JOIN rb USING (id)),
         terms AS (SELECT v.d, v.w,
             (SELECT COUNT(*) FROM m WHERE m.m <= v.d) AS ov
           FROM (VALUES $values) v(d, w))
         SELECT CAST($k AS INTEGER) AS k, CAST(9.0e-1 AS DOUBLE) AS p,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS overlap_at_k,
           CAST($oneMinusP AS DOUBLE) *
             (CAST(SUM(CAST(FLOOR(
               (w * CAST(ov AS DOUBLE) / CAST(d AS DOUBLE))
               * 1000000000000.0) AS DECIMAL(38,0))) AS DOUBLE)
              / 1000000000000.0) AS rbo
         FROM terms"""
    },

    // mirrors TextDedup.removeDupSpans: the q84 shingle-hash replay with
    // positions, covered-token expansion, anti-join survival, and
    // position-ordered reassembly.
    "q204_remove_dup_spans" ->
      s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS w FROM documents),
         g AS (SELECT doc_id, len(w) AS lw, CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2), i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))
             ELSE [array_to_string(w, ' ')] END AS s FROM d),
         h0 AS (SELECT doc_id, lw, unnest(list_transform(range(len(s)),
             i -> {'p': i, 'hh': CAST(concat('0x',
               substr(md5(s[CAST(i+1 AS INT)]), 1, 15)) AS BIGINT)})) AS ph
           FROM g),
         h AS (SELECT doc_id, lw, ph.p AS p, ph.hh AS hh FROM h0),
         c AS (SELECT hh, COUNT(*) AS c FROM h GROUP BY 1),
         dup AS (SELECT hh FROM c WHERE c >= 2),
         cov AS (SELECT DISTINCT doc_id,
             unnest(range(p, LEAST(p + 3, lw))) AS tp
           FROM h JOIN dup USING (hh)),
         tok0 AS (SELECT doc_id, unnest(list_transform(range(len(w)),
             i -> {'tp': i, 'tok': w[CAST(i+1 AS INT)]})) AS pt FROM d),
         tok AS (SELECT doc_id, pt.tp AS tp, pt.tok AS tok FROM tok0),
         kept AS (SELECT tok.doc_id, tok.tp, tok.tok
           FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id
             AND cov.tp = tok.tp
           WHERE cov.doc_id IS NULL),
         agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS kept
           FROM kept GROUP BY 1)
         SELECT d.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
           CAST(len(d.w) AS INTEGER) AS n_tokens,
           CAST(len(d.w) - COALESCE(agg.kept, 0) AS BIGINT) AS n_removed
         FROM d LEFT JOIN agg USING (doc_id)
         ORDER BY d.doc_id""",

    // mirrors TextStats.fleschKincaid: identical word/sentence/syllable
    // regexp counts and the fixed grade formula (e-notation constants —
    // DuckDB parses plain decimals as DECIMAL, not DOUBLE).
    "q202_readability" ->
      """WITH f AS (SELECT lang,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS w,
           GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
           FROM documents WHERE lang IS NOT NULL),
         g AS (SELECT lang,
           CASE WHEN w > 0 THEN
             3.9e-1 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
             + 1.18e1 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE))
             - 1.559e1 END AS fk
           FROM f)
         SELECT lang, CAST(COUNT(fk) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(FLOOR(fk * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
             / 1000000.0 / COUNT(fk) AS mean_fk,
           MIN(fk) AS min_fk, MAX(fk) AS max_fk
         FROM g GROUP BY 1 ORDER BY 1""",

    // mirrors q198: the q140 fit+apply replay aggregated per language.
    "q198_tokenizer_fertility" ->
      s"""WITH RECURSIVE ${bpeCtes(8)},
         d2 AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w
           FROM documents),
         tc AS (SELECT d2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(len(s9.syms)) AS BIGINT) AS n_bpe
           FROM d2 JOIN s9 USING (w)
           GROUP BY 1)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)
             AS tokens_per_word,
           CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_bpe) AS DOUBLE)
             AS chars_per_token
         FROM tc JOIN documents USING (doc_id)
         WHERE lang IS NOT NULL
         GROUP BY 1 ORDER BY 1""",

    // mirrors DomainMix.dsirResample: same hashed buckets, add-one ratio
    // affinity (exact integer products, one double division), floor-scaled
    // exact mean, md5-uniform keep draw.
    "q136_dsir_resample" ->
      s"""WITH d AS (SELECT doc_id, (source = 'src0') AS tgt,
           string_split($normSql, ' ') AS w FROM documents),
         tok AS (SELECT doc_id, tgt, unnest(w) AS tok FROM d),
         tb AS (SELECT doc_id, tgt,
             CAST(concat('0x', substr(md5(tok), 1, 7)) AS BIGINT) % 4096 AS b
           FROM tok),
         counts AS (SELECT b,
             SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
           FROM tb GROUP BY 1),
         tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM counts),
         aff AS (SELECT b,
             CAST((ct+1)*(nr+4096) AS DOUBLE)
               / CAST((ct+1)*(nr+4096) + (cr+1)*(nt+4096) AS DOUBLE) AS a
           FROM counts, tot),
         pd AS (SELECT t.doc_id, COUNT(*) AS n_tok,
             CAST(SUM(CAST(FLOOR(a.a * 1000000.0) AS DECIMAL(30,0))) AS DOUBLE)
               / 1000000.0 / COUNT(*) AS affinity
           FROM tb t JOIN aff a USING (b) GROUP BY 1)
         SELECT doc_id, n_tok, affinity,
           (CAST(CAST(concat('0x', substr(md5(concat('dsir#',
              CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000000 AS DOUBLE)
              / 1000000.0) < affinity AS selected
         FROM pd ORDER BY doc_id""",

    // mirrors TextDedup.nearDupKeepBest: q60's candidate/component CTEs +
    // q34's quality expression, winner per component via row_number over
    // (q_score DESC, id ASC) — the same order the Spark struct-max induces.
    "q135_dedup_keep_best" ->
      s"""WITH RECURSIVE ${minhashCandidateCtes(32)},
         cand AS (
           SELECT p.id_a, p.id_b FROM pairs0 p
           JOIN sig sa ON sa.id = p.id_a JOIN sig sb ON sb.id = p.id_b
           WHERE ${estJaccardSql} >= 0.5),
         edges AS (SELECT id_a AS src, id_b AS dst FROM cand
                   UNION SELECT id_b, id_a FROM cand),
         reach AS (
           SELECT id, id AS r FROM d
           UNION
           SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
         labels AS (SELECT id, min(r) AS group_id FROM reach GROUP BY id),
         q AS (SELECT doc_id AS id,
             least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.4 +
             least(CAST(sw_hits AS DOUBLE) / greatest(n_tok, 1) * 4.0, 1.0) * 0.3 +
             (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(n_chars2, 1) * 5.0, 1.0)) * 0.15 +
             (1.0 - least(CAST(n_digit AS DOUBLE) / greatest(n_chars2, 1) * 5.0, 1.0)) * 0.15 AS q_score
           FROM (
             SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tok,
               length(text) AS n_chars2,
               length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               len(list_filter(string_split_regex(trim(text), '\\s+'),
                 tk -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be','this'], tk))) AS sw_hits
             FROM documents) t),
         sel AS (SELECT l.id, l.group_id, q.q_score,
             row_number() OVER (PARTITION BY l.group_id
               ORDER BY q.q_score DESC, l.id ASC) AS rn
           FROM labels l JOIN q ON q.id = l.id)
         SELECT id AS doc_id, group_id, q_score, rn = 1 AS keep
         FROM sel ORDER BY doc_id""",

    // mirrors TextDedup.fuzzyJoin: both sides minhashed with the shared
    // coefficient family, band-key equi-join for candidates, estimated
    // Jaccard (agreeing positions / 64 — exact k/64 doubles) gate.
    "q134_fuzzy_join" ->
      s"""WITH lsrc AS (SELECT doc_id AS id, text FROM documents),
         rsrc AS (SELECT doc_id + 1000000 AS id,
             replace(text, ' data ', ' info ') AS text
           FROM documents WHERE doc_id % 50 = 0),
         ${minhashSigCtes("L", "lsrc")},
         ${minhashSigCtes("R", "rsrc")},
         ${bandCte("L", 16, 4)},
         ${bandCte("R", 16, 4)},
         cand AS (SELECT DISTINCT l.id AS left_id, r.id AS right_id
           FROM bandL l JOIN bandR r USING (band)),
         est AS (SELECT c.left_id, c.right_id, ${estJaccardSql} AS est_jaccard
           FROM cand c
           JOIN sigL sa ON sa.id = c.left_id
           JOIN sigR sb ON sb.id = c.right_id)
         SELECT left_id, right_id, est_jaccard FROM est
         WHERE est_jaccard >= 0.5 ORDER BY left_id, right_id""",

    // mirrors TextDedup.lineDedup after the same literal decoration: line
    // table via list-index explode, kill list = normalized-line hashes in
    // >= 2 docs, survivors reassembled in position order.
    "q133_line_dedup" ->
      """WITH dec AS (SELECT doc_id,
           replace(replace(replace(text, ' slow ', chr(10)), ' fast ', chr(10)), ' window ', chr(10)) AS text
         FROM documents),
         sp AS (SELECT doc_id, string_split(text, chr(10)) AS xs FROM dec),
         lines AS (SELECT doc_id, i AS pos, xs[i+1] AS line
           FROM sp CROSS JOIN range(0, 1024) t(i) WHERE i < len(xs)),
         kill AS (SELECT md5(lower(trim(line))) AS lkey
           FROM lines GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
         kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
           WHERE md5(lower(trim(l.line))) NOT IN (SELECT lkey FROM kill)),
         reb AS (SELECT doc_id, count(*) AS n_lines_kept,
             string_agg(line, chr(10) ORDER BY pos) AS text_dedup
           FROM kept GROUP BY 1)
         SELECT sp.doc_id, CAST(len(sp.xs) AS BIGINT) AS n_lines,
           COALESCE(reb.n_lines_kept, 0) AS n_lines_kept,
           COALESCE(reb.text_dedup, '') AS text_dedup
         FROM sp LEFT JOIN reb USING (doc_id) ORDER BY sp.doc_id""",

    // mirrors TextStats.zipfSlope: the normSql token stream, top-500
    // terms on (count DESC, term ASC), ln-ln OLS from floor-scaled sums.
    "q238_zipf" ->
      s"""WITH toks AS (SELECT unnest(string_split($normSql, ' ')) AS w
           FROM documents),
         tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks
           WHERE len(w) > 0 GROUP BY 1),
         top AS (SELECT w, c FROM tc ORDER BY c DESC, w ASC LIMIT 500),
         pts AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w ASC)
               AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
           FROM top),
         m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(FLOOR(x * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sx,
             CAST(SUM(CAST(FLOOR(y * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sy,
             CAST(SUM(CAST(FLOOR(x * x * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sxx,
             CAST(SUM(CAST(FLOOR(x * y * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS sxy,
             CAST(SUM(CAST(FLOOR(y * y * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS syy
           FROM pts)
         SELECT CAST(n AS BIGINT) AS n_terms,
           CASE WHEN n * sxx - sx * sx > 0.0
             THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
           CASE WHEN n * sxx - sx * sx > 0.0
             THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
               / n END AS intercept,
           CASE WHEN n * sxx - sx * sx > 0.0 AND n * syy - sy * sy > 0.0
             THEN ((n * sxy - sx * sy) / sqrt(n * sxx - sx * sx))
               * ((n * sxy - sx * sy) / sqrt(n * sxx - sx * sx))
               / (n * syy - sy * sy) END AS r2
         FROM m""",

    // mirrors q248: the q31 exact-cosine machinery at 64 and at 16 dims,
    // rank ≤ 10, then the per-query recall join.
    "q248_dim_truncation" -> {
      def topk(dims: Int, alias: String) =
        s"""${alias}n AS (
           SELECT vec_id, sqrt(CAST(SUM(CAST(FLOOR(
             CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE) * 1e12)
             AS DECIMAL(30,0))) AS DOUBLE) / 1e12) AS nrm
           FROM embeddings CROSS JOIN range(0, $dims) t(i) GROUP BY 1),
         ${alias}d AS (
           SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
             CAST(SUM(CAST(FLOOR(
               CAST(q.embedding[i+1] AS DOUBLE) * CAST(c.embedding[i+1] AS DOUBLE) * 1e12)
               AS DECIMAL(30,0))) AS DOUBLE) / 1e12 AS dot
           FROM embeddings q
           CROSS JOIN embeddings c
           CROSS JOIN range(0, $dims) t(i)
           WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
           GROUP BY 1, 2),
         ${alias}s AS (
           SELECT query_id, corpus_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot / (nq.nrm * nc.nrm) DESC, corpus_id ASC) AS rank
           FROM ${alias}d
           JOIN ${alias}n nq ON nq.vec_id = query_id
           JOIN ${alias}n nc ON nc.vec_id = corpus_id),
         ${alias}k AS (SELECT query_id, corpus_id FROM ${alias}s
           WHERE rank <= 10)"""
      s"""WITH ${topk(64, "f")},
         ${topk(16, "t")}
         SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COALESCE(SUM(CASE WHEN t.corpus_id IS NOT NULL
             THEN 1 ELSE 0 END), 0) AS BIGINT) AS overlap,
           CAST(COALESCE(SUM(CASE WHEN t.corpus_id IS NOT NULL
             THEN 1 ELSE 0 END), 0) AS DOUBLE) / CAST(COUNT(*) AS BIGINT)
             AS recall_at_k
         FROM fk f LEFT JOIN tk t
           ON t.query_id = f.query_id AND t.corpus_id = f.corpus_id
         GROUP BY 1 ORDER BY 1"""
    },

    // mirrors q266: exact-sum centroids over range(64), floor-scaled
    // norm/dot sums, identical cosine sequence.
    "q266_label_affinity" ->
      """WITH comp AS (SELECT label, i AS pos,
             CAST(embedding[i+1] AS DOUBLE) AS v
           FROM embeddings CROSS JOIN range(0, 64) t(i)),
         cent AS (SELECT label, pos,
             CAST(SUM(CAST(FLOOR(v * 1000000000.0) AS DECIMAL(38,0)))
               AS DOUBLE) / 1000000000.0 / COUNT(*) AS c
           FROM comp GROUP BY 1, 2),
         norms AS (SELECT label,
             sqrt(CAST(SUM(CAST(FLOOR(c * c * 1e12) AS DECIMAL(38,0)))
               AS DOUBLE) / 1e12) AS nrm
           FROM cent GROUP BY 1),
         dots AS (SELECT a.label AS la, b.label AS lb,
             CAST(SUM(CAST(FLOOR(a.c * b.c * 1e12) AS DECIMAL(38,0)))
               AS DOUBLE) / 1e12 AS dot
           FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
           GROUP BY 1, 2)
         SELECT la, lb, dot / (na.nrm * nb.nrm) AS cosine
         FROM dots
         JOIN norms na ON na.label = la
         JOIN norms nb ON nb.label = lb
         ORDER BY la, lb""",

    // mirrors TextStats.canonicalUrl/urlDedupReport: the identical
    // regexp strip/extract/lower sequence over the decorated URLs.
    "q251_url_canonical" ->
      """WITH u AS (SELECT concat('HTTPS://', upper(source),
             '.Example.COM/Page/', CAST(doc_id % 50 AS VARCHAR),
             CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
             '?utm_source=', lang, '#sec') AS url
           FROM documents),
         c0 AS (SELECT regexp_replace(regexp_replace(url, '#.*$', ''),
             '\?.*$', '') AS nq FROM u),
         c1 AS (SELECT nq,
             regexp_extract(nq, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', 0)
               AS pre FROM c0),
         c2 AS (SELECT concat(lower(pre),
             regexp_replace(substr(nq, length(pre) + 1), '/$', '')) AS c
           FROM c1),
         h AS (SELECT c, regexp_extract(c, '://([^/]+)', 1) AS host FROM c2)
         SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT c) AS BIGINT) AS n_canonical,
           CAST(COUNT(*) - COUNT(DISTINCT c) AS BIGINT) AS n_dups
         FROM h GROUP BY 1 ORDER BY 1""",

    // mirrors TextDedup.incrementalMinhashDedup: the q29 signature/banding
    // CTEs over the whole corpus, the NEW(id%5=0) x OLD band join, the
    // signature-agreement verify, lowest-id match per batch doc.
    "q368_incremental_dedup" ->
      s"""WITH ${minhashCandidateCtes(32)},
         cd AS (SELECT DISTINCT b.id AS nid, o.id AS oid
           FROM banded b JOIN banded o ON b.band = o.band
           WHERE b.id % 5 = 0 AND o.id % 5 <> 0),
         ver AS (SELECT cd.nid, cd.oid, $estJaccardSql AS est
           FROM cd JOIN sig sa ON sa.id = cd.nid
             JOIN sig sb ON sb.id = cd.oid),
         keep AS (SELECT nid, oid, est,
             ROW_NUMBER() OVER (PARTITION BY nid ORDER BY oid, est) AS rn
           FROM ver WHERE est >= 0.5)
         SELECT d.doc_id AS id, (k.oid IS NOT NULL) AS is_dup,
           k.oid AS dup_of, k.est AS est_jaccard
         FROM documents d LEFT JOIN keep k
           ON k.nid = d.doc_id AND k.rn = 1
         WHERE d.doc_id % 5 = 0
         ORDER BY id""",

    // mirrors TextStats.scriptProfile: the identical codepoint-range
    // regexp counts (RE2 \x{...} classes, 'g' replace) and the same
    // pinned dominant-script CASE chain.
    "q417_script_profile" ->
      """SELECT doc_id AS id, length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
             AS latin,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
             AS digit,
           length(text) - length(regexp_replace(text,
             '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
           length(text) - length(regexp_replace(text,
             '[\x{0400}-\x{04ff}]', '', 'g')) AS cyrillic,
           length(text) - length(regexp_replace(text, '[ \t\n\r]', '',
             'g')) AS space,
           length(text)
             - (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
             - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
             - (length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')))
             - (length(text) - length(regexp_replace(text, '[\x{0400}-\x{04ff}]', '', 'g')))
             - (length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')))
             AS other,
           CASE WHEN length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  >= length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g'))
                AND length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                  >= length(text) - length(regexp_replace(text, '[\x{0400}-\x{04ff}]', '', 'g'))
                AND length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) > 0
             THEN 'latin'
             WHEN length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g'))
                  >= length(text) - length(regexp_replace(text, '[\x{0400}-\x{04ff}]', '', 'g'))
                AND length(text) - length(regexp_replace(text, '[\x{4e00}-\x{9fff}]', '', 'g')) > 0
             THEN 'cjk'
             WHEN length(text) - length(regexp_replace(text, '[\x{0400}-\x{04ff}]', '', 'g')) > 0
             THEN 'cyrillic'
             ELSE 'none' END AS script
         FROM documents
         WHERE doc_id IS NOT NULL AND text IS NOT NULL
         ORDER BY id""",

    // mirrors TextDedup.minhashCalibration: the q29 candidate CTEs,
    // signature-agreement estimates, exact list_intersect Jaccard on
    // the same h28 shingle space, floor-scaled (1e9) error sums.
    "q418_minhash_calibration" -> {
      s"""WITH ${minhashCandidateCtes(32)},
         sets AS (SELECT id, list_distinct(hs) AS st FROM hsx),
         est AS (SELECT pairs0.id_a, pairs0.id_b, $estJaccardSql AS est
           FROM pairs0
           JOIN sig sa ON sa.id = pairs0.id_a
           JOIN sig sb ON sb.id = pairs0.id_b),
         ex AS (SELECT e.est,
             CAST(len(list_intersect(xa.st, xb.st)) AS DOUBLE) AS inter,
             CAST(len(xa.st) + len(xb.st) AS DOUBLE) AS ls
           FROM est e
           JOIN sets xa ON xa.id = e.id_a
           JOIN sets xb ON xb.id = e.id_b),
         er AS (SELECT est - inter / (ls - inter) AS err FROM ex),
         a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COALESCE(SUM(CAST(FLOOR(ABS(err) * 1000000000.0)
               AS HUGEINT)), 0) AS DOUBLE) / 1000000000.0 AS sae,
             CAST(COALESCE(SUM(CAST(FLOOR(err * 1000000000.0)
               AS HUGEINT)), 0) AS DOUBLE) / 1000000000.0 AS se,
             MAX(ABS(err)) AS max_abs_err
           FROM er)
         SELECT n_pairs,
           CASE WHEN n_pairs > 0 THEN sae / CAST(n_pairs AS DOUBLE) END
             AS mae,
           CASE WHEN n_pairs > 0 THEN se / CAST(n_pairs AS DOUBLE) END
             AS bias,
           max_abs_err
         FROM a"""
    }
  )
}
