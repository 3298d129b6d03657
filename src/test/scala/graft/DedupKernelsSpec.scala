package graft

import org.apache.spark.sql.functions._

import graft.functions.DedupKernels
import graft.llm.TextDedup

/** Pins the single-pass codegen kernels bit-exactly to the original
  * higher-order-function formulations they replaced — the HOF forms ARE the
  * executable semantics spec (and what the DuckDB oracle SQL mirrors), so
  * kernel == HOF on real corpus text implies the q29/q30/q60 oracles are
  * unaffected by the kernel swap. */
class DedupKernelsSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def documents = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
  }

  test("minhash kernel == HOF expression on corpus text (64 hashes)") {
    DedupKernels.register(spark)
    val hs = transform(TextDedup.shingles(col("text"), 3), s => TextDedup.h28(s))
    val both = documents
      .select(col("doc_id"), hs.as("__hs"))
      .persist() // barrier so the HOF form doesn't re-run md5 64×
      .select(col("doc_id"),
        TextDedup.minhashSignatureFromHashes(col("__hs"), 64).as("kernel"),
        TextDedup.minhashSignatureFromHashesHof(col("__hs"), 64).as("hof"))
    assert(both.filter(not(col("kernel") <=> col("hof"))).count() == 0)
    both.unpersist()
  }

  test("minhash kernel edge cases: empty and null-element arrays") {
    DedupKernels.register(spark)
    val df = Seq(
      (1L, Seq[java.lang.Long](5L, 17L, 900000000L)),
      (2L, Seq[java.lang.Long](null, 42L)),
      (3L, Seq[java.lang.Long](null)),
      (4L, Seq.empty[java.lang.Long])
    ).toDF("id", "hs")
    val out = df.select(col("id"),
        call_function("graft_minhash_sig", col("hs"), lit(8)).as("kernel"),
        TextDedup.minhashSignatureFromHashesHof(col("hs"), 8).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"id=${r.getLong(0)}")
    }
    // all-null and empty inputs give all-null signature positions
    assert(out.filter(r => r.getLong(0) >= 3L)
      .forall(_.getSeq[Any](1).forall(_ == null)))
  }

  test("shingle-hash kernel == HOF shingle/md5 pipeline (k=3/h28, k=8/h60, k=1/tokens)") {
    DedupKernels.register(spark)
    val edge = Seq((9001L, ""), (9002L, "   \t \n "), (9003L, "one"),
      (9004L, "two words"), (9005L, "ΣΙΓΜΑ Straße MIXED\tCase nbsp"),
      (9006L, "  leading and   trailing   ")).toDF("doc_id", "text")
    val d = documents.unionByName(edge)
    val checks = Seq(
      (TextDedup.shingleHashes(col("text"), 3, 7),
        transform(TextDedup.shingles(col("text"), 3), s => TextDedup.h28(s)), "k3h28"),
      (TextDedup.shingleHashes(col("text"), 8, 15),
        transform(TextDedup.shingles(col("text"), 8), s => TextDedup.h60(s)), "k8h60"),
      (TextDedup.shingleHashes(col("text"), 1, 15),
        transform(TextDedup.tokens(col("text")), t => TextDedup.h60(t)), "k1tokens"))
    checks.foreach { case (kernel, hof, label) =>
      val bad = d.select(col("doc_id"), kernel.as("k"), hof.as("h"))
        .filter(not(col("k") <=> col("h")))
      assert(bad.count() == 0, s"$label mismatch: ${bad.take(3).mkString}")
    }
    // null text propagates
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(TextDedup.shingleHashes(col("text"), 3, 7).as("k")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("simhash kernel == unrolled bit-vote HOF on corpus text") {
    val d = documents
    val kernel = TextDedup.withSimhash(d, "text", "sh")
    val hof = TextDedup.withSimhashHof(d, "text", "sh_hof")
    val joined = kernel.join(hof.select(col("doc_id"), col("sh_hof")), "doc_id")
    assert(joined.filter(col("sh") =!= col("sh_hof")).count() == 0)
  }

  test("simhash kernel: empty token array and null elements degenerate to 0") {
    DedupKernels.register(spark)
    val df = Seq(
      (1L, Seq[java.lang.Long](3L, 3L, 7L)),
      (2L, Seq[java.lang.Long](3L, null)),
      (3L, Seq.empty[java.lang.Long])
    ).toDF("id", "hs")
    val out = df.select(col("id"),
        call_function("graft_simhash", col("hs")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 3L) // bits 0,1 vote 3-0 and 2-1; bit 2 votes 1-2
    assert(out(2L) == 0L)
    assert(out(3L) == 0L)
  }

  test("cdc-chunk kernel == HOF boundary/slice/md5 pipeline on corpus + edges") {
    val docs = documents.unionByName(Seq(
      (9000001L, ""), (9000002L, "   "), (9000003L, "short"),
      (9000004L, "exactly8!"), (9000005L, "Ünïcødé çhärs ünd mörę  tëxt " * 20),
      (9000006L, "a\tb\r\nc   d" * 40)).toDF("doc_id", "text"))
    val kernel = TextDedup.cdcChunks(docs, "doc_id", "text")
      .select("doc_id", "chunk_idx", "chunk_md5", "chunk_len")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    val hof = TextDedup.cdcChunksHof(docs, "doc_id", "text")
      .select("doc_id", "chunk_idx", "chunk_md5", "chunk_len")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    assert(kernel.size == hof.size,
      s"chunk counts differ: kernel=${kernel.size} hof=${hof.size}")
    hof.foreach { case (k, v) =>
      assert(kernel.get(k).contains(v), s"chunk $k: kernel=${kernel.get(k)} hof=$v")
    }
  }
}
