package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass codegen kernels for the sketch hot loops in [[graft.llm.TextDedup]].
  *
  * The MinHash signature and SimHash bit-vote were previously built from
  * Spark's higher-order array functions (`transform`/`aggregate`/`array_min`).
  * Those are `CodegenFallback` expressions: every one of the 64 permutations
  * (or 60 bit votes) is a separate interpreted pass over the hash array, with
  * a boxed lambda call and an array allocation per pass per row. These kernels
  * compute the identical integer arithmetic — same universal-hash coefficients,
  * same mod-P formula, same vote rule — in ONE traversal of the array inside
  * whole-stage codegen, so results are bit-identical to the expression forms
  * (the DuckDB oracle SQL for q29/q30/q60 is unchanged) while the per-row cost
  * drops from `numHashes` interpreted passes to one fused loop.
  *
  * Reference attribution: MinHash/SimHash semantics per the LLM-pipeline
  * dedup design (SURVEY §2 LLM ops); universal hashing h_i(x)=(a_i·x+b_i) mod P.
  */
object DedupKernels {

  /** Same prime as [[graft.llm.TextDedup.P]] (> 2^32, universal hashing). */
  val P = 4294967311L

  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  /** a_i = ((2i+1)·2654435761) mod P, b_i = (40503·i + 7) mod P — identical
    * to TextDedup.aCoef/bCoef evaluated over literal i. */
  private def coefs(numHashes: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(numHashes, { n =>
      val as = Array.tabulate(n)(i => ((i * 2L + 1L) * 2654435761L) % P)
      val bs = Array.tabulate(n)(i => (i * 40503L + 7L) % P)
      (as, bs)
    })

  /** One-pass MinHash signature over a pre-hashed shingle array.
    * Equals `transform(0..n-1, i -> array_min(transform(hs, h -> (a_i·h+b_i) % P)))`:
    * null elements are skipped (array_min ignores nulls); an empty or all-null
    * input yields all-null signature positions. */
  def minhashSig(hs: ArrayData, numHashes: Int): ArrayData = {
    val (as, bs) = coefs(numHashes)
    val n = hs.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var idx = 0
    while (idx < n) {
      if (!hs.isNullAt(idx)) {
        any = true
        val h = hs.getLong(idx)
        var i = 0
        while (i < numHashes) {
          val v = (as(i) * h + bs(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      idx += 1
    }
    if (any) new GenericArrayData(mins)
    else new GenericArrayData(new Array[Any](numHashes))
  }

  /** One-pass 60-bit SimHash from a token-hash array. Equals the unrolled
    * `aggregate` bit-vote form in TextDedup.withSimhash: vote_j = Σ (2·bit_j − 1),
    * bit j set iff vote_j > 0. A null element nulls every vote (aggregate
    * propagates null through `+`), making each CASE take the 0 branch — so the
    * whole hash degenerates to 0, which this kernel mirrors. */
  def simhashBits(hs: ArrayData): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](60)
    var idx = 0
    while (idx < n) {
      if (hs.isNullAt(idx)) return 0L
      val h = hs.getLong(idx)
      var j = 0
      while (j < 60) {
        votes(j) += ((h >>> j) & 1L).toInt * 2 - 1
        j += 1
      }
      idx += 1
    }
    var r = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) r |= 1L << j
      j += 1
    }
    r
  }

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Value of the first `nibbles` hex characters of an md5 digest — exactly
    * `conv(substring(md5(s), 1, nibbles), 16, 10)` (big-endian top bits). */
  private def topBits(d: Array[Byte], nibbles: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** Fused normalize → tokenize → k-shingle → md5-top-bits kernel.
    *
    * Bit-identical to the expression pipeline
    * `transform(TextDedup.shingles(text, k), s => conv(substring(md5(s),1,nibbles),16,10))`:
    *   - normalize = `lower(trim(regexp_replace(text, "\\s+", " ")))` — i.e.
    *     lowercase ([[UTF8String.toLowerCase]], the exact function the `lower`
    *     expression calls), then maximal runs of non-whitespace bytes are the
    *     tokens (Java regex `\s` = ASCII 0x09–0x0D + 0x20; multibyte UTF-8
    *     bytes are negative, never whitespace);
    *   - all-whitespace/empty text tokenizes to one empty token, exactly like
    *     `split(trim(...), " ")` returning `[""]`;
    *   - fewer than k tokens → ONE shingle of all tokens joined;
    *   - shingle string = tokens joined with single 0x20, fed to MD5
    *     incrementally (no shingle string is ever materialized);
    *   - hash = value of the first `nibbles` hex digits of the digest.
    *
    * The expression pipeline runs `transform`+`slice`+`concat_ws` interpreted
    * (CodegenFallback) and round-trips every digest through a 32-char hex
    * string and `conv` string parsing; this kernel is one byte-level pass. */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String,
                    k: Int, nibbles: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    // tokenize: collect (start, len) of maximal non-ws runs
    var starts = new Array[Int](16)
    var lens = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (!ws) {
        val s = i
        while (i < n && {
          val c = bytes(i); !(c == 0x20 || (c >= 0x09 && c <= 0x0d))
        }) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          lens = java.util.Arrays.copyOf(lens, nTok * 2)
        }
        starts(nTok) = s; lens(nTok) = i - s; nTok += 1
      } else i += 1
    }
    if (nTok == 0) { starts(0) = 0; lens(0) = 0; nTok = 1 } // [""] like split
    val width = if (nTok >= k) k else nTok
    val nShingles = if (nTok >= k) nTok - k + 1 else 1
    val out = new Array[Long](nShingles)
    val digest = mdLocal.get()
    var s = 0
    while (s < nShingles) {
      var j = 0
      while (j < width) {
        if (j > 0) digest.update(0x20.toByte)
        digest.update(bytes, starts(s + j), lens(s + j))
        j += 1
      }
      out(s) = topBits(digest.digest(), nibbles) // digest() auto-resets
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Fused CONTENT-DEFINED-CHUNKING kernel: normalize → per-position
    * windowed h28 boundary test → chunk slicing → md5 fingerprint + length,
    * in ONE byte-level pass with a reused MessageDigest.
    *
    * Bit-identical to the HOF expression form in
    * [[graft.llm.TextDedup.cdcChunksHof]] (which stands as the executable
    * spec; DedupKernelsSpec pins kernel == HOF):
    *   - normalize = `lower(trim(regexp_replace(text, "\\s+", " ")))`:
    *     ASCII whitespace runs (0x09–0x0d, 0x20 — Java regex `\s`) collapse
    *     to one 0x20 over the RAW bytes (multibyte UTF-8 bytes are ≥ 0x80,
    *     never whitespace), leading/trailing single spaces trim, then
    *     [[org.apache.spark.unsafe.types.UTF8String.toLowerCase]] — the
    *     same function the `lower` expression calls;
    *   - positions are CODE POINTS (Spark substr/length semantics): a
    *     boundary opens at position i ≥ 2 iff
    *     `h28(substr(norm, i, window)) % divisor == 0` with h28 the
    *     md5-top-28-bit hash, testable only when the window fits
    *     (i ≤ len − window + 1 and len ≥ window + 1);
    *   - chunks are the slices between consecutive starts (1 is always a
    *     start); each yields (md5 lowercase hex of the chunk's UTF-8
    *     bytes, code-point length).
    *
    * The HOF form pays one interpreted md5-expression + hex round-trip +
    * `conv` string parse PER POSITION; this kernel digests byte ranges
    * in place (measured: the q279 boundary pass on the 15 M-char sf1.0 corpus
    * dropped from ~790 s single-task CPU to seconds). */
  def cdcChunks(text: org.apache.spark.unsafe.types.UTF8String,
                window: Int, divisor: Int): ArrayData = {
    // normalize: collapse ws runs over raw bytes, trim edge spaces, lower
    val raw = text.getBytes
    val collapsed = new Array[Byte](raw.length)
    var w = 0
    var i = 0
    while (i < raw.length) {
      val b = raw(i)
      val ws = b == 0x20 || (b >= 0x09 && b <= 0x0d)
      if (ws) {
        while (i < raw.length && {
          val c = raw(i); c == 0x20 || (c >= 0x09 && c <= 0x0d)
        }) i += 1
        collapsed(w) = 0x20; w += 1
      } else { collapsed(w) = b; w += 1; i += 1 }
    }
    var lo = 0; var hi = w
    if (hi > lo && collapsed(lo) == 0x20) lo += 1
    if (hi > lo && collapsed(hi - 1) == 0x20) hi -= 1
    val norm = org.apache.spark.unsafe.types.UTF8String
      .fromBytes(collapsed, lo, hi - lo).toLowerCase.getBytes
    // code-point byte offsets (UTF-8 lead bytes), offsets(L) = byte length
    val nB = norm.length
    var l = 0
    var p = 0
    while (p < nB) { if ((norm(p) & 0xc0) != 0x80) l += 1; p += 1 }
    val len = l
    val off = new Array[Int](len + 1)
    var cp = 0
    p = 0
    while (p < nB) {
      if ((norm(p) & 0xc0) != 0x80) { off(cp) = p; cp += 1 }
      p += 1
    }
    off(len) = nB
    val digest = mdLocal.get()
    // starts (0-based code-point indices); 0 is always a start
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    if (len >= window + 1) {
      var s = 1 // 1-based position 2 .. len - window + 1
      while (s <= len - window) {
        digest.update(norm, off(s), off(s + window) - off(s))
        if (topBits(digest.digest(), 7) % divisor == 0) starts.add(s)
        s += 1
      }
    }
    val m = starts.size()
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val a = starts.get(j).intValue()
      val b = if (j + 1 < m) starts.get(j + 1).intValue() else len
      digest.update(norm, off(a), off(b) - off(a))
      val d = digest.digest()
      val hex = new Array[Byte](32)
      var h = 0
      while (h < 16) {
        val v = d(h) & 0xff
        hex(2 * h) = Character.forDigit(v >>> 4, 16).toByte
        hex(2 * h + 1) = Character.forDigit(v & 0xf, 16).toByte
        h += 1
      }
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromBytes(hex),
        (b - a).toLong)
      j += 1
    }
    new GenericArrayData(out)
  }

  case class CdcChunks(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
    require(window >= 2 && divisor >= 2, "cdc_chunks: window/divisor too small")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("chunk_md5", StringType, nullable = false),
      StructField("chunk_len", LongType, nullable = false))),
      containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a string argument, got $other")
      }
    override protected def nullSafeEval(input: Any): Any =
      cdcChunks(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        window, divisor)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.DedupKernels.cdcChunks($c, $window, $divisor)")
    override protected def withNewChildInternal(c: Expression): CdcChunks =
      copy(child = c)
    override def prettyName: String = "graft_cdc_chunks"
  }

  private def requireLongArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<bigint>, got $other")
    }

  case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(child, prettyName)

    override protected def nullSafeEval(input: Any): Any =
      minhashSig(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.DedupKernels.minhashSig($c, $numHashes)")

    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
    override def prettyName: String = "graft_minhash_sig"
  }

  case class ShingleHashes(child: Expression, k: Int, nibbles: Int)
    extends UnaryExpression {
    require(k >= 1 && nibbles >= 1 && nibbles <= 15,
      s"shingle_hashes: need k>=1 and 1<=nibbles<=15, got k=$k nibbles=$nibbles")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a string argument, got $other")
      }

    override protected def nullSafeEval(input: Any): Any =
      shingleHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        k, nibbles)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.DedupKernels.shingleHashes($c, $k, $nibbles)")

    override protected def withNewChildInternal(c: Expression): ShingleHashes =
      copy(child = c)
    override def prettyName: String = "graft_shingle_hashes"
  }

  case class SimHashBits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(child, prettyName)

    override protected def nullSafeEval(input: Any): Any =
      simhashBits(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.DedupKernels.simhashBits($c)")

    override protected def withNewChildInternal(c: Expression): SimHashBits =
      copy(child = c)
    override def prettyName: String = "graft_simhash"
  }

  /** Register `graft_minhash_sig(hs, n)` / `graft_simhash(hs)` on the session
    * (idempotent — createOrReplace). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash_sig", { es =>
      val n = es(1) match {
        case Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"graft_minhash_sig numHashes must be an int literal, got $other")
      }
      MinHashSig(es.head, n)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash",
      es => SimHashBits(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_hashes", { es =>
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"graft_shingle_hashes $what must be an int literal, got $other")
      }
      ShingleHashes(es.head, intLit(es(1), "k"), intLit(es(2), "nibbles"))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("graft_cdc_chunks", { es =>
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"graft_cdc_chunks $what must be an int literal, got $other")
      }
      CdcChunks(es.head, intLit(es(1), "window"), intLit(es(2), "divisor"))
    }, "scala_udf")
  }
}
