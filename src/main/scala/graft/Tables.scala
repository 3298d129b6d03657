package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet star schema (TESTDATA.md).
  *
  * Mirrors the reference's universal ingest entry point
  * (`tech.v3.dataset.io/->dataset`, reference src/tech/v3/dataset/io.clj:123-263)
  * restricted to the formats Spark reads natively. All scans are plain
  * `spark.read.parquet` so Catalyst gets column pruning + filter pushdown for
  * free — at 100 TB the scan IS the query cost, so nothing may sit between the
  * logical plan and the FileScan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation", "supplier", "part", "customer")

  /** Idempotent, warn-free registration of the graft function suite (the
    * registry chokepoint: every query path loads tables through here). */
  def ensureFunctions(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sum128"))) {
      graft.functions.ExactSum.register(spark)
      graft.functions.DedupKernels.register(spark)
      graft.functions.Kmv.register(spark)
      graft.functions.StringSim.register(spark)
      graft.functions.VecKernels.register(spark)
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureFunctions(spark)
    tRaw(spark, dir, name)
  }

  /** Footer-schema cache (r20, guide §1/§6): every bare
    * `spark.read.parquet(path)` re-infers the schema — a driver-side
    * footer read plus, for multi-file tables, a small inference job —
    * on EVERY query construction, including each of the bench's three
    * runs. The schema of an immutable table file is session-invariant
    * metadata (the same class of cache as Spark's own FileStatusCache
    * and the janino codegen cache — no data or results are cached), so
    * infer once per (path) and hand the reader an explicit schema
    * afterwards. At scale the win is the same: an explicit schema skips
    * a footer-listing pass per query over thousands of files. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val s = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(s).parquet(path)
  }

  private def tRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver's events table stores ts as parquet TIMESTAMP(NANOS),
      // which Spark's vectorized reader rejects. Read nanos as long (legacy
      // conf), then convert to a microsecond TimestampType column (the
      // generator's values are µs-precision, so the floor division is
      // lossless). The shim is TYPE-GATED: a re-exported events table (e.g.
      // the duckdb-scaled local sf1.0) stores a plain timestamp that the
      // nanosAsLong conf leaves untouched — only apply `div` when the
      // column actually surfaced as nanos-long.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = readCached(spark, s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integral division: `/` on longs goes through double, and
          // epoch-nanos exceed 2^53, so the rounding error (±128ns) can
          // flip the truncated microsecond — `div` stays in long arithmetic
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // scaled/re-exported copies come back NTZ; the driver's original
          // is instant-semantics (UTC session) — align the two readings
          raw.withColumn("ts",
            org.apache.spark.sql.functions.to_timestamp(
              org.apache.spark.sql.functions.col("ts")))
        case _ => raw
      }
    } else readCached(spark, s"$dir/$name.parquet")
}
