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
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureFunctions(spark)
    tRaw(spark, dir, name)
  }

  private def tRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The events table stores ts as parquet TIMESTAMP(NANOS), which Spark's
      // vectorized reader rejects. Read nanos as long (legacy conf), then
      // convert to a microsecond TimestampType column (the generator's values
      // are µs-precision, so the floor division is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // integral division: `/` on longs goes through double, and epoch-nanos
      // exceed 2^53, so the rounding error (±128ns) can flip the truncated
      // microsecond by one — `div` stays in long arithmetic
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
