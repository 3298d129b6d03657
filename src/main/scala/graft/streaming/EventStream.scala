package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface — NEW capability beyond the reference (which
  * only has lazy dataset sequences, SURVEY §2.8): event-time tumbling windows
  * with watermarks over the events table, plus stateful sessionization.
  *
  * At scale this is the standing pipeline: `readStream` from a file/Kafka
  * source, watermark bounds state, window aggregation shuffles once per
  * trigger on (window, key). The batch query q38 is the exact semantic
  * equivalent (same plan shape minus the state store), which is how the
  * streaming path is oracle-checked.
  */
object EventStream {

  /** The events schema as Spark reads it (ts already converted from nanos). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming hourly windowed aggregation with a watermark; reads the same
    * parquet directory as a file stream (one-file micro-batch in tests). */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
    raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast(LongType)))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * lit(1e6)).cast(DecimalType(30, 0)))
          .cast(DoubleType).divide(lit(1e6)).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"),
        col("sum_value"))
  }

  /** Run a streaming query to completion against the (finite) file source and
    * return the materialized result — the test harness entry point. */
  def runToMemorySink(df: DataFrame, name: String): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
