package graft

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING STATE-SCALE proof run — the state-store companion to
  * [[OutOfCoreCheck]]: a long synthetic stream whose dedup state (millions
  * of distinct fingerprints) exceeds what an on-heap state store can hold
  * under a capped JVM, run to completion on the RocksDB provider the
  * engine pins for every stateful stream
  * ([[graft.streaming.EventStream]]). RocksDB keeps state on
  * executor-local disk with bounded native memory, so state volume scales
  * with disk, not heap — at 100 TB (dedup fingerprints, open sessions,
  * stream-join buffers) that is the difference between a stream that runs
  * and one that OOMs on day two.
  *
  * Usage:
  *   java -Xmx512m -cp ... graft.StreamStateCheck   # must print PASS
  *   SPARK_GRAFT_NEGATIVE=1 java -Xmx512m ...       # HDFS-backed (on-heap)
  *                                                  # provider: must OOM
  */
object StreamStateCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[stream-state] heap max = " +
      s"${Runtime.getRuntime.maxMemory() / 1024 / 1024} MiB")
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "3000000").toLong
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssc").toString
    // 8 parquet files of unique fingerprints → 8 micro-batches, state
    // grows monotonically to n keys (~32-byte md5 each + row overhead)
    val src = spark.range(n)
      .select(md5(col("id").cast("string")).as("fp"), col("id").as("v"))
    src.coalesce(8).write.parquet(s"$tmp/src")
    if (sys.env.get("SPARK_GRAFT_NEGATIVE").contains("1"))
      println("[stream-state] NEGATIVE: default on-heap provider (expect OOM)")
    else
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.EventStream.RocksDbProvider)
    val stream = spark.readStream
      .schema(src.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/src")
      .dropDuplicates("fp")
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        total.addAndGet(batch.count()); ()
      }
      .option("checkpointLocation", s"$tmp/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[stream-state] $n%d-key dedup state drained in $sec%.1f s, " +
      s"emitted ${total.get()} uniques")
    assert(total.get() == n, s"dedup emitted ${total.get()} of $n")
    println("STREAM_STATE PASS")
    spark.stop()
  }
}
