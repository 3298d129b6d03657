package graft
import org.apache.spark.sql.SparkSession

/** OUT-OF-CORE proof run — the reference's flagship claim is
  * larger-than-memory aggregation (/root/reference docs, reductions
  * namespace header): here the headline reductions (q01 grouped exact
  * sums, q106 full descriptive stats, q165 per-group exact quantiles)
  * run under a JVM heap cap small enough that ANY plan which
  * materializes the data on the driver dies, proving the aggregation
  * path is shuffle/spill-safe end-to-end, not just fast when everything
  * fits.
  *
  * Usage (heap cap via build.sbt's SPARK_DRIVER_MEM passthrough):
  *   SPARK_DRIVER_MEM=512m SPARK_GRAFT_SF_DIR=/tmp/sf1.0 \
  *     sbt "runMain graft.OutOfCoreCheck"          # must print PASS
  *   SPARK_GRAFT_NEGATIVE=1 SPARK_DRIVER_MEM=512m ... # must OOM
  *
  * The negative control collects lineitem to the driver — at sf1.0
  * (6M rows) that is >1 GiB of Row objects and dies under the same cap
  * the real queries survive, which is the whole point.
  */
object OutOfCoreCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[ooc] heap max = ${Runtime.getRuntime.maxMemory() / 1024 / 1024} MiB")
    if (sys.env.get("SPARK_GRAFT_NEGATIVE").contains("1")) {
      // negative control: a driver-side materialization MUST die here
      val n = spark.read.parquet(s"$sfDir/lineitem.parquet").collect().length
      println(s"[ooc] NEGATIVE CONTROL DID NOT OOM ($n rows) — cap too high")
      sys.exit(1)
    }
    val names = Seq("q01_groupby_agg", "q106_descriptive_full",
      "q165_group_quantiles")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ooc] $name%-24s $n%6d rows  $sec%7.2f s")
    }
    println("OUT_OF_CORE PASS")
    spark.stop()
  }
}
