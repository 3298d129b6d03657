package graft
import org.apache.spark.sql.SparkSession
import graft.ops.Bounded._

/** Targeted bench: run only the queries named in SPARK_GRAFT_QUERIES
  * (comma-separated substrings) — for iterating on the slow tail without
  * paying for the full suite. Same harness shape as [[Bench]]. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wanted = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "").split(",").filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // heap parity readout — same rationale as Bench's (JITTER.md r18)
    println(s"# bench-env max-heap " +
      s"${Runtime.getRuntime.maxMemory() / (1024L * 1024L)}m")
    spark.range(1000).selectExpr("sum(id)").collectBounded(1, "warmup")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
      .map { case (name, fn) =>
        val times = (0 until runs).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          if (ok) Some(sec) else None
        }
        System.gc()
        if (sys.env.get("SPARK_GRAFT_BENCH_ALLRUNS").contains("1"))
          println(f"$name%-28s runs: " +
            times.map(t => f"$t%.3f").mkString(" "))
        name -> (if (times.size == runs) times.min else -1.0)
      }
    results.foreach { case (n, s) => println(f"$n%-28s $s%8.3f s") }
    spark.stop()
  }
}
