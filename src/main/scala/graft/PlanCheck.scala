package graft
import org.apache.spark.sql.SparkSession
import graft.ops.Bounded._

/** Plan-audit tool: executes a registered query and prints its FINAL
  * adaptive physical plan (post-AQE, so ReusedExchange / reused query
  * stages, chosen join strategies, and coalesced partitioning are visible),
  * plus the wall time. Usage:
  *
  *   sbt "runMain graft.PlanCheck q29_minhash_pairs [sfDir]"
  *
  * The first positional arg may list several comma-separated query names.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q01_groupby_agg").split(',').toSeq
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      // collect() (not count()) so the df's OWN plan executes — count()
      // builds a separate agg plan and leaves this one unfinalized under AQE
      val n = df.collectBounded(1 << 22, "plan-check result").length
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"=== $name: $n rows in ${"%.2f".format(sec)} s ===")
      // executedPlan after an action = the final adaptive plan (reuse visible)
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
