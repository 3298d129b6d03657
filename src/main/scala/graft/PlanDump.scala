package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round deliverable helper: dump `.explain("formatted")` for
  * registered queries to `plans/<tag>/<query>_<suffix>.txt`, then execute
  * the query (count) and append the FINAL adaptive plan, so each file shows
  * both the static plan (PushedFilters/ReadSchema per scan) and the
  * post-AQE physical shape (join strategies, reused/coalesced exchanges).
  *
  *   sbt "runMain graft.PlanDump q149_pagerank,q332_hits before [sfDir]"
  *
  * writes plans/r19/q149_pagerank_before.txt etc.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q01_groupby_agg").split(',').toSeq
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File("plans/r19")
    dir.mkdirs()
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val t0 = System.nanoTime()
      val cnt = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val finalPlan = df.queryExecution.executedPlan.toString
      val w = new java.io.PrintWriter(
        new java.io.File(dir, s"${name}_$suffix.txt"), "UTF-8")
      try {
        w.println(s"# $name @ $sfDir  rows=$cnt  wall=${"%.2f".format(sec)}s")
        w.println(s"# == explain(formatted), pre-execution ==")
        w.println(formatted)
        w.println(s"# == final adaptive physical plan (post-AQE, after count) ==")
        w.println(finalPlan)
      } finally w.close()
      println(s"[plandump] $name -> ${dir}/${name}_$suffix.txt " +
        s"(rows=$cnt, ${"%.2f".format(sec)}s)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
