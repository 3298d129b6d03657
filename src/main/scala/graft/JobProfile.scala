package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Optimization-round measurement helper (guide §1): run one registered
  * query and print every Spark job it schedules with wall time and the
  * job's callSite/description, so the expensive phase of an eager
  * multi-job operator (iterative graph rounds, fit-side readouts) is
  * attributable without the UI.
  *
  *   sbt "runMain graft.JobProfile q298_modularity [sfDir]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q01_groupby_agg").split(',').toSeq
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class J(id: Int, desc: String, t0: Long, var t1: Long = -1L)
    val jobs = mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val stages = js.stageInfos
          .map(si => s"${si.name.takeWhile(_ != ' ')}#${si.numTasks}")
          .mkString(",")
        // first graft-source frame of the job's terminal stage = which
        // operator line scheduled it
        val site = js.stageInfos.lastOption.map(_.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobProfile"))
            .map(_.trim.replaceAll("^at ", "")).getOrElse(""))
          .getOrElse("")
        val d = Option(js.properties.getProperty("spark.job.description"))
          .getOrElse("") + s" [$stages] $site"
        jobs(js.jobId) = J(js.jobId, d, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.t1 = je.time)
      }
    })
    // warm-up
    import graft.ops.Bounded._
    spark.range(1000).selectExpr("sum(id)").collectBounded(1, "warmup")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    Thread.sleep(200); jobs.clear()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      val tTotal = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(s"=== $name rows=$n build=${"%.2f".format(tBuild)}s " +
        s"total=${"%.2f".format(tTotal)}s jobs=${jobs.size} ===")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val dur = if (j.t1 < 0) -1.0 else (j.t1 - j.t0) / 1e3
          println(f"  job ${j.id}%4d ${dur}%7.2fs  ${j.desc.take(140)}")
        }
        jobs.clear()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
