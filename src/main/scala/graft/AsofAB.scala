// temp A/B harness (not committed)
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AsofAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sys.env.getOrElse("AB_SF", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String) = Tables.t(spark, sfDir, n)
    val ev = {
      import graft.ops.TableOps._
      t("events").selectColumns("event_id", "user_id", "ts")
    }
    val purch = t("events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("p_event_id"))
      .select(col("user_id"), col("ts").as("p_ts"), col("p_event_id"))
    ev.count(); purch.count()
    def time(what: String)(f: => Long): Unit = {
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$what%-12s min ${times.map(_._1).min}%.3f s  " +
        f"(runs ${times.map(x => f"${x._1}%.2f").mkString(" ")})  rows ${times.head._2}")
    }
    time("composed") {
      graft.ops.Joins.asofJoinComposed(ev, purch, "ts", "p_ts",
        Seq("user_id" -> "user_id"), graft.ops.Joins.Backward, false).count()
    }
    time("merge") {
      graft.plans.AsofMerge.asofJoinMerge(ev, purch, "ts", "p_ts",
        Seq("user_id" -> "user_id"), forward = false,
        allowExactMatch = false).count()
    }
    time("composed2") {
      graft.ops.Joins.asofJoinComposed(ev, purch, "ts", "p_ts",
        Seq("user_id" -> "user_id"), graft.ops.Joins.Backward, false).count()
    }
    time("merge2") {
      graft.plans.AsofMerge.asofJoinMerge(ev, purch, "ts", "p_ts",
        Seq("user_id" -> "user_id"), forward = false,
        allowExactMatch = false).count()
    }
    spark.stop()
  }
}
