package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Bounded._

/** Direct re-creation of the reference's headline benchmark
  * (BASELINE.md: 8,588 ms for 2,769,708 rows × 12 cols from a 44 MB
  * .tsv.gz ≈ 322k rows/s, single JVM, promotional inference + date
  * parsing): build a 2.77M × 12 gzipped TSV of the same shape
  * (ints, doubles, strings, an ISO date column), then time
  * (a) Spark native inference read, (b) our promotional-inference read
  * ([[graft.sources.Io.readCsvPromotional]] — the same
  * all-strings-then-narrow contract as the reference parser), and
  * (c) the snapshot load analog (parquet re-read, mirroring the
  * nippy-restore comparison). Prints rows/s for each. */
object BaselineCsv {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nRows = 2769708L
    val tmp = java.nio.file.Files.createTempDirectory("graft_baseline").toString
    // 12 columns shaped like the reference's table: id ints, categorical
    // strings, doubles, a date — written gzipped TSV
    val src = spark.range(nRows)
      .select(col("id"),
        (col("id") % 1000).as("i1"), (col("id") % 97).as("i2"),
        (col("id") % 32768).as("i3"),
        (col("id") * 37 % 100000).cast("double").as("d1"),
        (col("id") % 9973).cast("double").as("d2"),
        (col("id") % 13).cast("double").as("d3"),
        concat(lit("cat_"), (col("id") % 50).cast("string")).as("s1"),
        concat(lit("name"), (col("id") % 10000).cast("string")).as("s2"),
        when(col("id") % 7 === 0, "true").otherwise("false").as("b1"),
        date_format(date_add(lit("2020-01-01").cast("date"),
          (col("id") % 1000).cast("int")), "yyyy-MM-dd").as("dt"),
        (col("id") % 2147483647L).as("i4"))
    src.coalesce(4).write.option("sep", "\t").option("header", true)
      .option("compression", "gzip").csv(s"$tmp/base_tsv")
    src.write.parquet(s"$tmp/base_parquet")
    def time[T](what: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[baseline] $what%-28s ${sec}%7.3f s  " +
        f"${nRows / sec / 1000.0}%9.1f k rows/s")
    }
    // warm
    spark.read.parquet(s"$tmp/base_parquet").count()
    time("native inferSchema read") {
      spark.read.option("sep", "\t").option("header", true)
        .option("inferSchema", true).csv(s"$tmp/base_tsv")
        .agg(count(lit(1)), sum(col("d1"))).collectBounded(1, "one-row agg")
    }
    time("promotional inference read") {
      graft.sources.Io.readCsvPromotional(spark, s"$tmp/base_tsv",
          graft.sources.Io.ReadOptions(separator = "\t"))
        .agg(count(lit(1)), sum(col("d1"))).collectBounded(1, "one-row agg")
    }
    time("parquet snapshot re-read") {
      spark.read.parquet(s"$tmp/base_parquet")
        .agg(count(lit(1)), sum(col("d1"))).collectBounded(1, "one-row agg")
    }
    spark.stop()
  }
}
