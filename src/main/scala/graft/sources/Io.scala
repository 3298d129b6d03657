package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** IO breadth (reference SURVEY §2.1): csv/tsv/json/parquet read-write with
  * the reference's ingest options mapped onto DataFrameReader options.
  *
  * The reference's universal `->dataset` (reference src/tech/v3/dataset/
  * io.clj:123-263) dispatches on file type and honors: `:header-row?`,
  * `:separator`, `:num-rows`, `:column-allowlist/blocklist`, `:parser-fn`
  * (per-column type overrides), gzip autodetect. Spark equivalents below;
  * gzip is transparent in Spark's file sources.
  */
object Io {

  case class ReadOptions(
      headerRow: Boolean = true,
      separator: String = ",",
      numRows: Option[Int] = None,
      columnAllowlist: Seq[String] = Seq.empty,
      columnBlocklist: Seq[String] = Seq.empty,
      /** `:parser-fn`-style explicit schema; None → inference (Spark's
        * two-pass, vs the reference's promotional single-pass — SURVEY §7.4
        * documents accepting this difference). */
      schema: Option[StructType] = None,
      comment: Option[Char] = None)

  def readCsv(spark: SparkSession, path: String,
              opts: ReadOptions = ReadOptions()): DataFrame = {
    var r = spark.read
      .option("header", opts.headerRow)
      .option("sep", opts.separator)
    r = opts.schema match {
      case Some(s) => r.schema(s)
      case None => r.option("inferSchema", true)
    }
    opts.comment.foreach(c => r = r.option("comment", c.toString))
    var df = r.csv(path)
    if (opts.columnAllowlist.nonEmpty)
      df = df.select(opts.columnAllowlist.map(df.col): _*)
    if (opts.columnBlocklist.nonEmpty)
      df = df.drop(opts.columnBlocklist: _*)
    opts.numRows.foreach(n => df = df.limit(n))
    df
  }

  def readTsv(spark: SparkSession, path: String,
              opts: ReadOptions = ReadOptions()): DataFrame =
    readCsv(spark, path, opts.copy(separator = "\t"))

  def readJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.json(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** write! dispatch (reference io.clj:274-301). Parquet is the engine's
    * binary snapshot format (replacing the reference's nippy). */
  def write(df: DataFrame, path: String, format: String = "parquet",
            mode: SaveMode = SaveMode.Overwrite,
            partitionBy: Seq[String] = Seq.empty): Unit = {
    var w = df.write.mode(mode).format(format)
    if (format == "csv") w = w.option("header", true)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.save(path)
  }
}
