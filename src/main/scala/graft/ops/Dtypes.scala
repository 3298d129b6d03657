package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Logical dtype TAGS over physical Spark types — the reference's
  * `:keyword` / `:symbol` / `:uuid` column datatypes
  * (reference io/column_parsers.clj:54-120 default-coercers; the column
  * keeps the logical dtype in its metadata even though the storage is
  * strings). Spark has no such scalar types, so the engine stores the
  * value canonically as a string column and carries the logical tag in
  * the StructField METADATA under [[Dtypes.TagKey]] — sinks that encode
  * per-column metadata (Snapshot `:spark-meta`, Arrow IPC custom field
  * metadata, Transit `:graft/dtype`) round-trip it, so a reader on the
  * other side can restore the logical type without re-inference.
  *
  * Canonical string forms (what a reference engine would print):
  *   keyword → ":kw" (leading colon), symbol → "sym", uuid → lowercase
  *   8-4-4-4-12 hex. [[normalize]] coerces a raw string column to the
  *   canonical form with parse-failure → NULL (the reference's
  *   relaxed missing-on-failure rule).
  */
object Dtypes {
  /** StructField metadata key carrying the logical dtype tag. */
  val TagKey = "graft.dtype"
  val Tags: Set[String] = Set("keyword", "symbol", "uuid")

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** Tag `colName` (a string column) with logical dtype `tag`. The value
    * column itself is untouched — pair with [[normalize]] to canonicalize. */
  def withTag(df: DataFrame, colName: String, tag: String): DataFrame = {
    require(Tags(tag), s"unknown dtype tag '$tag' (know: ${Tags.mkString(",")})")
    require(df.schema(colName).dataType == StringType,
      s"dtype tags apply to string columns; $colName is " +
        df.schema(colName).dataType)
    val meta = new MetadataBuilder()
      .withMetadata(df.schema(colName).metadata)
      .putString(TagKey, tag).build()
    df.withColumn(colName, col(colName).as(colName, meta))
  }

  /** The logical dtype tag of a field, if any. */
  def tagOf(schema: StructType, colName: String): Option[String] = {
    val m = schema(colName).metadata
    if (m.contains(TagKey)) Some(m.getString(TagKey)) else None
  }

  /** Canonical form for a tagged value column; invalid values → NULL
    * (reference parse-failure → missing). keyword: ensure one leading
    * colon; symbol: trimmed, non-empty, no whitespace; uuid: lowercase
    * canonical hex, anything non-canonical rejected. */
  def normalize(c: Column, tag: String): Column = tag match {
    case "keyword" =>
      val t = trim(c)
      when(t.isNull || t === "" || t === ":", lit(null).cast(StringType))
        .otherwise(when(t.startsWith(":"), t).otherwise(concat(lit(":"), t)))
    case "symbol" =>
      val t = trim(c)
      when(t.isNull || t === "" || t.rlike("\\s"), lit(null).cast(StringType))
        .otherwise(t)
    case "uuid" =>
      when(c.rlike(UuidRe), lower(c)).otherwise(lit(null).cast(StringType))
    case other =>
      throw new IllegalArgumentException(s"unknown dtype tag '$other'")
  }

  /** Tag + canonicalize in one step (the reference's parse-column with an
    * explicit `:uuid`/`:keyword`/`:symbol` parser-fn). */
  def parseTagged(df: DataFrame, colName: String, tag: String): DataFrame =
    withTag(
      df.withColumn(colName, normalize(col(colName), tag)), colName, tag)
}
