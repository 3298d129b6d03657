package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.XlsxIo
import graft.sources.XlsxIo.XlsxOptions

/** Pins the xlsx reader to the reference's fixture expectations
  * (reference test/tech/v3/libs/fastexcel_test.clj) and round-trips the
  * writer through the reader. */
class XlsxIoSpec extends SparkSuite {
  init()

  private val data = "/root/reference/test/data"

  test("happy path: file_example_XLSX_1000 columns, types, rows") {
    val ds = XlsxIo.read(spark, s"$data/file_example_XLSX_1000.xlsx")
    // fastexcel_test.clj:17-24
    assert(ds.columns.toSet == Set("column-0", "Age", "Country", "First Name",
      "Gender", "Date", "Last Name", "Id"))
    assert(ds.count() == 1000)
    assert(ds.columns.length == 8)
    val types = ds.schema.fields.map(_.dataType).toSet
    // reference narrows to {int16 int8 string}; our Age lands int8-equiv
    assert(types.subsetOf(Set[DataType](ByteType, ShortType, IntegerType,
      StringType, DateType)))
    assert(ds.schema("Age").dataType == ByteType)
    assert(ds.schema("column-0").dataType == ShortType)
  }

  test("sparse file: 8x8 grid, absent rows/cells are missing") {
    val ds = XlsxIo.read(spark, s"$data/sparsefile.xlsx")
    // fastexcel_test.clj:28-39
    assert(ds.count() == 8)
    assert(ds.columns.length == 8)
    for (c <- Seq("column-0", "a", "column-6"))
      assert(ds.filter(col(c).isNotNull).count() == 0, s"col $c should be all-missing")
    val nonMissing = ds.columns.flatMap { c =>
      ds.filter(col(c).isNotNull).select(col(c).cast(StringType))
        .collect().map(_.getString(0))
    }.toSeq
    assert(nonMissing.sorted == Seq("1", "1", "1", "2", "23", "a").sorted)
  }

  test("date-styled serial numbers decode as dates (stocks-with-dates)") {
    val ds = XlsxIo.read(spark, s"$data/stocks-with-dates.xlsx")
    assert(ds.schema("date").dataType == DateType)
    val first = ds.orderBy("date").select(col("date").cast(StringType))
      .first().getString(0)
    assert(first == "2000-01-01") // serial 36526
  }

  test("parserFn coerces a string date column (stocks.xlsx)") {
    val ds = XlsxIo.read(spark, s"$data/stocks.xlsx",
      XlsxOptions(parserFn = Map("date" -> DateType)))
    assert(ds.schema("date").dataType == DateType)
    assert(ds.filter(col("date").isNull).count() == 0)
  }

  test("bad dates degrade the column to string (stocks-bad-date)") {
    val ds = XlsxIo.read(spark, s"$data/stocks-bad-date.xlsx")
    // fastexcel_test.clj:46-52: mixed cell content -> string column
    assert(ds.schema("date").dataType == StringType)
  }

  test("skip rows: holdings file header at row 5, trailing empty column") {
    val ds = XlsxIo.read(spark, s"$data/holdings-daily-us-en-mdy.xlsx",
      XlsxOptions(skipRows = 4,
        parserFn = Map("Identifier" -> StringType, "Weight" -> DoubleType)))
    // fastexcel_test.clj:55-72
    assert(ds.columns.toSeq == Seq("Name", "Ticker", "Identifier", "SEDOL",
      "Weight", "Sector", "Shares Held", "Local Currency", "column-8"))
    val types = ds.schema.fields.map(_.dataType).toSet
    assert(types.subsetOf(Set[DataType](StringType, DoubleType, BooleanType,
      IntegerType, LongType, ShortType, ByteType)))
  }

  test("duplicate headers throw unless ensureUnique, custom postfix fn") {
    intercept[RuntimeException] {
      XlsxIo.read(spark, s"$data/duplicate-headers.xlsx")
    }
    val ds = XlsxIo.read(spark, s"$data/duplicate-headers.xlsx",
      XlsxOptions(ensureUnique = true))
    assert(ds.columns.length == ds.columns.distinct.length)
    // fastexcel_test.clj:89-95 custom unique-column-name-fn
    val ds2 = XlsxIo.read(spark, s"$data/duplicate-headers.xlsx",
      XlsxOptions(ensureUnique = true,
        uniqueNameFn = (i, n) => s"$n::$i"))
    assert(ds2.columns.contains("column::2"))
    assert(ds2.columns.contains("column::4"))
    assert(ds2.columns.contains("column-1::6"))
  }

  test("format-code classifiers strip brackets/quotes before date/time checks") {
    import graft.sources.XlsxIo.{isDateFormatCode, hasTimeFormatCode}
    // locale prefix and quoted literals must not make a date format "timed"
    assert(isDateFormatCode("[$-en-US]mmmm d, yyyy"))
    assert(!hasTimeFormatCode("[$-en-US]mmmm d, yyyy"))
    assert(!hasTimeFormatCode("""yyyy \h mm"session""""))
    assert(hasTimeFormatCode("yyyy-mm-dd hh:mm:ss"))
    assert(hasTimeFormatCode("[h]:mm") == false) // elapsed-hours live in brackets
    assert(hasTimeFormatCode("h:mm AM/PM"))
    assert(!isDateFormatCode("#,##0.00"))
    assert(!isDateFormatCode("\"today\" 0.0")) // quoted 'd'/'y' don't count
  }

  test("numeric header cell names the column by its raw rendering") {
    val ds = XlsxIo.read(spark, s"$data/number_column.xlsx")
    // fastexcel_test.clj:98-101
    assert(ds.columns.head == "0.0")
  }

  test("write -> read round-trip preserves values and types") {
    val src = Tables.t(spark, sfDir, "nation")
    val tmp = Files.createTempDirectory("graft_xlsx").toString
    XlsxIo.write(src, s"$tmp/nation.xlsx")
    val back = XlsxIo.read(spark, s"$tmp/nation.xlsx")
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
    val a = src.select(col("n_nationkey").cast(LongType),
      col("n_name"), col("n_regionkey").cast(LongType))
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = back.select(col("n_nationkey").cast(LongType),
      col("n_name"), col("n_regionkey").cast(LongType))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("write round-trips dates, timestamps, booleans, doubles, nulls") {
    import spark.implicits._
    val src = spark.sql("""
      SELECT * FROM VALUES
        (1, 'alpha', 1.5D, true,  DATE'2021-03-04', TIMESTAMP'2021-03-04 12:34:56'),
        (2, 'bé<ta&"x"', -0.25D, false, DATE'1999-12-31', TIMESTAMP'2000-01-01 00:00:00'),
        (3, CAST(NULL AS STRING), CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN),
            CAST(NULL AS DATE), CAST(NULL AS TIMESTAMP))
      AS t(id, name, x, flag, d, ts)""")
    val tmp = Files.createTempDirectory("graft_xlsx2").toString
    XlsxIo.write(src, s"$tmp/mixed.xlsx")
    val back = XlsxIo.read(spark, s"$tmp/mixed.xlsx")
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("flag").dataType == BooleanType)
    assert(back.schema("x").dataType == DoubleType)
    assert(back.count() == 3)
    val row1 = back.filter(col("id") === 1).collect()(0)
    assert(row1.getAs[String]("name") == "alpha")
    assert(row1.getAs[java.sql.Date]("d").toString == "2021-03-04")
    assert(row1.getAs[java.sql.Timestamp]("ts").toString.startsWith("2021-03-04 12:34:56"))
    val row2 = back.filter(col("id") === 2).collect()(0)
    assert(row2.getAs[String]("name") == "bé<ta&\"x\"")
    val row3 = back.filter(col("id") === 3).collect()(0)
    assert(row3.isNullAt(row3.fieldIndex("name")))
    assert(row3.isNullAt(row3.fieldIndex("d")))
  }

  test("write refuses nested (array/struct) cell values loudly") {
    val tmp = Files.createTempDirectory("graft_xlsx_nested").toString
    val df = spark.range(2).selectExpr("id", "array(1.5, -2.5) as emb")
    val e = intercept[Exception] { XlsxIo.write(df, s"$tmp/bad.xlsx") }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("nested")),
      s"expected IllegalArgumentException(nested), got $e")
  }

  test("writeWorkbook: multi-sheet xlsx reads back cell-exact, in order") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("xlsx_wb").toString
    val s1 = Seq((1L, "a", 1.5), (2L, "b&<>", -2.0)).toDF("id", "s", "v")
    val s2 = Seq((10L, Some(java.sql.Timestamp.valueOf("2021-06-30 08:15:00"))),
      (11L, None)).toDF("k", "ts")
    XlsxIo.writeWorkbook(Seq("metrics" -> s1, "times" -> s2), s"$tmp/wb.xlsx")
    assert(XlsxIo.sheetNames(spark, s"$tmp/wb.xlsx") == Seq("metrics", "times"))
    val back = XlsxIo.readAllSheets(spark, s"$tmp/wb.xlsx")
    assert(back.length == 2)
    val b1 = back(0).orderBy("id").collect()
    assert(b1.map(r => (r.getAs[Number]("id").longValue(), r.getAs[String]("s"),
      r.getAs[Number]("v").doubleValue())).toSeq ==
      Seq((1L, "a", 1.5), (2L, "b&<>", -2.0)))
    val b2 = back(1).orderBy("k").collect()
    assert(b2(0).getAs[java.sql.Timestamp]("ts").toString ==
      "2021-06-30 08:15:00.0")
    assert(b2(1).isNullAt(b2(1).fieldIndex("ts")))
    intercept[IllegalArgumentException] {
      XlsxIo.writeWorkbook(Seq("x" -> s1, "x" -> s2), s"$tmp/dup.xlsx")
    }
  }

  test("readAllSheets returns one dataset per sheet") {
    val sheets = XlsxIo.readAllSheets(spark, s"$data/stocks.xlsx")
    assert(sheets.nonEmpty)
    assert(sheets.head.count() > 0)
  }

  test("distributed multi-file read unifies workbooks with inference") {
    val tmp = Files.createTempDirectory("graft_xlsx3").toString
    val src = Tables.t(spark, sfDir, "region")
    XlsxIo.write(src.filter(col("r_regionkey") < 3), s"$tmp/a.xlsx")
    XlsxIo.write(src.filter(col("r_regionkey") >= 3), s"$tmp/b.xlsx")
    val back = XlsxIo.readDistributed(spark, s"$tmp/*.xlsx")
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.count() == src.count())
    assert(back.agg(sum(col("r_regionkey"))).collect()(0).getLong(0) ==
      src.agg(sum(col("r_regionkey").cast(LongType))).collect()(0).getLong(0))
  }
}
