package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{XlsIo, XlsxIo}
import graft.sources.XlsxIo.XlsxOptions

/** Legacy .xls (BIFF8/OLE2) reader, pinned to the reference's POI-path
  * fixtures (reference test/tech/v3/libs/poi_test.clj) and cross-checked
  * against the xlsx parse of the same workbook content. */
class XlsIoSpec extends SparkSuite {
  init()

  private val data = "/root/reference/test/data"

  test("happy path: file_example_XLS_1000 matches its xlsx twin") {
    val xls = XlsIo.read(spark, s"$data/file_example_XLS_1000.xls")
    val xlsx = XlsxIo.read(spark, s"$data/file_example_XLSX_1000.xlsx")
    // poi_test.clj:18-31: same names, same row/column counts as the xlsx
    assert(xls.columns.toSet == xlsx.columns.toSet)
    assert(xls.count() == 1000)
    assert(xls.columns.length == 8)
    // cell-level agreement between the two container formats
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select(d.columns.sorted.map(c => col(c).cast(StringType)): _*)
        .collect().map(_.mkString("|")).sorted.toSeq
    assert(key(xls) == key(xlsx))
  }

  test("parserFn overrides on xls columns (poi custom-parser/integer tests)") {
    val ds = XlsIo.read(spark, s"$data/file_example_XLS_1000.xls",
      XlsxOptions(parserFn = Map("Id" -> LongType)))
    assert(ds.schema("Id").dataType == LongType)
    assert(ds.filter(col("Id").isNull).count() == 0)
  }

  test("write round-trip: typed cells survive BIFF8, mini-stream CFB path") {
    import spark.implicits._
    // small workbook (< 4096 bytes) → mini-FAT container path
    val tmp = java.nio.file.Files.createTempDirectory("xls_w1").toString
    val src = Seq(
      (1L, "plain", Some(1.5), Some(true), Some(java.sql.Date.valueOf("2020-02-29"))),
      (2L, "uni é中<>&\"", Some(-2.25), Some(false), None),
      (3L, "", None, None, Some(java.sql.Date.valueOf("1999-12-31"))))
      .toDF("id", "s", "d", "b", "dt")
    XlsIo.write(src, s"$tmp/t.xls")
    val back = XlsIo.read(spark, s"$tmp/t.xls")
    val rows = back.orderBy("id").collect()
    assert(rows.length == 3)
    assert(back.schema("dt").dataType == DateType)
    assert(rows(0).getAs[String]("s") == "plain" &&
      rows(0).getAs[Double]("d") == 1.5 &&
      rows(0).getAs[Boolean]("b") == true &&
      rows(0).getAs[java.sql.Date]("dt").toString == "2020-02-29")
    assert(rows(1).getAs[String]("s") == "uni é中<>&\"")
    assert(rows(1).getAs[Boolean]("b") == false &&
      rows(1).isNullAt(rows(1).fieldIndex("dt")))
    // empty string round-trips as missing-or-empty; numerics absent → null
    assert(rows(2).isNullAt(rows(2).fieldIndex("d")) &&
      rows(2).isNullAt(rows(2).fieldIndex("b")))
  }

  test("write round-trip: timestamp serials and the regular-FAT path (>4K)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("xls_w2").toString
    // 500 rows of strings pushes the stream past the 4096 mini cutoff
    val src = (0 until 500).map(i =>
      (i.toLong, s"row_$i", i * 0.5,
        java.sql.Timestamp.valueOf(s"2021-03-0${i % 9 + 1} 12:34:56")))
      .toDF("id", "s", "d", "ts")
    XlsIo.write(src, s"$tmp/big.xls")
    val back = XlsIo.read(spark, s"$tmp/big.xls")
    assert(back.count() == 500)
    assert(back.schema("ts").dataType == TimestampType)
    val r7 = back.filter(col("id") === 7.0).collect()(0)
    assert(r7.getAs[String]("s") == "row_7" && r7.getAs[Double]("d") == 3.5)
    assert(r7.getAs[java.sql.Timestamp]("ts").toString == "2021-03-08 12:34:56.0")
    // xlsx twin of the same frame parses identically (shared classification)
    XlsxIo.write(src, s"$tmp/big.xlsx")
    val twin = XlsxIo.read(spark, s"$tmp/big.xlsx")
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select(d.columns.sorted.map(c => col(c).cast(StringType)): _*)
        .collect().map(_.mkString("|")).sorted.toSeq
    assert(key(back) == key(twin))
  }

  test("write refuses binary/nested cells and >65536 rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("xls_w3").toString
    val bin = Seq((1, Array[Byte](1, 2))).toDF("i", "b")
    val e = intercept[IllegalArgumentException] {
      XlsIo.write(bin, s"$tmp/bin.xls")
    }
    assert(e.getMessage.contains("binary"))
    val nested = Seq((1, Seq(1, 2))).toDF("i", "a")
    intercept[IllegalArgumentException] { XlsIo.write(nested, s"$tmp/n.xls") }
  }

  test("duplicate headers in xls throw unless ensureUnique") {
    intercept[RuntimeException] {
      XlsIo.read(spark, s"$data/duplicate-headers.xls")
    }
    val ds = XlsIo.read(spark, s"$data/duplicate-headers.xls",
      XlsxOptions(ensureUnique = true))
    assert(ds.columns.length == ds.columns.distinct.length)
    assert(ds.count() > 0)
  }

  test("writeWorkbook: multi-sheet write reads back cell-exact, in order") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("xls_wb").toString
    val s1 = Seq((1L, "a", 1.5), (2L, "b", -2.0)).toDF("id", "s", "v")
    val s2 = Seq((10L, Some(java.sql.Date.valueOf("2021-06-30"))),
      (11L, None)).toDF("k", "dt")
    XlsIo.writeWorkbook(Seq("first" -> s1, "second" -> s2), s"$tmp/wb.xls")
    val back = XlsIo.readAllSheets(spark, s"$tmp/wb.xls")
    assert(back.length == 2)
    val b1 = back(0).orderBy("id").collect()
    assert(b1.map(r => (r.getAs[Number]("id").longValue(), r.getAs[String]("s"),
      r.getAs[Number]("v").doubleValue())).toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", -2.0)))
    val b2 = back(1).orderBy("k").collect()
    assert(back(1).schema("dt").dataType == DateType)
    assert(b2(0).getAs[java.sql.Date]("dt").toString == "2021-06-30")
    assert(b2(1).isNullAt(b2(1).fieldIndex("dt")))
    // sheet names preserved in workbook order
    assert(XlsIo.sheetNames(spark, s"$tmp/wb.xls") == Seq("first", "second"))
    // duplicate names refuse
    intercept[IllegalArgumentException] {
      XlsIo.writeWorkbook(Seq("x" -> s1, "x" -> s2), s"$tmp/dup.xls")
    }
  }

  test("readAllSheets returns the workbook's visible sheets") {
    val sheets = XlsIo.readAllSheets(spark, s"$data/file_example_XLS_1000.xls")
    assert(sheets.nonEmpty)
    assert(sheets.head.count() == 1000)
  }
}
