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

  test("duplicate headers in xls throw unless ensureUnique") {
    intercept[RuntimeException] {
      XlsIo.read(spark, s"$data/duplicate-headers.xls")
    }
    val ds = XlsIo.read(spark, s"$data/duplicate-headers.xls",
      XlsxOptions(ensureUnique = true))
    assert(ds.columns.length == ds.columns.distinct.length)
    assert(ds.count() > 0)
  }

  test("readAllSheets returns the workbook's visible sheets") {
    val sheets = XlsIo.readAllSheets(spark, s"$data/file_example_XLS_1000.xls")
    assert(sheets.nonEmpty)
    assert(sheets.head.count() == 1000)
  }
}
