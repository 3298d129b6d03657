package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Io

class IoSpec extends SparkSuite {
  init()

  test("csv round-trip preserves data; options honored") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    val li = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").limit(100)
    Io.write(li, s"$tmp/li", format = "csv")
    val back = Io.readCsv(spark, s"$tmp/li",
      Io.ReadOptions(columnAllowlist = Seq("l_orderkey", "l_quantity")))
    assert(back.columns.toSeq == Seq("l_orderkey", "l_quantity"))
    assert(back.count() == 100)
    val limited = Io.readCsv(spark, s"$tmp/li", Io.ReadOptions(numRows = Some(7)))
    assert(limited.count() == 7)
  }

  test("json round-trip") {
    val tmp = Files.createTempDirectory("graft_json").toString
    val src = Tables.t(spark, sfDir, "nation")
    Io.write(src, s"$tmp/n", format = "json")
    val back = Io.readJson(spark, s"$tmp/n")
    assert(back.count() == src.count())
  }

  test("parquet snapshot round-trip exact") {
    val tmp = Files.createTempDirectory("graft_pq").toString
    val src = Tables.t(spark, sfDir, "orders")
    Io.write(src, s"$tmp/o")
    val back = Io.readParquet(spark, s"$tmp/o")
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }
}
