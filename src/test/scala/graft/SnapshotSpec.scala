package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Snapshot

/** Pure-data snapshot (dataset->data / data->dataset) round-trips:
  * values, dtypes, missing slots, column metadata, dataset name. */
class SnapshotSpec extends SparkSuite {
  init()

  private def frame() = {
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = true),
      StructField("l", LongType, nullable = true),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("b", BooleanType, nullable = true),
      StructField("dt", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("arr", ArrayType(DoubleType), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1, 10L, 1.5, "a\"quote\nline", true,
        java.sql.Date.valueOf("2024-01-31"),
        java.sql.Timestamp.valueOf("2024-01-31 12:34:56.789"),
        Seq(1.0, 2.5)),
      Row(null, null, null, null, null, null, null, null),
      Row(3, -7L, math.Pi, "plain", false,
        java.sql.Date.valueOf("1999-12-31"),
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.0"),
        Seq.empty[Double]))
    spark.createDataFrame(rows, schema)
  }

  test("round-trip preserves values, nulls, and dtypes exactly") {
    val df = frame()
    val text = Snapshot.datasetToData(df, "mixed")
    val back = Snapshot.dataToDataset(spark, text)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.collect().map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.toSeq
      case v => v
    })
    val b = back.collect().map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.toSeq
      case v => v
    })
    assert(a.toSeq == b.toSeq)
    assert(Snapshot.datasetName(text).contains("mixed"))
  }

  test("missing indices recorded; nil slots restore as nulls") {
    val text = Snapshot.datasetToData(frame(), "m")
    // row 1 is all-null: every column's :missing holds index 1
    assert(text.contains(":missing [1]"))
  }

  test("StructField metadata survives (set-inference-target contract)") {
    val tagged = ops.Ml.setInferenceTarget(
      frame().select("i", "d"), "d")
    val back = Snapshot.dataToDataset(
      spark, Snapshot.datasetToData(tagged, "t"))
    val f = back.schema("d")
    assert(f.metadata.contains("inference-target") &&
      f.metadata.getBoolean("inference-target"))
  }

  test("maxRows guard fails fast with a parquet pointer") {
    val e = intercept[IllegalArgumentException] {
      Snapshot.datasetToData(frame(), "m", maxRows = 2)
    }
    assert(e.getMessage.contains("parquet"))
  }

  test("file write/read round-trip incl. gz") {
    val tmp = Files.createTempDirectory("graft_snap").toString
    val df = frame()
    Snapshot.write(df, s"$tmp/f.edn", "plainfile")
    Snapshot.write(df, s"$tmp/f.edn.gz", "gzfile")
    val plain = Snapshot.read(spark, s"$tmp/f.edn")
    val gz = Snapshot.read(spark, s"$tmp/f.edn.gz")
    assert(plain.count() == 3 && gz.count() == 3)
    assert(plain.schema == gz.schema)
  }

  test("doubles render shortest-round-trip and re-parse bit-exactly") {
    val vals = Seq(0.1, 1.0 / 3.0, math.Pi, 1e-300, -1.7976931348623157e308,
      4.9e-324, 0.0, -0.0)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vals.map(Row(_)): _*),
      StructType(Seq(StructField("x", DoubleType))))
    val back = Snapshot.dataToDataset(
      spark, Snapshot.datasetToData(df, "dbl"))
    val a = df.collect().map(_.getDouble(0))
    val b = back.collect().map(_.getDouble(0))
    a.zip(b).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToRawLongBits(x) ==
        java.lang.Double.doubleToRawLongBits(y), s"$x != $y")
    }
  }
}
