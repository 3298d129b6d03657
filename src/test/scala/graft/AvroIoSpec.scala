package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.AvroIo

class AvroIoSpec extends SparkSuite {
  init()

  test("avro round-trip: all supported types, nulls, multiple partitions") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType), StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val rows = Seq(
      Row(1L, 7, 1.5, 2.5f, "hi", true, Array[Byte](1, 2, 3),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        java.sql.Date.valueOf("2024-03-01")),
      Row(2L, null, null, null, null, null, null, null, null),
      Row(3L, -1, -0.25, 0.0f, "", false, Array[Byte](),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        java.sql.Date.valueOf("1969-12-31")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val tmp = java.nio.file.Files.createTempDirectory("avro_spec").toString
    AvroIo.write(df, s"$tmp/t")
    val back = AvroIo.read(spark, s"$tmp/t").orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getInt(1) == 7)
    assert(back(0).getAs[String]("s") == "hi")
    assert(back(0).getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2, 3))
    assert(back(0).getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"))
    assert(back(0).getAs[java.sql.Date]("dt") ==
      java.sql.Date.valueOf("2024-03-01"))
    assert((1 to 8).forall(back(1).isNullAt), "null row survives")
    // pre-epoch microsecond timestamp (negative micros, floorDiv path)
    assert(back(2).getAs[java.sql.Timestamp]("ts") ==
      java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"))
    assert(back(2).getAs[Array[Byte]]("bin").isEmpty)
    // distributed write produced one container per non-empty partition
    val parts = new java.io.File(s"$tmp/t").listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length == 3)
  }

  test("avro schema: unsupported nested types refuse loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroIo.write(df, java.nio.file.Files
        .createTempDirectory("avro_spec2").toString + "/t")
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
