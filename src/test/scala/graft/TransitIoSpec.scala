package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.TransitIo
import graft.sources.TransitIo.Kw

/** Transit interchange: round-trip over the reference's data layout
  * (clj_transit.clj) plus reader compatibility with cognitect-writer
  * features our verbose writer never emits (cache codes). */
class TransitIoSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("dataset round-trips every supported type incl. nulls (issue-388/434 shape)") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", TimestampType), StructField("d", DoubleType),
      StructField("e", BooleanType), StructField("f", DateType),
      StructField("g", IntegerType), StructField("h", ShortType),
      StructField("i", FloatType)))
    val rows = Seq(
      Row(1L, "one", new Timestamp(1700000000123L), 1.5, true,
        Date.valueOf("2024-01-02"), 7, 3.toShort, 2.5f),
      Row(2L, "two", new Timestamp(1700000001456L), -2.25, false,
        Date.valueOf("1969-12-31"), -7, -3.toShort, -0.5f),
      Row(null, null, null, null, null, null, null, null, null),
      Row(3L, "one", new Timestamp(0L), 0.0, true,
        Date.valueOf("1970-01-01"), 0, 0.toShort, 0f))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val str = TransitIo.datasetToTransitStr(df, "t")
    val back = TransitIo.transitStrToDataset(spark, str)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSeq == rows)
  }

  test("non-finite doubles and sub-milli timestamps: documented contract holds") {
    // NaN/±Inf render as the transit special strings (bare words would be
    // invalid JSON), and they read back symmetrically
    val json = TransitIo.writeTransitJson(Seq(Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, 1.5))
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(json) // must be valid JSON
    val back = TransitIo.readTransitJson(json).asInstanceOf[Seq[Any]]
    assert(back(0).asInstanceOf[Double].isNaN)
    assert(back(1) == Double.PositiveInfinity)
    assert(back(2) == Double.NegativeInfinity)
    assert(back(3) == 1.5)
    // timestamps are int64 MILLIS on the wire (the reference's packed
    // layout): micros truncate on a round-trip — pinned, not accidental
    val ts = Timestamp.valueOf("2024-01-02 03:04:05.123456")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(ts)), 1),
      StructType(Seq(StructField("t", TimestampType))))
    val got = TransitIo.transitStrToDataset(spark,
        TransitIo.datasetToTransitStr(df, "t")).collect()(0)
      .getAs[Timestamp](0)
    assert(got == Timestamp.valueOf("2024-01-02 03:04:05.123"))
  }

  test("string columns use the reference's strtable+indexes layout") {
    val df = Seq("x", "y", "x", "x").toDF("s")
    val data = TransitIo.readTransitJson(
        TransitIo.datasetToTransitStr(df.coalesce(1)))
      .asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
    val col0 = data(Kw("columns")).asInstanceOf[Seq[Any]].head
      .asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
    val d = col0(Kw("data"))
      .asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
    assert(d(Kw("strtable")) == Seq("x", "y"))
    val idx = java.nio.ByteBuffer
      .wrap(java.util.Base64.getDecoder.decode(
        d(Kw("indexes")).asInstanceOf[String]))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asIntBuffer()
    assert((0 until 4).map(idx.get) == Seq(0, 1, 0, 0))
  }

  test("numeric buffers are base64 little-endian (cross-impl layout pin)") {
    val df = Seq(258L).toDF("v") // 0x0102 → LE bytes 02 01 00 ...
    val data = TransitIo.readTransitJson(TransitIo.datasetToTransitStr(df))
      .asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
    val b64 = data(Kw("columns")).asInstanceOf[Seq[Any]].head
      .asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
      .apply(Kw("data")).asInstanceOf[String]
    val bytes = java.util.Base64.getDecoder.decode(b64)
    assert(bytes.toSeq == Seq[Byte](2, 1, 0, 0, 0, 0, 0, 0))
  }

  test("reader handles cognitect cache codes, array-maps, escapes, ~i longs") {
    // handcrafted per the transit spec: "~:keyword" cached as ^0 on first
    // use, reused as a map key; "~i" long beyond 2^53; escaped literal
    val s = """["^ ","~:columns",[["^ ","~:namelike","a"],["^ ","^1","b"]],""" +
      """"~:big","~i9007199254740999","~:esc","~~tilde"]"""
    val m = TransitIo.readTransitJson(s)
      .asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
    val cols = m(Kw("columns")).asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]])
    assert(cols(0)(Kw("namelike")) == "a")
    assert(cols(1)(Kw("namelike")) == "b", "cache code ^1 must resolve")
    assert(m(Kw("big")) == 9007199254740999L)
    assert(m(Kw("esc")) == "~tilde")
  }

  test("keyword column names from a clojure-side writer surface as strings") {
    // the reference writes {:a [...]} with Kw names in column metadata
    val s = TransitIo.writeTransitJson(
      scala.collection.mutable.LinkedHashMap[Any, Any](
        Kw("metadata") -> scala.collection.mutable.LinkedHashMap[Any, Any](),
        Kw("flavor") -> Kw("transit"), Kw("version") -> 1L,
        Kw("columns") -> Seq(
          scala.collection.mutable.LinkedHashMap[Any, Any](
            Kw("metadata") -> scala.collection.mutable.LinkedHashMap[Any, Any](
              Kw("name") -> Kw("a"), Kw("datatype") -> Kw("int64")),
            Kw("missing") -> Seq.empty[Any],
            Kw("data") -> java.util.Base64.getEncoder.encodeToString(
              java.nio.ByteBuffer.allocate(8)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                .putLong(42L).array())))))
    val back = TransitIo.transitStrToDataset(spark, s)
    assert(back.columns.toSeq == Seq("a"))
    assert(back.as[Long].collect().toSeq == Seq(42L))
  }
}
