package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.sources.ArrowIo

class ArrowIoSpec extends SparkSuite {
  init()
  import spark.implicits._

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def assertSameData(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ==
           b.schema.map(f => (f.name, f.dataType)))
    assert(a.count() == b.count())
    // arrays aren't except()-comparable everywhere; stringify row-wise
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select(concat_ws("", d.columns.map(c => col(c).cast(StringType)): _*))
        .as[String].collect().sorted.toSeq
    assert(key(a) == key(b))
  }

  test("arrow IPC stream round-trips every testdata table") {
    val tmp = Files.createTempDirectory("graft_arrow").toString
    allTables.foreach { name =>
      val src = Tables.t(spark, sfDir, name)
      ArrowIo.write(src, s"$tmp/$name", batchRows = 512)
      val back = ArrowIo.read(spark, s"$tmp/$name")
      assertSameData(src, back)
    }
  }

  test("arrow file format (feather v2) round-trips incl. list<float>") {
    val tmp = Files.createTempDirectory("graft_feather").toString
    val emb = Tables.t(spark, sfDir, "embeddings")
    ArrowIo.write(emb, s"$tmp/emb", batchRows = 100, format = "file")
    val back = ArrowIo.read(spark, s"$tmp/emb")
    assertSameData(emb, back)
    // random-access framing really is the file format (magic bytes)
    val f = new java.io.File(s"$tmp/emb").listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    val head = Files.readAllBytes(f.toPath).take(6)
    assert(new String(head, "US-ASCII") == "ARROW1")
  }

  test("arrow write is one part file per partition, read is one task per file") {
    val tmp = Files.createTempDirectory("graft_arrow_parts").toString
    val df = Tables.t(spark, sfDir, "orders").repartition(3)
    ArrowIo.write(df, s"$tmp/o")
    val parts = new java.io.File(s"$tmp/o").listFiles()
      .filter(_.getName.endsWith(".arrows"))
    assert(parts.length == 3)
    val back = ArrowIo.read(spark, s"$tmp/o")
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == df.count())
  }

  test("reads pyarrow dictionary-encoded + zstd/lz4 compressed IPC files") {
    // fixtures from tools/make_arrow_fixtures.py: 60 rows, dict-encoded
    // `cat` (with nulls), 3 record batches, both framings
    val dir = new java.io.File("src/test/resources/arrow").getAbsolutePath
    val cats = Seq("alpha", "beta", "gamma", null)
    for (f <- Seq("dict_zstd.arrows", "dict_lz4.arrows", "dict_zstd.arrow",
        "dict_plain.arrows")) {
      val df = ArrowIo.read(spark, s"$dir/$f")
      assert(df.schema.map(x => (x.name, x.dataType)) ==
        Seq(("id", LongType), ("cat", StringType), ("val", DoubleType)),
        s"schema of $f (dictionary must surface as its VALUE type)")
      val rows = df.orderBy("id").collect()
      assert(rows.length == 60, s"rows of $f")
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) == i)
        assert(r.getAs[String]("cat") == cats(i % 4), s"$f row $i")
        assert(r.getDouble(2) == i * 0.5)
      }
    }
  }

  test("dictionary write round-trips; encoded file is smaller; pyarrow-decodable layout") {
    val tmp = Files.createTempDirectory("graft_arrow_dict").toString
    val src = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    // low-cardinality source/lang dict-encoded; text falls back (cap 8)
    ArrowIo.write(src, s"$tmp/dict", batchRows = 512,
      dictColumns = Seq("source", "lang", "text"), maxDictSize = 8)
    val back = ArrowIo.read(spark, s"$tmp/dict")
    assertSameData(src, back)
    // nulls in a dict column survive
    val withNulls = src.withColumn("source",
      when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("source")))
    ArrowIo.write(withNulls, s"$tmp/dictnull", dictColumns = Seq("source"))
    assertSameData(withNulls, ArrowIo.read(spark, s"$tmp/dictnull"))
    // the index form is genuinely smaller than plain utf8 for a repeated
    // string column (source values repeat thousands of times)
    val rep = src.select(col("doc_id"), col("source"))
    ArrowIo.write(rep, s"$tmp/plain")
    ArrowIo.write(rep, s"$tmp/enc", dictColumns = Seq("source"))
    def dirSize(p: String): Long =
      new java.io.File(p).listFiles().map(_.length()).sum
    assert(dirSize(s"$tmp/enc") < dirSize(s"$tmp/plain"),
      s"enc=${dirSize(s"$tmp/enc")} plain=${dirSize(s"$tmp/plain")}")
    // both framings carry the dictionary batches
    ArrowIo.write(rep, s"$tmp/encfile", format = "file",
      dictColumns = Seq("source"))
    assertSameData(rep, ArrowIo.read(spark, s"$tmp/encfile"))
  }

  test("compressed write round-trips and actually shrinks text data") {
    val tmp = Files.createTempDirectory("graft_arrow_codec").toString
    val docs = Tables.t(spark, sfDir, "documents").limit(200)
    def dirSize(p: String): Long =
      new java.io.File(p).listFiles().map(_.length()).sum
    for ((codec, fmt) <- Seq(("lz4", "stream"), ("zstd", "stream"),
        ("zstd", "file"))) {
      val out = s"$tmp/d_${codec}_$fmt"
      ArrowIo.write(docs, out, batchRows = 64, format = fmt, codec = codec)
      assertSameData(docs, ArrowIo.read(spark, out))
    }
    ArrowIo.write(docs, s"$tmp/d_plain", batchRows = 64)
    assert(dirSize(s"$tmp/d_zstd_stream") < dirSize(s"$tmp/d_plain"),
      "zstd output should be smaller than uncompressed on text")
  }

  test("arrow round-trips nulls, booleans, dates, decimals, null lists") {
    val tmp = Files.createTempDirectory("graft_arrow_nulls").toString
    val schema = StructType(Seq(
      StructField("i", IntegerType, true),
      StructField("b", BooleanType, true),
      StructField("d", DateType, true),
      StructField("m", DecimalType(12, 2), true),
      StructField("s", StringType, true),
      StructField("xs", ArrayType(LongType, true), true)))
    val rows = Seq(
      Row(1, true, java.sql.Date.valueOf("2024-01-31"),
        new java.math.BigDecimal("12345.67"), "hello", Seq(1L, 2L, 3L)),
      Row(null, null, null, null, null, null),
      Row(3, false, java.sql.Date.valueOf("1969-12-31"),
        new java.math.BigDecimal("-0.01"), "", Seq(null, 4L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    ArrowIo.write(df, s"$tmp/t")
    val back = ArrowIo.read(spark, s"$tmp/t")
    assertSameData(df, back)
    // null vs empty list distinguished
    val got = back.orderBy(col("i").asc_nulls_last).collect()
    assert(got(2).isNullAt(5) && got(0).getSeq[Any](5) == Seq(1L, 2L, 3L))
  }

  test("struct columns round-trip (nested struct, null structs/fields)") {
    val tmp = Files.createTempDirectory("graft_arrow_struct").toString
    val inner = StructType(Seq(
      StructField("x", DoubleType, true),
      StructField("y", StringType, true)))
    val rec = StructType(Seq(
      StructField("a", LongType, true),
      StructField("s", inner, true),
      StructField("xs", ArrayType(LongType, true), true)))
    val schema = StructType(Seq(
      StructField("id", LongType, true),
      StructField("rec", rec, true)))
    val rows = Seq(
      Row(0L, Row(0L, Row(0.25, "s0"), Seq.empty[Long])),
      Row(1L, Row(1L, Row(0.5, null), Seq(0L))),
      Row(2L, Row(2L, null, Seq(0L, 1L))),
      Row(3L, null),
      Row(4L, Row(null, Row(null, "s4"), null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    for (fmt <- Seq("stream", "file")) {
      ArrowIo.write(df, s"$tmp/$fmt", batchRows = 2, format = fmt)
      val back = ArrowIo.read(spark, s"$tmp/$fmt")
      assert(back.schema == schema, s"$fmt schema")
      assertSameData(df, back)
      val r3 = back.filter(col("id") === 3).collect()(0)
      assert(r3.isNullAt(1), s"$fmt null struct row")
      val r2 = back.filter(col("id") === 2).collect()(0)
      assert(r2.getStruct(1).isNullAt(1), s"$fmt null inner struct")
    }
  }

  test("reads the reference's own interchange fixtures (unsigned/time/dict/binary)") {
    val data = "/root/reference/test/data"
    // alldtypes.arrow-ipc: uint8/16/32, time64[us], dict<int16>-encoded
    // strings, plus every signed atomic — 1000 rows (expectations pinned
    // from pyarrow)
    val all = ArrowIo.read(spark, s"$data/alldtypes.arrow-ipc")
    assert(all.count() == 1000)
    assert(all.schema("uints").dataType == LongType)     // uint32 widened
    assert(all.schema("ubytes").dataType == ShortType)   // uint8 widened
    assert(all.schema("ushorts").dataType == IntegerType)// uint16 widened
    assert(all.schema("local_times").dataType == LongType) // time64 -> micros
    assert(all.schema("strings").dataType == StringType) // dict<int16> decoded
    val sums = all.agg(sum("uints"), sum("ubytes"), sum("ushorts"),
      sum("longs"), sum("doubles"), sum("ints")).collect()(0)
    assert(sums.getLong(0) == 499500L && sums.getLong(1) == 124716L &&
      sums.getLong(2) == 499500L && sums.getLong(3) == 499500L &&
      sums.getDouble(4) == 499500.0 && sums.getLong(5) == 499500L)
    val first = all.orderBy("ints").select("strings", "local_times",
      "local_dates").first()
    assert(first.getString(0) == "0")
    // 13:39:59.908 since midnight, in micros
    assert(first.getLong(1) == ((13L * 3600 + 39 * 60 + 59) * 1000 + 908) * 1000)
    assert(first.getAs[java.sql.Date](2).toString == "2022-02-19")

    // compressed twins decode identically
    for (f <- Seq("alldtypes.arrow-ipc-lz4", "alldtypes.arrow-ipc-zstd")) {
      val c = ArrowIo.read(spark, s"$data/$f")
      assert(c.count() == 1000, f)
      assert(c.agg(sum("uints")).collect()(0).getLong(0) == 499500L, f)
    }

    // null-typed column, raw binary, list<string>/list<double>, decimal
    val nullcol = ArrowIo.read(spark, s"$data/withnullcol.arrow")
    assert(nullcol.schema("nullcol").dataType == StringType)
    assert(nullcol.filter(col("nullcol").isNull).count() == nullcol.count())
    val bytes = ArrowIo.read(spark, s"$data/arrow_bytes.arrow")
    assert(bytes.schema("bytedata").dataType == BinaryType && bytes.count() == 3)
    val lists = ArrowIo.read(spark, s"$data/arrow_list.arrow")
    assert(lists.schema("class-name").dataType == ArrayType(StringType, true))
    assert(lists.schema("confidence").dataType == ArrayType(DoubleType, true))
    assert(lists.count() == 3)
    val dec = ArrowIo.read(spark, s"$data/bigdec.arrow")
    assert(dec.schema("id").dataType == DecimalType(5, 2) && dec.count() == 3)
    val uuid = ArrowIo.read(spark, s"$data/uuid_ext.arrow")
    assert(uuid.schema("id").dataType == BinaryType && uuid.count() == 3)
  }

  test("decodes every reference IPC fixture; Feather V1 is the one exception") {
    val data = "/root/reference/test/data"
    // (file, expected rows) — the reference repo's real interchange files,
    // spanning timestamp[ms/us] w/ and w/o TZ, date64, LargeUtf8, 81-column
    // frames, empty batches, both framings, arbitrary extensions
    val decodable = Seq(
      "ames.pyarrow.stream" -> 1460L,
      "stocks.pyarrow.stream" -> 560L,
      "stocks.pyarrow.feather" -> 560L,
      "tweets_sentiment.feather" -> 31962L,
      "part-8981.ipc_stream" -> 2L,
      "largeVarChar.ipc" -> 1L,
      "alldtypes.arrow-feather" -> 1000L,
      "alldtypes.arrow-feather-compressed" -> 1000L,
      "empty.arrow" -> 0L,
      "with_date.arrow" -> 3L)
    decodable.foreach { case (f, n) =>
      assert(ArrowIo.read(spark, s"$data/$f").count() == n, f)
    }
    // Feather V1 (pre-IPC, "FEA1" container) is NOT the Arrow IPC format —
    // documented out of scope; must fail loudly, not decode garbage
    for (f <- Seq("iris.feather", "alldtypes.arrow-feather-v1"))
      intercept[Exception] { ArrowIo.read(spark, s"$data/$f").count() }
  }

  test("reads pyarrow-written nested struct file (incl. null struct rows)") {
    val dir = new java.io.File("src/test/resources/arrow").getAbsolutePath
    val df = ArrowIo.read(spark, s"$dir/nested_struct.arrows")
    assert(df.count() == 30)
    val rec = df.schema("rec").dataType.asInstanceOf[StructType]
    assert(rec.fieldNames.toSeq == Seq("a", "s", "xs"))
    val rows = df.orderBy("id").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i % 7 == 3) assert(r.isNullAt(1), s"row $i should be null struct")
      else {
        val rc = r.getStruct(1)
        assert(rc.getLong(0) == i)
        if (i % 5 == 2) assert(rc.isNullAt(1))
        else {
          val s = rc.getStruct(1)
          assert(s.getDouble(0) == i * 0.25)
          if (i % 4 == 1) assert(s.isNullAt(1)) else assert(s.getString(1) == s"s$i")
        }
        assert(rc.getSeq[Long](2) == (0L until (i % 3).toLong))
      }
    }
  }

  test("reads pyarrow-written list-of-struct and map columns") {
    val dir = new java.io.File("src/test/resources/arrow").getAbsolutePath
    val df = ArrowIo.read(spark, s"$dir/list_struct_map.arrows")
    assert(df.count() == 30)
    assert(df.schema("recs").dataType ==
      ArrayType(StructType(Seq(StructField("k", StringType),
        StructField("n", LongType))), containsNull = true))
    assert(df.schema("tags").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    val rows = df.orderBy("id").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i % 9 == 4) assert(r.isNullAt(1), s"row $i recs should be null")
      else {
        val recs = r.getSeq[Row](1)
        assert(recs.length == i % 4, s"row $i recs length")
        recs.zipWithIndex.foreach { case (rec, j) =>
          assert(rec.getString(0) == s"k${i}_$j")
          if (j == 2) assert(rec.isNullAt(1))
          else assert(rec.getLong(1) == i * 10L + j)
        }
      }
      if (i % 8 == 5) assert(r.isNullAt(2), s"row $i tags should be null")
      else {
        val tags = r.getMap[String, Any](2)
        assert(tags.size == i % 3, s"row $i tags size")
        (0 until i % 3).foreach { j =>
          val v = tags(s"m$j")
          if (j == 1 && i % 2 == 0) assert(v == null)
          else assert(v == (i + j).toLong)
        }
      }
    }
  }

  test("list-of-struct, nested lists, and maps round-trip through the writer") {
    val tmp = Files.createTempDirectory("graft_arrow_nested").toString
    val src = spark.range(40).selectExpr(
      "id",
      // list-of-struct (null list every 9th, null struct element every 7th,
      // null inner field every 5th)
      """CASE WHEN id % 9 = 4 THEN NULL ELSE
           transform(slice(sequence(1, 3), 1, CAST(id % 4 AS INT)), j ->
             CASE WHEN (id + j) % 7 = 0 THEN NULL
                  ELSE named_struct('k', concat('k', id, '_', j),
                                    'n', CASE WHEN (id + j) % 5 = 0 THEN NULL
                                              ELSE id * 10 + j END) END)
         END AS recs""",
      // nested list
      """CASE WHEN id % 11 = 3 THEN NULL ELSE
           transform(sequence(0, CAST(id % 3 AS INT)), j ->
             sequence(0, j)) END AS grid""",
      // map with null values
      """CASE WHEN id % 8 = 5 THEN NULL ELSE
           map_from_arrays(
             transform(slice(sequence(1, 2), 1, CAST(id % 3 AS INT)), j -> concat('m', j)),
             transform(slice(sequence(1, 2), 1, CAST(id % 3 AS INT)), j ->
               CASE WHEN j = 2 THEN NULL ELSE id + j END))
         END AS tags""")
    for (fmt <- Seq("stream", "file"); codec <- Seq("none", "zstd")) {
      val path = s"$tmp/nested_${fmt}_$codec"
      ArrowIo.write(src, path, batchRows = 7, format = fmt, codec = codec)
      val back = ArrowIo.read(spark, path)
      assert(back.schema("recs").dataType == src.schema("recs").dataType,
        s"$fmt/$codec recs schema")
      assert(back.schema("tags").dataType == src.schema("tags").dataType,
        s"$fmt/$codec tags schema")
      assertSameData(src, back)
    }
  }
}
