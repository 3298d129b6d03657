package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Io

class IoSpec extends SparkSuite {
  init()
  import spark.implicits._

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

  test("promotional inference narrows like the reference (datatype_parser pins)") {
    // mirrors /root/reference test fixture semantics (FIXTURES.md §A):
    // small ints → int16, bool-only → boolean, mixed bool-ish strings → string
    val tmp = Files.createTempDirectory("graft_promo").toString
    val csv =
      """id,chr,bool,boolstr,num,big
        |1,t,true,true,1.5,9999999999
        |2,f,false,False,2.5,9999999998
        |10,A,true,positive,3.5,9999999997
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$tmp/d.csv"), csv)
    val df = Io.readCsvPromotional(spark, s"$tmp/d.csv")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == org.apache.spark.sql.types.ShortType)     // int16, not int32
    assert(types("chr") == org.apache.spark.sql.types.StringType)   // 'A' breaks bool
    assert(types("bool") == org.apache.spark.sql.types.BooleanType)
    assert(types("boolstr") == org.apache.spark.sql.types.StringType) // 'positive' not in strict table
    assert(types("num") == org.apache.spark.sql.types.DoubleType)
    assert(types("big") == org.apache.spark.sql.types.LongType)
    assert(df.filter(col("bool")).count() == 2)
  }

  test("fused date kernel ≡ the regex/try_to_date ladder (edge cases + fuzz)") {
    // the kernel (CsvProbe.FlexLocalDate) replaced the 7-pattern ladder in
    // every code path; the ladder stays as the independent semantic spec
    val edge = Seq(
      "2020-01-03", "2020/1/3", "20200103", "Jan 1 2000", "JAN 1 2000",
      "jan 1 2000", "1 Jan 2000", "01 02 2000", "1 2 34", "5 3 2",
      "123 4 5", "Feb 30 2020", "Feb 29 2020", "Feb 29 1900", "0000 1 1",
      "00 1 1", "31 12 1999", "12 31 1999", "1999 12 31", " 2020-01-03",
      "2020-01-03 ", "2020 - 01 - 03", "0001 1 1", "9999 12 31",
      "Sep 5 21", "Sept 5 2021", "May 05 0005", "13 13 13", "12 12 12",
      "1.2.2003", "1,2,2003", "2020.01.03", "99 1 1", "031 4 5",
      "2-3-4", "0004 02 29", "1 13 2000", "0 1 2000", "2000 0 1",
      "2000 1 0", "2000 13 1", "", "-", "a b c", "Jan Feb Mar",
      "00000000", "99991231", "00010101", "20200230", "2020--01--03",
      "2e3 1 1", "+2020 1 1", "2020 +1 1", "x", "May 5", "May 5 5 5")
    val rnd = new scala.util.Random(77)
    val toks = Seq("1", "12", "123", "1234", "0", "05", "31", "30", "29",
      "2020", "1900", "2000", "99", "Jan", "Dec", "May", "xyz", "JAN",
      "dec", "20200103", "abc")
    val seps = Seq(" ", "-", "/", ".", ",", " - ", "")
    val fuzz = (1 to 4000).map { _ =>
      val k = 1 + rnd.nextInt(3)
      (1 to k).map(_ => toks(rnd.nextInt(toks.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
    }
    val df = (edge ++ fuzz).toDF("s")
      .withColumn("kernel", Io.parseLocalDateFlex(col("s")))
      .withColumn("ladder", Io.parseLocalDateFlexLadder(col("s")))
    val bad = df.filter(!(col("kernel") <=> col("ladder"))).collect()
    assert(bad.isEmpty, bad.take(10).map(r =>
      s"[${r.get(0)}] kernel=${r.get(1)} ladder=${r.get(2)}").mkString("; "))
  }

  test("salted join equals plain join on skewed keys") {
    val left = (Seq.fill(500)(1) ++ Seq(2, 3)).toDF("k")
    val right = Seq((1, "hot"), (2, "b"), (3, "c")).toDF("k", "v")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = graft.ops.Joins.saltedJoin(left, right, Seq("k"), 8)
      .groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("co-bucketed tables join without a shuffle") {
    val li = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    // a stale warehouse location from a previous JVM blocks saveAsTable even
    // in Overwrite mode (catalog metadata is per-session, the dir is not)
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    Io.writeBucketed(li, "b_lineitem", 4, Seq("l_orderkey"))
    Io.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_orders", 4, Seq("l_orderkey"))
    val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
    // force sort-merge so the bucketing (not a broadcast) carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("json round-trip") {
    val tmp = Files.createTempDirectory("graft_json").toString
    val src = Tables.t(spark, sfDir, "nation")
    Io.write(src, s"$tmp/n", format = "json")
    val back = Io.readJson(spark, s"$tmp/n")
    assert(back.count() == src.count())
  }

  test("zip-of-csv: multi-entry archive flattens without header leakage") {
    val tmp = Files.createTempDirectory("graft_zip").toString
    val zipPath = java.nio.file.Paths.get(s"$tmp/data.zip")
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(zipPath))
    def entry(name: String, content: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    entry("a.csv", "id,name,score\n1,ann,1.5\n2,bob,2.5\n")
    entry("b.csv", "id,name,score\n3,cat,3.5\n4,dan,4.5\n")
    zout.close()
    val df = Io.readCsvZip(spark, zipPath.toString)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    assert(df.count() == 4) // 2 entries × 2 rows, no header rows as data
    assert(df.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(df.agg(sum(col("score"))).collect()(0).getDouble(0) == 12.0)
    // allowlist + numRows options flow through
    val part = Io.readCsvZip(spark, zipPath.toString,
      Io.ReadOptions(columnAllowlist = Seq("id"), numRows = Some(3)))
    assert(part.columns.toSeq == Seq("id") && part.count() == 3)
  }

  test("parquet snapshot round-trip exact") {
    val tmp = Files.createTempDirectory("graft_pq").toString
    val src = Tables.t(spark, sfDir, "orders")
    Io.write(src, s"$tmp/o")
    val back = Io.readParquet(spark, s"$tmp/o")
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("ragged csv widens to the longest row (reference ragged.csv)") {
    val df = Io.readCsvRagged(spark, "/root/reference/test/data/ragged.csv",
      Io.ReadOptions(headerRow = false))
    assert(df.count() == 11)
    assert(df.columns.length == 12) // row 4 has 12 fields; Spark native truncates to 5
    val r0 = df.filter(col("column-0") === "0").collect()(0)
    assert(r0.getString(4) == "67" && r0.isNullAt(5)) // short row padded with nulls
    val r4 = df.filter(col("column-0") === "4").collect()(0)
    assert(r4.getString(11) == "97") // longest row fully present
  }

  test("ragged csv: quoted separators do not widen; all-empty trailing column survives") {
    val tmp = Files.createTempDirectory("graft_ragged_q").toString
    // row 1: a quoted cell full of commas (must NOT widen the schema);
    // every row carries a trailing empty field — a REAL all-empty column
    // that the old all-null-suffix drop would have eaten
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/q.csv"),
      "1,\"a,b,c\",\n2,plain,\n".getBytes("UTF-8"))
    val df = Io.readCsvRagged(spark, s"$tmp/q.csv",
      Io.ReadOptions(headerRow = false))
    assert(df.columns.length == 3,
      s"expected 3 columns (quoted commas must not count), got ${df.columns.toSeq}")
    val r1 = df.filter(col("column-0") === "1").collect()(0)
    assert(r1.getString(1) == "a,b,c")
    assert(r1.isNullAt(2), "trailing empty field reads as missing")
  }

  test("ragged csv: stray mid-field quote is literal, not a quote toggle") {
    val tmp = Files.createTempDirectory("graft_ragged_sq").toString
    // univocity (Spark's parser) only honors a quote at FIELD START; a
    // mid-field quote on the widest line must not swallow the separators
    // after it, or the schema narrows and real trailing fields vanish
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/sq.csv"),
      "5\" nail,a,b\nx,y\n".getBytes("UTF-8"))
    val df = Io.readCsvRagged(spark, s"$tmp/sq.csv",
      Io.ReadOptions(headerRow = false))
    assert(df.columns.length == 3,
      s"expected 3 columns (mid-field quote is literal), got ${df.columns.toSeq}")
    val r1 = df.filter(col("column-0") === "5\" nail").collect()
    assert(r1.length == 1 && r1(0).getString(2) == "b")
    // field-START quotes still suppress separators (regression guard)
    assert(Io.fieldCount("\"a,b\",c", ",") == 2)
    assert(Io.fieldCount("\"a\"\"b,\",c", ",") == 2) // escaped quote stays in-field
    assert(Io.fieldCount("\"a\"\",b\"", ",") == 1)   // "" then separator: still quoted
  }

  test("ragged csv with header row keeps the real header names") {
    val tmp = Files.createTempDirectory("graft_ragged").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/r.csv"),
      "id,name\n1,ann,extra1,extra2\n2,bob\n".getBytes("UTF-8"))
    val df = Io.readCsvRagged(spark, s"$tmp/r.csv")
    assert(df.columns.toSeq == Seq("id", "name", "column-2", "column-3"))
    val r1 = df.filter(col("id") === "1").collect()(0)
    assert(r1.getString(2) == "extra1" && r1.getString(3) == "extra2")
    val r2 = df.filter(col("id") === "2").collect()(0)
    assert(r2.getString(1) == "bob" && r2.isNullAt(2))
  }

  test("dos/mac/unix line endings parse identically (reference essential.csv)") {
    val opts = Io.ReadOptions(skipRows = 3, comment = Some('#'))
    def parse(f: String) =
      Io.readCsv(spark, s"/root/reference/test/data/$f",
        opts.copy(schema = Some(org.apache.spark.sql.types.StructType(
          Seq("Year", "Make", "Model", "Description", "Price").map(n =>
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.StringType, true))))))
    val unix = parse("essential.csv").collect().map(_.toSeq).toSeq
    val dos = parse("essential-dos.csv").collect().map(_.toSeq).toSeq
    val mac = parse("essential-mac.csv").collect().map(_.toSeq).toSeq
    assert(unix.nonEmpty)
    assert(dos == unix, "CRLF file must parse identically to LF")
    assert(mac == unix, "bare-CR file must parse identically to LF")
  }

  test("comment lines dropped by option (reference csv-comment.csv)") {
    val df = Io.readCsv(spark, "/root/reference/test/data/csv-comment.csv",
      Io.ReadOptions(comment = Some('#')))
    assert(df.columns.head == "Geneid") // the '#' preamble did not become the header
    assert(df.filter(col("Geneid").startsWith("#")).count() == 0)
  }

  test("promotional inference: scientific notation and IP strings (fixtures)") {
    // double_parse_test.csv: 1e-284-scale scientific notation must land as
    // float64, exact values preserved
    val dp = Io.readCsvPromotional(spark,
      "/root/reference/test/data/double_parse_test.csv")
    assert(dp.schema("pvalue").dataType == org.apache.spark.sql.types.DoubleType)
    assert(dp.schema("baseMean").dataType == org.apache.spark.sql.types.DoubleType)
    val p3 = dp.filter(col("id") === 3).select("pvalue").collect()(0).getDouble(0)
    assert(p3 == 1.95366082718358e-284)
    // ip-addrs.csv: dotted quads must NOT be coerced to numbers
    val ip = Io.readCsvPromotional(spark, "/root/reference/test/data/ip-addrs.csv")
    assert(ip.schema("ip").dataType == org.apache.spark.sql.types.StringType)
    assert(ip.filter(col("ip") === "10.0.0.1").count() == 1)
  }

  test("native parquet reads the reference's nested/map/decimal/uuid fixtures") {
    val data = "/root/reference/test/data"
    val nested = Io.readParquet(spark, s"$data/nested.parquet")
    assert(nested.count() == 3)
    assert(nested.schema.fields.exists(_.dataType.isInstanceOf[
      org.apache.spark.sql.types.MapType]))
    val dec = Io.readParquet(spark, s"$data/decimaltable.parquet")
    assert(dec.schema.fields.exists(_.dataType ==
      org.apache.spark.sql.types.DecimalType(12, 9)))
    assert(dec.count() == 2)
    assert(Io.readParquet(spark, s"$data/uuid.parquet").count() == 10)
    assert(Io.readParquet(spark, s"$data/2024-03-03.parquet").count() == 1725)
  }

  // ---- reference parse_test.clj parity sweep (round 13) -----------------
  // Each block mirrors one deftest from
  // /root/reference/test/tech/v3/dataset/parse_test.clj against the same
  // fixture files, with :int16/:int32/:string → Short/Integer/String.

  test("ames promotional parity: all 80 dtypes + NA missing counts (base-ames-parser-test)") {
    import org.apache.spark.sql.types._
    val df = Io.readCsvPromotional(spark,
      "/root/reference/test/data/ames-train.csv.gz")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // parse_test.clj:46-130 datatype-answers, verbatim
    val int16 = Seq("1stFlrSF", "2ndFlrSF", "3SsnPorch", "BedroomAbvGr",
      "BsmtFinSF1", "BsmtFinSF2", "BsmtFullBath", "BsmtHalfBath",
      "BsmtUnfSF", "EnclosedPorch", "Fireplaces", "FullBath", "GarageArea",
      "GarageCars", "GarageYrBlt", "GrLivArea", "HalfBath", "Id",
      "KitchenAbvGr", "LotFrontage", "LowQualFinSF", "MSSubClass",
      "MasVnrArea", "MiscVal", "MoSold", "OpenPorchSF", "OverallCond",
      "OverallQual", "PoolArea", "ScreenPorch", "TotRmsAbvGrd",
      "TotalBsmtSF", "WoodDeckSF", "YearBuilt", "YearRemodAdd", "YrSold")
    val int32 = Seq("LotArea", "SalePrice")
    val strs = Seq("Alley", "BldgType", "BsmtCond", "BsmtExposure",
      "BsmtFinType1", "BsmtFinType2", "BsmtQual", "CentralAir",
      "Condition1", "Condition2", "Electrical", "ExterCond", "ExterQual",
      "Exterior1st", "Exterior2nd", "Fence", "FireplaceQu", "Foundation",
      "Functional", "GarageCond", "GarageFinish", "GarageQual",
      "GarageType", "Heating", "HeatingQC", "HouseStyle", "KitchenQual",
      "LandContour", "LandSlope", "LotConfig", "LotShape", "MSZoning",
      "MasVnrType", "MiscFeature", "Neighborhood", "PavedDrive", "PoolQC",
      "RoofMatl", "RoofStyle", "SaleCondition", "SaleType", "Street",
      "Utilities")
    for (c <- int16) assert(types(c) == ShortType, s"$c should be int16, was ${types(c)}")
    for (c <- int32) assert(types(c) == IntegerType, s"$c should be int32, was ${types(c)}")
    for (c <- strs) assert(types(c) == StringType, s"$c should be string, was ${types(c)}")
    // parse_test.clj:23-44 missing-data (NA-as-missing), verbatim
    val missingWant = Map("LotFrontage" -> 259L, "Alley" -> 1369L,
      "MasVnrType" -> 8L, "MasVnrArea" -> 8L, "BsmtQual" -> 37L,
      "BsmtCond" -> 37L, "BsmtExposure" -> 38L, "BsmtFinType1" -> 37L,
      "BsmtFinType2" -> 38L, "Electrical" -> 1L, "FireplaceQu" -> 690L,
      "GarageType" -> 81L, "GarageYrBlt" -> 81L, "GarageFinish" -> 81L,
      "GarageQual" -> 81L, "GarageCond" -> 81L, "PoolQC" -> 1453L,
      "Fence" -> 1179L, "MiscFeature" -> 1406L)
    val n = df.count()
    val missingGot = df.select(missingWant.keys.toSeq.map(c =>
      count(col(c)).as(c)): _*).collect()(0)
    for ((c, want) <- missingWant)
      assert(n - missingGot.getAs[Long](c) == want,
        s"$c missing: got ${n - missingGot.getAs[Long](c)} want $want")
    // n-records + column-whitelist path (base-ames-load-test)
    val limited = Io.readCsv(spark,
      "/root/reference/test/data/ames-train.csv.gz",
      Io.ReadOptions(numRows = Some(100),
        columnAllowlist = Seq("Id", "SalePrice", "YearBuilt")))
    assert(limited.columns.length == 3 && limited.count() == 100)
  }

  test("semicolon-delimited file parses to 3 columns (semi-colon-delimited-file)") {
    val df = Io.readCsv(spark, "/root/reference/test/data/sample01.csv",
      Io.ReadOptions(separator = ";"))
    assert(df.columns.length == 3)
  }

  test("tough file: skip rows + ragged widening gives 5 columns (tough-file)") {
    val df = Io.readCsvRagged(spark, "/root/reference/test/data/essential.csv",
      Io.ReadOptions(skipRows = 1))
    assert(df.columns.length == 5, df.columns.toSeq.toString)
  }

  test("date inference: stocks → date, seattle-temps → timestamp (date-time-format-test-1)") {
    import org.apache.spark.sql.types._
    val stocks = Io.readCsvPromotional(spark,
      "/root/reference/test/data/stocks.csv")
    assert(stocks.schema("date").dataType == DateType)   // "Jan 1 2000"
    assert(stocks.count() == 560)
    assert(stocks.filter(col("date") === to_date(lit("2000-01-01"))).count() > 0)
    val temps = Io.readCsvPromotional(spark,
      "/root/reference/test/data/seattle-temps.csv")
    assert(temps.schema("date").dataType == TimestampType) // zoned
    assert(temps.schema("temp").dataType == DoubleType)
  }

  test("bad dates stay string; relaxed parse recovers good rows (bad-csv-relaxed-1)") {
    import org.apache.spark.sql.types._
    import graft.ops.TableOps._
    val ds = Io.readCsvPromotional(spark,
      "/root/reference/test/data/stocks-bad-date.csv")
    assert(ds.schema("date").dataType == StringType)
    assert(ds.filter(col("date").isin("hello", "1212")).count() == 2)
    val parsed = ds.columnCastRelaxed("date", DateType)
    assert(parsed.schema("date").dataType == DateType)
    assert(parsed.filter(col("date_unparsed")).count() == 2)
    assert(parsed.filter(col("date").isNotNull).count() == ds.count() - 2)
  }

  test("empty header cell → column-0 name (parse-empty-column-name)") {
    val df = Io.readCsvRagged(spark, "/root/reference/test/data/rcsv.csv")
    assert(df.columns.toSet == Set("column-0", "Urban Female", "Urban Male",
      "Rural Female", "Rural Male"))
  }

  test("small doubles parse without flushing to zero (parse-small-doubles)") {
    val df = Io.readCsvPromotional(spark,
      "/root/reference/test/data/double_parse_test.csv")
    assert(df.schema("pvalue").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.filter(col("pvalue") =!= 0.0).count() == 197)
  }

  test("empty csv variants (empty-csv)") {
    val hdr = Io.readCsv(spark, "/root/reference/test/data/empty-csv-header.csv")
    assert(hdr.columns.length == 7)
    assert(hdr.count() == 0)
    val empty = Io.readCsv(spark, "/root/reference/test/data/empty-csv.csv")
    assert(empty.columns.isEmpty && empty.count() == 0)
  }

  test("skip-rows mid-file re-headers (issue-304)") {
    val ds = Io.readCsv(spark, "/root/reference/test/data/issue-292.csv",
      Io.ReadOptions(skipRows = 10))
    assert(ds.select(col("`10`")).first().get(0).toString == "11")
  }

  test("quoted list cells survive intact (pokemon-csv)") {
    val ds = Io.readCsv(spark, "/root/reference/test/data/pokemon.csv")
    assert(ds.select(col("abilities")).first().getString(0) ==
      "['Overgrow', 'Chlorophyll']")
  }

  test("bzip2 csv: reads .csv.bz2 transparently; write round-trips (reference bzip2.clj)") {
    val tmp = Files.createTempDirectory("graft_bz2").toString
    val src = Tables.t(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    Io.write(src, s"$tmp/n_bz2", format = "csv",
      compression = Some("bzip2"))
    val files = new java.io.File(s"$tmp/n_bz2").listFiles()
      .filter(_.getName.endsWith(".csv.bz2"))
    assert(files.nonEmpty, "writer must emit .csv.bz2 part files")
    val back = Io.readCsv(spark, s"$tmp/n_bz2")
    assert(back.count() == src.count())
    assert(back.select(sum(col("n_nationkey"))).first().getLong(0) ==
      src.select(sum(col("n_nationkey"))).first().getLong(0))
    // promotional inference works through the codec too
    val promo = Io.readCsvPromotional(spark, s"$tmp/n_bz2")
    assert(promo.schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.ShortType)
  }

  test("libsvm round-trip exact incl. sparse zero-drop") {
    val tmp = Files.createTempDirectory("graft_svm").toString
    val src = spark.sql("""
      SELECT * FROM VALUES
        (1.0D, ARRAY(0.5D, 0.0D, -2.25D)),
        (0.0D, ARRAY(0.0D, 3.125D, 0.0D)),
        (2.0D, ARRAY(1.0D, 2.0D, 3.0D))
      AS t(label, features)""")
    Io.writeLibsvm(src, s"$tmp/svm")
    val back = Io.readLibsvm(spark, s"$tmp/svm", numFeatures = Some(3))
    assert(back.count() == 3)
    val got = back.collect().map(r => (r.getDouble(0),
      r.getAs[scala.collection.Seq[Double]](1).toSeq)).sortBy(_._1).toSeq
    assert(got == Seq(
      (0.0, Seq(0.0, 3.125, 0.0)),
      (1.0, Seq(0.5, 0.0, -2.25)),
      (2.0, Seq(1.0, 2.0, 3.0))))
  }
}
