package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.EdnIo

/** EDN reader/writer: parser features, mapseq→dataset typing (reference
  * src/tech/v3/dataset/io.clj:74-79,98-105), and write→read round-trips. */
class EdnIoSpec extends SparkSuite {
  init()

  test("parses scalars, collections, comments, discard, tagged literals") {
    val doc = """
      ; a comment
      [{:a 1, :b "x", :c true, :d nil, :e 1.5}
       {:a -2, :b "y\n\"z\"", :c false, :e 2N}
       #_{:a 999}
       {:a 3, :f #inst "2021-03-04T12:34:56Z", :g #uuid "00000000-0000-0000-0000-000000000001"}]
    """
    val forms = EdnIo.parseAll(doc)
    assert(forms.length == 1)
    val rows = forms.head.asInstanceOf[Vector[Map[Any, Any]]]
    assert(rows.length == 3) // #_ discarded
    assert(rows(0)("a") == 1L)
    assert(rows(0)("e") == 1.5)
    assert(rows(1)("b") == "y\n\"z\"")
    assert(rows(1)("e") == 2L) // 2N bigint stays integral
    assert(rows(2)("f").isInstanceOf[java.sql.Timestamp])
    assert(rows(2)("g") == "00000000-0000-0000-0000-000000000001")
  }

  test("keywords, symbols, sets, nested vectors, chars") {
    val forms = EdnIo.parseAll(
      """{:kw :other/name :sym a-symbol :set #{1 2 3} :vec [1 [2 3]] :ch \a :nl \newline}""")
    val m = forms.head.asInstanceOf[Map[Any, Any]]
    assert(m("kw") == "other/name")
    assert(m("sym") == "a-symbol")
    assert(m("set") == Set(1L, 2L, 3L))
    assert(m("vec") == Vector(1L, Vector(2L, 3L)))
    assert(m("ch") == "a")
    assert(m("nl") == "\n")
  }

  test("seq-of-maps document becomes a typed DataFrame") {
    val df = EdnIo.fromEdnString(spark,
      """[{:id 1 :name "a" :score 1.5 :ok true :xs [1 2]}
         {:id 2 :name "b" :ok false}
         {:id 3 :name "c" :score -0.5 :xs [3]}]""")
    assert(df.columns.toSeq == Seq("id", "name", "score", "ok", "xs"))
    assert(df.schema("id").dataType == IntegerType)
    assert(df.schema("score").dataType == DoubleType)
    assert(df.schema("ok").dataType == BooleanType)
    assert(df.schema("xs").dataType == ArrayType(LongType))
    assert(df.count() == 3)
    assert(df.filter(col("id") === 2).first().isNullAt(2)) // absent key → null
  }

  test("#inst column lands as timestamp; mixed columns degrade to string") {
    val df = EdnIo.fromEdnString(spark,
      """[{:t #inst "2020-01-01T00:00:00Z" :m 1}
         {:t #inst "2020-06-01T12:00:00Z" :m "x"}]""")
    assert(df.schema("t").dataType == TimestampType)
    assert(df.schema("m").dataType == StringType)
    assert(df.select(col("t").cast(StringType)).orderBy("t").first().getString(0)
      .startsWith("2020-01-01 00:00:00"))
  }

  test("sign-led symbols and reduced-precision #inst parse per EDN grammar") {
    // '-', '->', '+foo' are symbols, not numbers
    val m = EdnIo.parseAll("""{:op - :arrow -> :plus +foo :neg -12 :pos +12}""")
      .head.asInstanceOf[Map[Any, Any]]
    assert(m("op") == "-")
    assert(m("arrow") == "->")
    assert(m("plus") == "+foo")
    assert(m("neg") == -12L && m("pos") == 12L)
    // Clojure writes reduced-accuracy #inst forms; missing fields pad
    for ((txt, want) <- Seq(
        "2021" -> "2021-01-01T00:00:00Z",
        "2021-03" -> "2021-03-01T00:00:00Z",
        "2021-03-04" -> "2021-03-04T00:00:00Z",
        "2021-03-04T12:30" -> "2021-03-04T12:30:00Z",
        "2021-03-04T12:30:45-05:00" -> "2021-03-04T17:30:45Z")) {
      val got = EdnIo.parseAll(s"""{:t #inst "$txt"}""")
        .head.asInstanceOf[Map[Any, Any]]("t")
        .asInstanceOf[java.sql.Timestamp].toInstant.toString
      assert(got == want, s"#inst $txt -> $got, want $want")
    }
    intercept[IllegalArgumentException] {
      EdnIo.parseAll("""{:t #inst "not-a-date"}""")
    }
  }

  test("gzipped EDN round-trips transparently by extension") {
    val src = Tables.t(spark, sfDir, "region")
    val tmp = Files.createTempDirectory("graft_edngz").toString
    EdnIo.write(src, s"$tmp/region.edn.gz")
    // really gzip on disk (magic bytes), not plain text
    val head = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/region.edn.gz")).take(2)
    assert((head(0) & 0xFF) == 0x1F && (head(1) & 0xFF) == 0x8B)
    val back = EdnIo.read(spark, s"$tmp/region.edn.gz")
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
  }

  test("write -> read round-trips a testdata table") {
    val src = Tables.t(spark, sfDir, "nation")
    val tmp = Files.createTempDirectory("graft_edn").toString
    EdnIo.write(src, s"$tmp/nation.edn")
    val back = EdnIo.read(spark, s"$tmp/nation.edn")
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.count() == src.count())
    val a = src.select(col("n_nationkey").cast(LongType), col("n_name"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = back.select(col("n_nationkey").cast(LongType), col("n_name"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
  }

  test("seeded-random strings survive EDN print -> parse exactly") {
    val rnd = new scala.util.Random(1234)
    // heavy on the characters that must escape: quotes, backslashes,
    // newlines, tabs, unicode, EDN delimiters
    val alphabet = "ab\"\\\n\t\r{}[]()#;:, é0ꯍ".toCharArray
    val strings = (0 until 200).map { _ =>
      val n = rnd.nextInt(30)
      new String(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
    } :+ "" :+ "\\" :+ "\"" :+ ";not a comment" :+ "#_not discarded"
    strings.zipWithIndex.foreach { case (s, i) =>
      val doc = s"""[{:i $i :s ${graft.sources.EdnIo.ednLiteralForTest(s)}}]"""
      val forms = EdnIo.parseAll(doc)
      val m = forms.head.asInstanceOf[Vector[Map[Any, Any]]].head
      assert(m("s") == s, s"string $i mangled: ${s.toList}")
    }
  }

  test("seeded-random numbers survive EDN print -> parse exactly") {
    val rnd = new scala.util.Random(99)
    val doubles = (0 until 200).map(_ =>
      java.lang.Double.longBitsToDouble(rnd.nextLong())).filter(d =>
      !d.isNaN && !d.isInfinite) ++ Seq(0.0, -0.0, 1e-300, -1.7976931348623157e308)
    doubles.foreach { d =>
      val forms = EdnIo.parseAll(s"[{:x ${d.toString}}]")
      val got = forms.head.asInstanceOf[Vector[Map[Any, Any]]].head("x")
      assert(got == d || (got.asInstanceOf[Double].isNaN && d.isNaN),
        s"double $d parsed as $got")
    }
    val longs = (0 until 200).map(_ => rnd.nextLong()) ++
      Seq(Long.MaxValue, Long.MinValue, 0L)
    longs.foreach { l =>
      val got = EdnIo.parseAll(s"[{:x $l}]")
        .head.asInstanceOf[Vector[Map[Any, Any]]].head("x")
      assert(got == l, s"long $l parsed as $got")
    }
  }

  test("write round-trips timestamps, arrays, nulls, odd column names") {
    val src = spark.sql("""
      SELECT * FROM VALUES
        (1, TIMESTAMP'2021-03-04 12:34:56', ARRAY(1.5D, -2.5D), 'plain'),
        (2, CAST(NULL AS TIMESTAMP), ARRAY(0.0D), CAST(NULL AS STRING))
      AS t(id, ts, arr, `weird name`)""")
    val tmp = Files.createTempDirectory("graft_edn2").toString
    EdnIo.write(src, s"$tmp/mixed.edn")
    val back = EdnIo.read(spark, s"$tmp/mixed.edn")
    assert(back.columns.toSet == Set("id", "ts", "arr", "weird name"))
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("arr").dataType == ArrayType(DoubleType))
    val r1 = back.filter(col("id") === 1).collect()(0)
    assert(r1.getAs[java.sql.Timestamp]("ts").toString.startsWith("2021-03-04 12:34:56"))
    assert(r1.getAs[scala.collection.Seq[Double]]("arr").toSeq == Seq(1.5, -2.5))
    assert(r1.getAs[String]("weird name") == "plain")
    val r2 = back.filter(col("id") === 2).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("ts")))
  }
}
