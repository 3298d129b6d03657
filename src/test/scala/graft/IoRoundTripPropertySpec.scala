package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{EdnIo, XlsxIo}

/** Property round-trips for the text-container writers: seeded random
  * frames (mixed types, nulls, hostile strings) survive write → read with
  * values intact. Types may legitimately NARROW on read (a long column
  * whose values fit int8 reads back as int8), so comparison casts back to
  * the source schema first. */
class IoRoundTripPropertySpec extends SparkSuite {
  init()

  private val rnd = new scala.util.Random(20260813L)

  // escape-hostile alphabet: quotes, backslashes, XML/EDN delimiters,
  // whitespace incl. \r and \t, unicode
  private val alphabet =
    "ab c\"\\\n\t\r<>&{}[]()#;:,é❄0-+".toCharArray

  private def randString(): String = {
    val n = rnd.nextInt(18)
    new String(Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))))
  }

  private def randFrame(nRows: Int): org.apache.spark.sql.DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("l", LongType, true),
      StructField("d", DoubleType, true),
      StructField("s", StringType, true),
      StructField("b", BooleanType, true),
      StructField("dt", DateType, true),
      StructField("ts", TimestampType, true)))
    val rows: Seq[Row] = (0 until nRows).map { i =>
      def maybe[A](v: => A): Any = if (rnd.nextInt(5) == 0) null else v
      Row(
        i.toLong,
        maybe(rnd.nextLong() % 100000L),
        maybe(java.lang.Double.longBitsToDouble(rnd.nextLong())) match {
          case dd: java.lang.Double if dd.isNaN || dd.isInfinite => 0.5
          case other => other
        },
        maybe(randString()),
        maybe(rnd.nextBoolean()),
        maybe(java.sql.Date.valueOf(java.time.LocalDate.of(
          1950 + rnd.nextInt(150), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28)))),
        maybe {
          // micro-precision (Spark's native resolution), bounded before
          // 2070: xlsx serials are doubles, whose ulp at serial≈2^16 days
          // is ~0.3 µs — micros round-trip exactly through ~2079
          val us = math.abs(rnd.nextLong() % 3155760000000000L)
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            us / 1000000L, (us % 1000000L) * 1000L))
        })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def canon(df: org.apache.spark.sql.DataFrame,
                    target: StructType): Seq[String] = {
    val cast = df.select(target.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    // NUL separator (outside the generated alphabet) keeps the row
    // fingerprint injective - adjacent cells cannot concatenate-collide
    cast.collect().map(_.mkString("\u0000")).sorted.toSeq
  }

  test("seeded random frames round-trip xlsx exactly") {
    val tmp = Files.createTempDirectory("graft_prop_xlsx").toString
    for (trial <- 0 until 8) {
      val src = randFrame(1 + rnd.nextInt(40))
      XlsxIo.write(src, s"$tmp/t$trial.xlsx")
      val back = XlsxIo.read(spark, s"$tmp/t$trial.xlsx")
      assert(back.columns.toSeq == src.columns.toSeq, s"trial $trial")
      assert(canon(back, src.schema) == canon(src, src.schema),
        s"xlsx trial $trial values diverged")
    }
  }

  test("seeded random frames round-trip EDN exactly") {
    val tmp = Files.createTempDirectory("graft_prop_edn").toString
    for (trial <- 0 until 8) {
      val src0 = randFrame(1 + rnd.nextInt(40))
      // EDN renders DateType as #inst (midnight UTC) — compare as timestamp
      val src = src0.withColumn("dt",
        col("dt").cast(TimestampType))
      EdnIo.write(src, s"$tmp/t$trial.edn")
      val back = EdnIo.read(spark, s"$tmp/t$trial.edn")
      // nil-valued keys are omitted per map, so column ORDER follows first
      // appearance and an all-null column disappears entirely (the
      // reference's mapseq semantics) — compare the surviving column SET
      val missing = src.columns.toSet -- back.columns.toSet
      missing.foreach { c =>
        assert(src.filter(col(c).isNotNull).count() == 0,
          s"trial $trial: column $c vanished but had values")
      }
      assert(back.columns.toSet.subsetOf(src.columns.toSet), s"trial $trial")
      val kept = StructType(src.schema.fields.filter(f =>
        back.columns.contains(f.name)))
      assert(canon(back, kept) == canon(src.select(
        kept.fieldNames.map(col).toIndexedSeq: _*), kept),
        s"edn trial $trial values diverged")
    }
  }
}
