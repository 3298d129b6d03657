package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Dtypes
import graft.sources.{ArrowIo, Snapshot, TransitIo}

/** Logical dtype tags (:keyword/:symbol/:uuid — reference
  * io/column_parsers.clj) must survive every metadata-capable sink:
  * Snapshot (EDN :spark-meta), Arrow IPC (custom field metadata), and
  * Transit (the column's :datatype keyword). */
class DtypesSpec extends SparkSuite {
  init()
  import spark.implicits._

  private def tagged() = {
    val df = Seq(
      (1L, "alpha", "ns/sym", "123E4567-e89b-12d3-A456-426614174000"),
      (2L, ":beta", "x", "00000000-0000-0000-0000-000000000000"),
      (3L, "gamma", "y", "not-a-uuid"))
      .toDF("id", "kw", "sym", "u")
    val p1 = Dtypes.parseTagged(df, "kw", "keyword")
    val p2 = Dtypes.parseTagged(p1, "sym", "symbol")
    Dtypes.parseTagged(p2, "u", "uuid")
  }

  test("normalize: keyword colon, symbol whitespace, uuid case + failure") {
    val rows = tagged().orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq(":alpha", ":beta", ":gamma"))
    assert(rows.map(_.getString(2)).toSeq == Seq("ns/sym", "x", "y"))
    assert(rows(0).getString(3) == "123e4567-e89b-12d3-a456-426614174000")
    assert(rows(2).isNullAt(3), "invalid uuid must become missing")
    Seq("kw" -> "keyword", "sym" -> "symbol", "u" -> "uuid").foreach {
      case (c, t) => assert(Dtypes.tagOf(tagged().schema, c).contains(t))
    }
  }

  test("dtype tags survive Snapshot, Arrow IPC, and Transit round-trips") {
    val src = tagged()
    val tmp = java.nio.file.Files.createTempDirectory("graft_dtypes").toString

    Snapshot.write(src, s"$tmp/snap.edn", "tags")
    val snap = Snapshot.read(spark, s"$tmp/snap.edn")

    ArrowIo.write(src, s"$tmp/arrow")
    val arrow = ArrowIo.read(spark, s"$tmp/arrow")

    val transit = TransitIo.transitStrToDataset(spark,
      TransitIo.datasetToTransitStr(src, "tags"))

    for ((name, back) <- Seq("snapshot" -> snap, "arrow" -> arrow,
        "transit" -> transit)) {
      Seq("kw" -> "keyword", "sym" -> "symbol", "u" -> "uuid").foreach {
        case (c, t) =>
          assert(Dtypes.tagOf(back.schema, c).contains(t),
            s"$name lost tag $t on $c: ${back.schema(c).metadata}")
      }
      val got = back.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3))).toSeq
      val want = src.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3))).toSeq
      assert(got == want, s"$name value drift")
    }
  }

  test("arrow dict-encoded columns keep their tag") {
    val src = tagged()
    val tmp = java.nio.file.Files.createTempDirectory("graft_dtypes2").toString
    ArrowIo.write(src, s"$tmp/arrow", dictColumns = Seq("kw"))
    val back = ArrowIo.read(spark, s"$tmp/arrow")
    assert(Dtypes.tagOf(back.schema, "kw").contains("keyword"))
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq(":alpha", ":beta", ":gamma"))
  }
}
