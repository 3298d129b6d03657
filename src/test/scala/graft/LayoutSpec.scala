package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Unit pins for the physical-layout operators: the Morton kernel's bit
  * arithmetic (the q240 oracle proves engine parity; this pins the MATH
  * on hand-checkable values) and the clustering-stats contract. */
class LayoutSpec extends SparkSuite {
  init()
  import spark.implicits._

  test("zValue16: hand-checked interleavings") {
    val df = Seq((0L, 0L), (3L, 1L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (0xFFFFL, 0xFFFFL)).toDF("x", "y")
    val z = df.select(Layout.zValue16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x bits land at even positions, y at odd
    assert(z(0) == 0L)
    assert(z(1) == 7L, "x=11b→101b, y=1b→10b: 101|010 = 111")
    assert(z(2) == 0x55555555L)
    assert(z(3) == 0xAAAAAAAAL)
    assert(z(4) == 0xFFFFFFFFL)
  }

  test("zValue16: z-order locality beats row-major for 2-D ranges") {
    // all 16×16 cells: the max z-spread inside any 4×4 tile must be far
    // below the row-major spread (which pays 16 per row crossed)
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val z = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue16(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    // one 4×4 tile aligned to the grid: z values must be contiguous 0..15
    val tile = for (x <- 0 until 4; y <- 0 until 4) yield z((x.toLong, y.toLong))
    assert(tile.sorted == (0L until 16L), s"aligned tile must be one z run: ${tile.sorted}")
  }

  test("zorderStats: deterministic, layout-invariant, boxes cover the data") {
    val df = (1 to 500).map(i => (i.toLong % 37, (i % 53).toDouble))
      .toDF("a", "b")
    val s1 = Layout.zorderStats(df, "a", "b", 16).collect()
    val s2 = Layout.zorderStats(df.repartition(7), "a", "b", 16).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq,
      "bucket stats must not depend on input layout")
    assert(s1.map(_.getAs[Long]("n")).sum == 500L)
    s1.foreach { r =>
      assert(r.getAs[Long]("x_min") <= r.getAs[Long]("x_max"))
      assert(r.getAs[Long]("y_min") <= r.getAs[Long]("y_max"))
    }
  }
}
