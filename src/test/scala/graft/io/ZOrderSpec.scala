package graft.io

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("z-value interleaves bits (hand-checked Morton codes)") {
    val d = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
    val got = d.select(col("x"), col("y"),
        ZOrder.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bit b of x -> position 2b; bit b of y -> position 2b+1
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    // x=5 (101), y=3 (011): x bits at even positions {0,4}, y bits at
    // odd positions {1,3} -> 1 + 2 + 8 + 16 = 27 (binary 011011)
    assert(got((5L, 3L)) == java.lang.Long.parseLong("011011", 2))
  }

  test("z-layout bounds BOTH dimensions per partition; single-key sort only one") {
    // a 64x64 grid: every (x, y) pair once
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))

    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.rdd.mapPartitionsWithIndex { (i, it) =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (rows.isEmpty) Iterator.empty
        else Iterator.single(
          (rows.map(_._1).max - rows.map(_._1).min,
           rows.map(_._2).max - rows.map(_._2).min))
      }.collect().toSeq

    val zSpans = spans(ZOrder.layoutBy(grid, Seq(col("x"), col("y")), 6, 16))
    val xSpans = spans(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))

    // z-curve: each of the 16 partitions covers a ~16x16 tile => both
    // spans small. x-sort: x-span small but y-span is the full 0..63.
    assert(zSpans.nonEmpty && zSpans.forall { case (sx, sy) => sx <= 31 && sy <= 31 },
      s"z-layout partition spans too wide: $zSpans")
    assert(xSpans.exists { case (_, sy) => sy >= 63 },
      "x-sort control should leave y unclustered")
  }
}
