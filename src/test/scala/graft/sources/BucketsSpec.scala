package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** BucketHash is an ON-DISK CONTRACT: committed files carry `-b<k>`
  * tags computed with it, so any change to the function silently
  * orphans every existing bucketed table (reads would degrade — safe —
  * but the paid layout would be lost, and a mixed-version writer would
  * corrupt co-location). These golden values pin it. */
class BucketsSpec extends AnyFunSuite {

  test("golden values: the hash is frozen") {
    // computed once at introduction (round 11); these must NEVER change
    val expected = Seq(
      0L -> 0, 1L -> 4, 2L -> 7, 3L -> 6, 42L -> 4, 100L -> 2,
      999999937L -> 3, Long.MaxValue -> 2, -1L -> 1, Long.MinValue -> 3)
    expected.foreach { case (k, b) =>
      assert(BucketHash.bucket(k, 8) === b, s"bucket($k, 8)")
    }
    assert(BucketHash.bucket(123456789L, 32) === 6)
    assert(BucketHash.bucket(123456789L, 1) === 0)
  }

  test("sequential keys spread uniformly (the raw-modulo failure mode)") {
    val n = 32
    val counts = new Array[Int](n)
    (0L until 100000L).foreach(k => counts(BucketHash.bucket(k, n)) += 1)
    val mean = 100000.0 / n
    counts.zipWithIndex.foreach { case (c, b) =>
      assert(math.abs(c - mean) < mean * 0.05,
        s"bucket $b holds $c of ~$mean — sequential ids are aliasing")
    }
    // arithmetic progressions (stride = bucket count, the worst case
    // for id % n) spread too
    val strided = new Array[Int](n)
    (0L until 32000L by 32L).foreach(k => strided(BucketHash.bucket(k, n)) += 1)
    assert(strided.max < 1000 * 0.2, // 1000 keys; raw modulo puts ALL in one
      s"strided keys collapsed: max bucket ${strided.max}")
  }

  test("golden values: the compound GRID cell is frozen") {
    // computed once at introduction (round 13); these must NEVER change
    // — compound file tags are cells of the n×n grid
    val expected = Seq(
      (0L, 0L) -> (0, 0), (1L, 2L) -> (39, 3), (2L, 1L) -> (60, 12),
      (42L, -1L) -> (33, 1),
      (Long.MaxValue, Long.MinValue) -> (19, 11),
      (100L, 3L) -> (22, 10))
    expected.foreach { case ((k1, k2), (c8, c4)) =>
      assert(BucketHash.cell(k1, k2, 8) === c8, s"cell($k1, $k2, 8)")
      assert(BucketHash.cell(k1, k2, 4) === c4, s"cell($k1, $k2, 4)")
    }
    // the cell IS the pair: row = bucket(k1), column = bucket(k2) —
    // the partition-key contract of the two reported transforms
    (0L until 200L).foreach { k =>
      val c = BucketHash.cell(k, k * 13 + 1, 8)
      assert(c / 8 === BucketHash.bucket(k, 8))
      assert(c % 8 === BucketHash.bucket(k * 13 + 1, 8))
    }
  }

  test("negative keys land in range and BoundBucket agrees with the writer") {
    Seq(-1L, Long.MinValue, -999999L).foreach { k =>
      val b = BucketHash.bucket(k, 8)
      assert(b >= 0 && b < 8)
    }
    // the V2 function the catalog serves IS the writer's hash
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](8, 42L))
    assert(BoundBucket.produceResult(row).intValue === BucketHash.bucket(42L, 8))
  }
}
