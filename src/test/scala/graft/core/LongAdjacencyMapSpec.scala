package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The primitive grouper must agree with a boxed reference grouping on
  * randomized workloads — including keys that collide modulo the table
  * size, forced rehashes, and per-key value order. */
class LongAdjacencyMapSpec extends AnyFunSuite {

  test("matches a reference HashMap grouping across seeds and sizes") {
    for (seed <- Seq(1, 7, 42); n <- Seq(0, 1, 1000, 50000)) {
      val rnd = new scala.util.Random(seed)
      val m = new LongAdjacencyMap(16) // tiny initial capacity → many rehashes
      val ref = scala.collection.mutable.Map[Long, Vector[Long]]()
      (0 until n).foreach { _ =>
        // narrow key space → deep per-key lists; occasional negatives
        val k = rnd.nextInt(math.max(n / 10, 1)).toLong - 5
        val v = rnd.nextLong()
        m.add(k, v)
        ref(k) = ref.getOrElse(k, Vector.empty) :+ v
      }
      assert(m.size == ref.size)
      val sizes = m.groupSizes.toMap
      assert(sizes == ref.map { case (k, vs) => k -> vs.length }.toMap)
      val groups = m.groups.map { case (k, arr, len) => k -> arr.take(len).toVector }.toMap
      assert(groups == ref.toMap, s"seed=$seed n=$n")
    }
  }

  test("values preserve insertion order within a key") {
    val m = new LongAdjacencyMap()
    (1L to 10L).foreach(v => m.add(99L, v))
    val (_, arr, len) = m.groups.next()
    assert(arr.take(len).toSeq == (1L to 10L))
  }
}
