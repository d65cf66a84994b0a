package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import scala.collection.mutable

/** Property tests for the primitive open-addressing grouper every
  * mr-phase path leans on: arbitrary interleaved insertions (negative
  * keys, duplicate values, hash-adjacent keys) must group exactly like a
  * boxed reference map, through multiple growth/rehash cycles (initial
  * capacity 16 forces them). */
object LongAdjacencyMapProps extends Properties("LongAdjacencyMap") {

  private val pairGen = Gen.zip(
    // narrow key range -> heavy per-key appends; wide -> many keys
    Gen.oneOf(Gen.chooseNum(-8L, 8L), Gen.chooseNum(Long.MinValue, Long.MaxValue)),
    Gen.chooseNum(Long.MinValue, Long.MaxValue))

  property("groups equal a boxed reference, per-key order preserved") =
    forAll(Gen.listOf(pairGen)) { pairs =>
      val m = new LongAdjacencyMap(16)
      val ref = mutable.LinkedHashMap[Long, mutable.Buffer[Long]]()
      pairs.foreach { case (k, v) =>
        m.add(k, v); ref.getOrElseUpdate(k, mutable.Buffer()) += v
      }
      val got = m.groups.map { case (k, arr, len) => k -> arr.take(len).toSeq }.toMap
      got == ref.view.mapValues(_.toSeq).toMap && m.size == ref.size
    }

  property("groupSizes partitions the total insertion count") =
    forAll(Gen.listOf(pairGen)) { pairs =>
      val m = new LongAdjacencyMap(16)
      pairs.foreach { case (k, v) => m.add(k, v) }
      m.groupSizes.map(_._2.toLong).sum == pairs.length.toLong
    }
}
