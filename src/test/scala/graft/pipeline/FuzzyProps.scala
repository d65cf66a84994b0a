package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{DeletionNeighborhoodImpl, JaroWinklerImpl}

/** ScalaCheck properties for the fuzzy-match primitives (pure JVM — the
  * same static helpers the codegen'd expressions call).
  *
  * The FastSS theorem the whole family rides on: strings within
  * Levenshtein distance k share a member of their ≤k-deletion
  * neighborhoods. A small alphabet maximizes collision density, so
  * these runs exercise every edit shape brute force can reach. */
object FuzzyProps extends Properties("FuzzyMatch") {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def nbhd(s: String, k: Int): Set[String] = {
    val arr = DeletionNeighborhoodImpl.variants(UTF8String.fromString(s), k)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString).toSet
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)

  property("FastSS blocking is complete for ed<=k (k in 1..3)") =
    forAll(wordGen, wordGen, Gen.chooseNum(1, 3)) { (a, b, k) =>
      lev(a, b) > k || nbhd(a, k).intersect(nbhd(b, k)).nonEmpty
    }

  property("neighborhood members are within deletion distance k of s") =
    forAll(wordGen, Gen.chooseNum(1, 3)) { (s, k) =>
      nbhd(s, k).forall(v => v.length >= s.length - k && lev(s, v) <= k)
    }

  property("neighborhood contains s and grows monotonically in k") =
    forAll(wordGen) { s =>
      val n1 = nbhd(s, 1); val n2 = nbhd(s, 2); val n3 = nbhd(s, 3)
      n1.contains(s) && n1.subsetOf(n2) && n2.subsetOf(n3)
    }

  property("Jaro-Winkler is symmetric and in [0,1]") =
    forAll(wordGen, wordGen) { (a, b) =>
      val j = JaroWinklerImpl.similarity(a, b)
      j >= 0.0 && j <= 1.0 && j == JaroWinklerImpl.similarity(b, a)
    }

  property("Jaro-Winkler: 1.0 iff equal non-empty, 0 on empty") =
    forAll(wordGen, wordGen) { (a, b) =>
      val j = JaroWinklerImpl.similarity(a, b)
      if (a.isEmpty || b.isEmpty) j == 0.0
      else if (a == b) j == 1.0
      else j < 1.0
    }
}
