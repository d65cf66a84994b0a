package graft.pipeline

import org.apache.spark.sql.functions._
import graft.testkit.SparkSpec
import graft.functions.JaroWinklerImpl
import graft.functions.JaroWinklerFn.jaroWinkler

/** Edit-distance fuzzy matching: FastSS blocking completeness against
  * brute-force all-pairs (the lossless-blocking claim, on a vocabulary
  * dense enough to exercise every deletion shape), Jaro-Winkler semantics
  * pinned to DuckDB-probed values, and entity-resolution invariants. */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  // Dense short-string vocabulary: every 1- and 2-edit relationship kind
  // (substitution, insertion, deletion, mixed) appears.
  private val vocab = Seq(
    "cat", "cart", "carts", "cast", "cut", "coat", "ct", "c",
    "dog", "dig", "dg", "dodge", "doge",
    "plate", "late", "slate", "plates", "pilate",
    "widget", "wídget", "gadget", "gidget",
    "aa", "ab", "ba", "bb", "abab", "baba",
    "exactlythesame", "exactlythesame2")

  private def bruteForce(maxDist: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      a <- vocab; b <- vocab if a < b
      dist = lev(a, b) if dist <= maxDist
    } yield (a, b, dist)).toSet
  }

  test("FastSS blocking is lossless: fuzzyPairs == brute-force all-pairs (ed<=2)") {
    val names = vocab.toDF("p_name")
    val got = FuzzyMatch.fuzzyPairs(names, col("p_name"), maxDist = 2)
      .as[(String, String, Int)].collect().toSet
    assert(got == bruteForce(2))
  }

  test("fuzzyPairs maxDist=1 subset") {
    val names = vocab.toDF("p_name")
    val got = FuzzyMatch.fuzzyPairs(names, col("p_name"), maxDist = 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == bruteForce(1))
  }

  test("Jaro-Winkler matches the DuckDB-probed pin values") {
    // Values read from duckdb jaro_winkler_similarity (see Scaladoc):
    val pins = Seq(
      ("martha", "marhta", 0.961111),
      ("dixon", "dicksonx", 0.813333),
      ("jellyfish", "smellyfish", 0.896296),
      ("dwayne", "duane", 0.84),
      ("crate", "trace", 0.733333),
      ("abcdxxxxxx", "abcdyyyyyy", 0.6),      // jaro<=0.7: NO prefix boost
      ("ab", "abcdefghijklmn", 0.771429),     // jaro>0.7: boosted
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),                      // window 0: no matches
      ("", "", 0.0),                          // DuckDB: empty -> 0
      ("a", "", 0.0),
      ("c", "c", 1.0),                        // 1-char window clamps at 0
      ("a", "b", 0.0),
      ("a", "ab", 0.85),                      // DuckDB-probed
      ("a", "ba", 0.0))
    pins.foreach { case (a, b, want) =>
      val got = math.round(JaroWinklerImpl.similarity(a, b) * 1e6) / 1e6
      assert(got == want, s"jw($a, $b): $got != $want")
    }
  }

  test("Jaro-Winkler expression evaluates identically interpreted and codegen'd") {
    val df = vocab.flatMap(a => vocab.map(b => (a, b))).toDF("a", "b")
    val viaExpr = df.select(col("a"), col("b"),
        round(jaroWinkler(col("a"), col("b")), 6).as("jw"))
      .as[(String, String, Double)].collect()
    viaExpr.foreach { case (a, b, jw) =>
      val want = math.round(JaroWinklerImpl.similarity(a, b) * 1e6) / 1e6
      assert(jw == want, s"($a, $b): $jw != $want")
    }
    // symmetry
    assert(JaroWinklerImpl.similarity("dwayne", "duane") ==
      JaroWinklerImpl.similarity("duane", "dwayne"))
  }

  test("fuzzyEntities: canon is a cluster member, mapping is exhaustive and consistent") {
    val names = vocab.toDF("p_name")
    val ents = FuzzyMatch.fuzzyEntities(spark, names, col("p_name"))
      .as[(String, String)].collect().toMap
    assert(ents.keySet == vocab.toSet)           // every name assigned
    assert(ents.values.toSet.subsetOf(vocab.toSet)) // canon is a real name
    // pair members share a canon (transitive closure property)
    bruteForce(2).foreach { case (a, b, _) =>
      assert(ents(a) == ents(b), s"$a / $b split across entities")
    }
    // a canon maps to itself
    ents.values.toSet.foreach((c: String) => assert(ents(c) == c))
  }

  test("fuzzyPairsIncremental: batch-vs-standing only, equal to the filtered all-pairs truth") {
    val standing = vocab.filter(_.hashCode % 3 != 0).toDF("p_name")
    val batch = vocab.filter(_.hashCode % 3 == 0).toDF("p_name")
    val got = FuzzyMatch.fuzzyPairsIncremental(standing, batch, col("p_name"))
      .as[(String, String, Int)].collect().toSet
    val sSet = vocab.filter(_.hashCode % 3 != 0).toSet
    val bSet = vocab.filter(_.hashCode % 3 == 0).toSet
    val want = bruteForce(2).flatMap { case (a, b, d) =>
      Seq((a, b, d), (b, a, d))
    }.filter { case (x, y, _) => bSet(x) && sSet(y) }
    assert(got == want)
    // no batch-batch or standing-standing pairs by construction
    assert(got.forall { case (x, y, _) => bSet(x) && sSet(y) })
  }

  test("maxBucket cap drops oversized buckets and reports them") {
    // 'aN' strings all share the deletion variant "a": with maxBucket=2
    // the bucket is dropped and pairs through it disappear.
    val names = Seq("ax", "ay", "az").toDF("p_name")
    val full = FuzzyMatch.fuzzyPairs(names, col("p_name"), maxDist = 2).count()
    assert(full == 3)
    val over = FuzzyMatch.oversizedBuckets(names, col("p_name"),
      maxDist = 2, maxLen = 64, maxBucket = 2)
    assert(over > 0)
  }

  test("deletionNeighborhood edge cases: empty and single-char strings") {
    val df = Seq("", "x", "xy").toDF("s")
      .select(col("s"), FuzzyMatch.deletionNeighborhood(col("s"), 2).as("nb"))
      .as[(String, Seq[String])].collect().toMap
    assert(df("") == Seq(""))
    assert(df("x").toSet == Set("x", ""))
    assert(df("xy").toSet == Set("xy", "x", "y", ""))
  }
}
