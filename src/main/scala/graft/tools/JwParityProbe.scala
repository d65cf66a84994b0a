package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.JaroWinklerFn.jaroWinkler

/** Bit-parity probe for the RAW (unrounded) Jaro-Winkler double vs
  * DuckDB's `jaro_winkler_similarity` — the evidence behind dropping the
  * `round(jw, 6)` on the d_fuzzy_jw gate column (VERDICT r8 #2: every
  * `round(double, n)` gate column carries the Spark-HALF_UP vs
  * DuckDB-std::round half-ulp hazard, so a gate should round ONLY when
  * the underlying doubles genuinely differ between engines).
  *
  * An operation-ORDER difference between two implementations is
  * data-independent: if DuckDB computed, say, `(…) * (1.0/3.0)` where we
  * compute `(…) / 3.0`, a large random sample would show ulp diffs on a
  * large fraction of pairs. So bit-equality across a few hundred
  * thousand pairs covering every code path (low-sim, boost-threshold,
  * prefix-bonus, transpositions, equal strings, 1-char strings) is
  * strong evidence the two engines execute the identical FP expression —
  * unlike a boundary hazard, which needs exactly the right datum.
  *
  * Writes (name_a, name_b, jw) parquet for tools/jw_parity.py-style
  * checking:
  * {{{
  *   runMain graft.tools.JwParityProbe /root/testdata/sf0.1 /tmp/jw_parity
  *   # then in DuckDB over the output dir's parquet:
  *   #   SELECT count(*) FILTER (jw <> jaro_winkler_similarity(name_a, name_b)),
  *   #          count(*) FROM read_parquet(...)
  * }}}
  */
object JwParityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/jw_parity")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_name").as("n")).where(col("n").isNotNull).distinct()

    // similar pairs (the high-sim / prefix-bonus / transposition paths):
    // FastSS pairs at maxDist 3 over the full name set
    val close = graft.pipeline.FuzzyMatch
      .fuzzyPairs(names, col("n"), maxDist = 3)
      .select("name_a", "name_b")
    // random pairs (the low-sim path, every window size): 500 sampled
    // names crossed — ~250k pairs
    val sample = names.orderBy(graft.functions.Hashing.hash60(col("n"))).limit(500)
    val rand = sample.select(col("n").as("name_a"))
      .crossJoin(sample.select(col("n").as("name_b")))
    // degenerate shapes: equal strings, single chars, shared prefixes
    import spark.implicits._
    val edge = Seq(
      ("a", "a"), ("a", "b"), ("ab", "ba"), ("abc", "acb"),
      ("martha", "marhta"), ("dwayne", "duane"), ("dixon", "dicksonx"),
      ("prefixmatch", "prefixmatcx"), ("x", "xyzzy"))
      .toDF("name_a", "name_b")

    // the testdata vocabulary is small (64 distinct p_name at sf0.1), so
    // widen coverage with seeded synthetic strings: random×random for
    // the low-sim paths and single-mutation pairs (substitute / delete /
    // adjacent-swap) for the high-sim boost/prefix/transposition paths
    val rng = new scala.util.Random(42)
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789 -"
    def randStr(): String =
      (0 until (1 + rng.nextInt(20))).map(_ => chars(rng.nextInt(chars.length))).mkString
    val synth = (0 until 2000).map(_ => randStr())
    def mutate(s: String): String = rng.nextInt(3) match {
      case 0 => val i = rng.nextInt(s.length)
        s.updated(i, chars(rng.nextInt(chars.length)))
      case 1 => val i = rng.nextInt(s.length)
        s.substring(0, i) + s.substring(i + 1)
      case _ if s.length >= 2 =>
        val i = rng.nextInt(s.length - 1)
        s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
      case _ => s
    }
    val synthMut = synth.map(s => (s, mutate(s))).toDF("name_a", "name_b")
    val synthSample = synth.take(500)
    val synthRand = synthSample.toDF("name_a")
      .crossJoin(synthSample.toDF("name_b"))

    close.unionByName(rand).unionByName(edge)
      .unionByName(synthMut).unionByName(synthRand)
      .withColumn("jw", jaroWinkler(col("name_a"), col("name_b")))
      .write.mode("overwrite").parquet(outDir)
    val n = spark.read.parquet(outDir).count()
    println(s"JW_PARITY_PAIRS $n -> $outDir")
    spark.stop()
  }
}
