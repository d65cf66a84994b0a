package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what FuzzyJoinRewrite buys: the same
  * `JOIN ON levenshtein(a,b) <= 2` over N synthetic catalog names,
  * planned as Spark's broadcast nested loop (rule off) vs the FastSS
  * blocked join (rule on). Names are seeded word pairs off the portable
  * hash, ~10% constructed as 1-edit variants so the join has real hits.
  *
  * usage: runMain graft.tools.FuzzyJoinProbe [n] [reps]
  */
object FuzzyJoinProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Realistic catalog shape: high-entropy 10-char base names (md5 of
    // the id — pairwise edit distance is essentially always > 2), with
    // every 10th row a PLANTED 1-edit variant of its neighbor (drop one
    // char) so the join has ~n/10 true hits, not a quadratic blow-up.
    def base(idc: org.apache.spark.sql.Column) =
      substring(md5(idc.cast("string")), 1, 10)
    val names = spark.range(n).select(
      when(col("id") % 10 === 0,
        concat(substring(base(col("id") - 1), 1, 4),
          substring(base(col("id") - 1), 6, 5)))
        .otherwise(base(col("id")))
        .as("n"))
      .distinct()
    names.cache(); val cnt = names.count()

    def time(enabled: Boolean): (Double, Long) = {
      val s2 = spark.newSession()
      s2.conf.set(graft.plans.FuzzyJoinRewrite.ConfKey, enabled.toString)
      names.createOrReplaceTempView("probe_names_parent")
      // rebuild against the child session so its optimizer runs
      val df = {
        import s2.implicits._
        val local = names.as[String].collect().toSeq.toDF("n")
        local.createOrReplaceTempView("probe_names")
        s2.sql("""SELECT count(*) AS c FROM (
          |SELECT a.n, b.n FROM probe_names a JOIN probe_names b
          |  ON a.n < b.n AND levenshtein(a.n, b.n) <= 2)""".stripMargin)
      }
      var rows = 0L
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => rows = df.collect().head.getLong(0))
      (((System.nanoTime() - t0) / 1e9) / reps, rows)
    }

    val (tOn, rOn) = time(enabled = true)
    val (tOff, rOff) = time(enabled = false)
    require(rOn == rOff, s"MISMATCH: $rOn vs $rOff")
    println(f"""{"probe":"fuzzy_join","n":$cnt,"pairs":$rOn,"nested_loop_sec":$tOff%.2f,"rewrite_sec":$tOn%.2f,"speedup":${tOff / tOn}%.1f}""")
    spark.stop()
  }
}
