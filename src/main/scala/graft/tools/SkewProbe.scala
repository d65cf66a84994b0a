package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-benchmark for the SPJ skew pair (round 12): plain storage-
  * partitioned join (one task per bucket — the hot bucket's row mass on
  * one core) vs partially-clustered distribution (the hot bucket's
  * files become separate tasks, the small dim replicates). Mirrors
  * Bench's `bucket_skew` section so the pair can be probed standalone
  * while sizing the fixture. SKEW_ROWS / SKEW_FILES env override the
  * 10M-row / 8-file defaults. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = sys.env.getOrElse("SKEW_ROWS", "10000000").toLong
    val files = sys.env.getOrElse("SKEW_FILES", "8").toInt
    val hotMod = sys.env.getOrElse("SKEW_HOTMOD", "4").toInt // 1/hotMod hot
    val root = java.nio.file.Files.createTempDirectory("graft_skewprobe_")
      .toFile
    root.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.EdgeListCatalog")
    val fmtName = "graft.sources.EdgeListSource"
    spark.range(rows).selectExpr(
        s"CASE WHEN id % $hotMod = 0 THEN 7L ELSE id % 100000 END AS src",
        "(id * 13) % 1000000 AS dst")
      .repartition(files).write.format(fmtName)
      .option("bucketBy", "src").option("numBuckets", "32")
      .mode("overwrite").save(s"$root/fact_sk")
    spark.range(100000L).selectExpr("id AS src", "id * 2 AS dst")
      .repartition(2).write.format(fmtName)
      .option("bucketBy", "src").option("numBuckets", "32")
      .mode("overwrite").save(s"$root/dim_sk")
    val q = s"SELECT /*+ MERGE(a) */ a.src AS v, count(*) AS n, " +
      s"CAST(sum(a.dst + b.dst) AS BIGINT) AS s " +
      s"FROM graft.`$root/fact_sk` a JOIN graft.`$root/dim_sk` b " +
      "ON a.src = b.src GROUP BY a.src"
    val base = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    val pcKey =
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
    def run(partial: Boolean): Unit = {
      val keys = if (partial) base :+ pcKey else base
      val prior = keys.map(k => k -> spark.conf.getOption(k))
      keys.foreach(spark.conf.set(_, "true"))
      try spark.sql(q).write.format("noop").mode("overwrite").save()
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    run(partial = false); run(partial = true) // warm
    val tPlain = (1 to 3).map(_ => timeIt(run(partial = false))).sorted
    val tPart = (1 to 3).map(_ => timeIt(run(partial = true))).sorted
    println(f"plain_spj       min=${tPlain.head}%.2f med=${tPlain(1)}%.2f max=${tPlain.last}%.2f")
    println(f"part_clustered  min=${tPart.head}%.2f med=${tPart(1)}%.2f max=${tPart.last}%.2f")
    spark.stop()
  }
}
