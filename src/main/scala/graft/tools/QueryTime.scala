package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Median wall time of named SparkEntry queries — the per-operator
  * iteration loop Bench's fixed headline doesn't cover.
  *
  * usage: runMain graft.tools.QueryTime [sfDir] [reps] query [query ...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: QueryTime sfDir reps query [query ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.memoize", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      materialize(graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")) // warm
      val ts = (1 to reps).map { _ =>
        graft.queries.GraphQueries.clearCaches()
        val t0 = System.nanoTime()
        materialize(graft.SparkEntry.queries(name)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.gc()
      println(f"TIME $name median=${ts(reps / 2)}%.3f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
