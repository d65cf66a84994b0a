package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Why is the auto-rewritten interval join slower than the manual
  * bin join? Print both executed plans and time the pieces. */
object RangeJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$tag%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val manual = graft.SparkEntry.queries("e_interval_join")(spark, sfDir)
    val auto = graft.SparkEntry.queries("e_interval_join_auto")(spark, sfDir)
    // warm + timed
    time("manual-w")(manual.count()); time("manual")(manual.count())
    time("auto-w")(auto.count()); time("auto")(auto.count())
    println("=== MANUAL PLAN ===")
    println(manual.queryExecution.executedPlan.toString.take(6000))
    println("=== AUTO PLAN ===")
    println(auto.queryExecution.executedPlan.toString.take(6000))
  }
}
