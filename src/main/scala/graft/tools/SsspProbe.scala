package graft.tools

import org.apache.spark.sql.SparkSession
import graft.io.Tables

/** Dev probe: wall-time g_sssp / g_pagerank back-to-back on one JVM to
  * separate real per-round cost from host noise. Not a gate. */
object SsspProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.graft.memoize", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-12s median ${ts.sorted.apply(2)}%.3f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val edges = Tables.edges(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    noop(graft.graph.ShortestPaths.run(spark, edges, 0L))
    time("g_sssp") { noop(graft.graph.ShortestPaths.run(spark, edges, 0L)) }
    time("g_pagerank") { noop(graft.queries.GraphQueries.queries("g_pagerank")(spark, dir)) }
    spark.stop()
  }
}
