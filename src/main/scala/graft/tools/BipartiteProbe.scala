package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level attribution for g_bipartite (r14): CC label derivation
  * vs the BFS/tail vs the parity aggregation — JobStats only shows the
  * total, and the sum stayed high after the BFS tail landed.
  *
  * usage: runMain graft.tools.BipartiteProbe [sfDir]
  */
object BipartiteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })

    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(100)
      println(f"PHASE $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.3f s  jobs=${jobs - j0}")
      r
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      graft.queries.GraphQueries.clearCaches()
      val edges = graft.io.Tables.edges(spark, sfDir)
      val cc = phase("cc_run") {
        graft.graph.ConnectedComponents.run(spark, edges)
      }
      val out = phase("bipartite") {
        graft.graph.Bipartite.run(spark, edges, cc)
      }
      phase("materialize") {
        out.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
