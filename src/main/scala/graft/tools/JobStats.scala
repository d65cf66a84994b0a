package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query scheduling-overhead census: wall time plus the number of
  * Spark jobs, stages and tasks one execution of a SparkEntry query
  * launches. For iterative algorithms on the (tiny, 401-vertex) derived
  * graph the bench cost is dominated by this fixed machinery rather
  * than data volume, so the optimization loop needs the counts next to
  * the seconds (guide §1: decide whether time goes to compute or to
  * scheduling).
  *
  * usage: runMain graft.tools.JobStats [sfDir] [reps] query [query ...]
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: JobStats sfDir reps query [query ...]")
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
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)

    def materialize(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      try {
        graft.queries.GraphQueries.clearCaches()
        materialize(name) // warm
        System.gc()
        val runs = (1 to reps).map { _ =>
          graft.queries.GraphQueries.clearCaches()
          jobs = 0; stages = 0; tasks = 0
          val t0 = System.nanoTime()
          materialize(name)
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(120) // let listener events drain (bus is private API)
          (wall, jobs, stages, tasks)
        }
        val best = runs.minBy(_._1)
        println(f"STATS\t$name\twall=${best._1}%.3f\tjobs=${best._2}\tstages=${best._3}\ttasks=${best._4}")
      } catch { case e: Throwable =>
        println(s"STATS\t$name\tFAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
