package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase timing for the fixed-iteration PageRank gate query: where do
  * the ~1.1 s of g_pagerank at sf0.1 actually go (setup vs per
  * iteration vs final materialization)? usage: runMain graft.tools.PrProbe [sfDir]
  */
object PrProbe {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE\t$label\t${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val e = graft.io.Tables.edges(spark, sfDir)
        .select(col("src").cast("long"), col("dst").cast("long"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("persist_e")(e.count())
      val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
      val verts = spark.range(graft.io.Tables.GraphN).toDF("id")
        .join(broadcast(outdeg), Seq("id"), "left")
      var state = t("init_cp")(
        verts.withColumn("pr", when(col("id") === 0, 1.0).otherwise(0.0))
          .localCheckpoint(true))
      val n = graft.io.Tables.GraphN
      val alpha = 0.85
      val oneIv = (1.0 - alpha) / n
      (0 until 3).foreach { iter =>
        val row = t(s"agg_$iter")(state.agg(
          sum("pr"),
          sum(when(col("outdeg").isNull, col("pr")).otherwise(0.0))).head())
        val sumPr = row.getDouble(0); val danglingPr = row.getDouble(1)
        val normalized =
          if (iter == 0) state.withColumn("old_pr", col("pr"))
          else state.withColumn("old_pr", col("pr") / lit(sumPr))
        val contrib = e
          .join(normalized.select(col("id"), (col("old_pr") / col("outdeg")).as("c")),
            e("src") === col("id"))
          .groupBy(e("dst").as("id")).agg(sum("c").as("h"))
        val oneAv = alpha * danglingPr / n.toDouble
        val next = normalized.select("id", "outdeg")
          .join(contrib, Seq("id"), "left")
          .withColumn("pr", coalesce(col("h"), lit(0.0)) * alpha + lit(oneAv + oneIv))
          .select("id", "outdeg", "pr")
        state = t(s"cp_$iter")(next.localCheckpoint(true))
      }
      t("noop")(state.select(col("id"), col("pr").as("rank"))
        .write.format("noop").mode("overwrite").save())
      e.unpersist(true)
    }
    spark.stop()
  }
}
