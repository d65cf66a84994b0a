package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Where does d_cdc's time go? Times the pipeline's prefixes at the
  * bench sf: (1) tokens+flags only (the per-token w-gram hash60 in
  * array land), (2) + token-level posexplode, (3) + window cumsum,
  * (4) full query. Pins whether a chunk-in-array-land rewrite (no
  * token explode, no window) is worth building.
  *
  * usage: runMain graft.tools.CdcProbe [sfDir]
  */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis
    import graft.functions.Hashing

    val w = 4; val div = 16
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
    def flagged = toks.select(col("doc_id"),
      transform(col("tk"), (t, i) => struct(
        t.as("tok"),
        when(i >= w - 1,
          when(Hashing.hash60(array_join(
            slice(col("tk"), i - (w - 2), lit(w)), " ")) % div === 0, 1L)
            .otherwise(0L))
          .otherwise(0L).as("b"))).as("zipped"))
    def rows = flagged
      .select(col("doc_id"), posexplode(col("zipped")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col.tok").as("tok"), col("col.b").as("b"))
    val cum = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    def cumd = rows.withColumn("cidx", coalesce(sum(col("b")).over(cum), lit(0L)))
    def full = graft.pipeline.Dedup.cdcChunkStats(docs, col("doc_id"), col("text"))

    def time(tag: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"CDC $tag median=${ts(1)}%.3f s")
    }
    time("1_flags", flagged)
    time("2_explode", rows)
    time("3_window", cumd)
    time("4_full", full)
    spark.stop()
  }
}
