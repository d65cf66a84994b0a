package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, KmvSketch}

/** Stage-timing probe for d_decontam_inc (which first measured ~12 s at
  * sf0.1 while the comparable one-scan d_decontaminate runs ~1 s).
  * Finding: the `shRaw` shape below — `shingles(text, 8)` inlining
  * `tokens(text)` inside the higher-order shingle transform — costs
  * 14.8 s for 236k shingles because the tokenizer re-evaluates per
  * produced array element; materializing `toks` into a column first
  * (TextAnalysis.explodedShingles' shape, now used by the gate query)
  * brings the identical scan to ~1 s. Kept as the regression record:
  * PROBE explode+hash 14.84 s / distinct 12.06 s / kmv3 0.46 s. */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (n=$n)")
    }
    val docs = graft.io.Tables.documents(spark, sfDir)
    val k = 128

    def shRaw: DataFrame = docs.select(col("source"),
        (col("doc_id") % 10 === 0).as("isb"),
        explode(graft.text.TextAnalysis.shingles(col("text"), 8)).as("sh"))
      .select(col("source"), col("isb"), Hashing.hash60(col("sh")).as("h"))

    time("explode+hash count")(shRaw.count())
    time("distinct count")(shRaw.distinct().count())
    val ck = shRaw.distinct().localCheckpoint()
    time("kmv3 groupBy from ckpt") {
      ck.where(col("source") =!= "src0").groupBy("source").agg(
        KmvSketch.kmv(when(!col("isb"), col("h")), k).as("a"),
        KmvSketch.kmv(when(col("isb"), col("h")), k).as("b"),
        KmvSketch.kmv(col("h"), k).as("c")).count()
    }
    time("full gate query") {
      graft.SparkEntry.queries("d_decontam_inc")(spark, sfDir).count()
    }
    spark.stop()
  }
}
