package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prefix timing of the d_minhash_pairs chain (CdcProbe pattern). */
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROBE $tag%-14s median=${ts(1)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    import graft.pipeline.Dedup
    time("shingles") {
      graft.text.TextAnalysis.explodedShingles(docs, col("doc_id"), col("text"), 3)
        .select(col("doc_id"), (graft.functions.Hashing.hash60(col("sh")) % Dedup.MinHashP).as("x"))
    }
    time("signatures") { Dedup.minHashSignatures(docs, col("doc_id"), col("text")) }
    time("bands") { Dedup.lshBands(Dedup.minHashSignatures(docs, col("doc_id"), col("text"))) }
    time("pairs") { Dedup.minHashCandidates(docs, col("doc_id"), col("text")) }
    spark.stop()
  }
}
