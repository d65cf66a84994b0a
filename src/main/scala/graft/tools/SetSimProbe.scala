package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.text.TextAnalysis

/** Stage-attribution probe for setSimilarityJoin (prefix-filter
  * τ-Jaccard): times each prefix of the chain so a slow end-to-end
  * number can be blamed on a stage, not guessed at.
  *
  * usage: runMain graft.tools.SetSimProbe [sfDir] [tau]
  */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = TextAnalysis.explodedShingles(docs, col("doc_id"), col("text"), 3)
      .select(col("doc_id"), Hashing.hash60(col("sh")).as("h"))
      .distinct()
    t("sh")(sh.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    t("dfreq")(dfreq.count())
    val prefix = sh.join(dfreq, "h")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("h"))))
      .join(sizes, "doc_id")
      .where(col("rn") <= col("nsh") - ceil(lit(tau) * col("nsh")) + 1)
      .select(col("doc_id"), col("h"))
    t("prefix")(prefix.count())
    val cand = prefix.select(col("h"), col("doc_id").as("a"))
      .join(prefix.select(col("h"), col("doc_id").as("b")), Seq("h"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    val nc = t("cand")(cand.count())
    println(s"candidates: $nc")
    val inter = cand
      .join(sh.select(col("doc_id").as("a"), col("h")), "a")
      .join(sh.select(col("doc_id").as("b"), col("h")), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("ninter"))
    t("inter")(inter.count())
    val full = graft.pipeline.Dedup.setSimilarityJoin(
      docs, col("doc_id"), col("text"), tau)
    t("full")(full.count())
    t("full2")(graft.pipeline.Dedup.setSimilarityJoin(
      docs, col("doc_id"), col("text"), tau).count())
    spark.stop()
  }
}
