package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Prefix timing of the IVF-PQ stages at bench scale — which of the
  * quantize / encode / LUT / score stages owns the wall time.
  * usage: runMain graft.tools.IvfPqProbe [sfDir]
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.cache().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    val cents = Similarity.ivfCentroids(emb)
    time("cents")(cents.count())
    val lists = Similarity.ivfAssign(emb, cents)
    time("assign")(lists.count())
    time("assign2")(Similarity.ivfAssign(emb, cents).count())
    val resid = emb.join(lists, "vec_id").join(broadcast(cents), "cid")
      .select(col("vec_id"), col("cid"), col("embedding"))
    time("resid")(resid.count())
    val cb = Similarity.pqCodebook(resid, 64)
    time("codebook")(cb.count())
    val codes = Similarity.pqEncode(resid, cb, 64)
    time("encode")(codes.count())
    time("full")(Similarity.ivfPqTopK(emb, 64, 3).count())
    time("full2")(Similarity.ivfPqTopK(emb, 64, 3).count())
    spark.stop()
  }
}
