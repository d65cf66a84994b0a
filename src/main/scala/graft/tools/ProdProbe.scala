package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measures the windowed-`product` determinism the e_survival gate
  * depends on. At 4 factors both engines multiply in frame order —
  * bit-identical on factors chosen so any reassociation differs in the
  * last ulps:
  *
  *   spark:  0x1.5555555555556p-1  0x1.e79e79e79e7ap-2
  *           0x1.bb4a4046ed291p-2  0x1.10cb3b3f56de3p-2
  *   duckdb: identical
  *
  * But at gate size the parity BREAKS: DuckDB's windowed aggregate
  * reassociates inside its segment tree once frames grow (measured on
  * the sf0.01 survival curve: 96 of ~200 rows differ, max abs diff
  * 3.3e-16 — pure last-ulp reassociation noise). Each Kaplan-Meier
  * factor is still one correctly-rounded IEEE division of exact longs,
  * so the divergence is bounded by ulp-per-factor; the gate therefore
  * rounds surv to 9 decimals (the g_pagerank iterative-float
  * convention) instead of hashing raw bits.
  */
object ProdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val f = Seq((1, 1.0 - 1.0 / 3.0), (2, 1.0 - 2.0 / 7.0),
      (3, 1.0 - 1.0 / 11.0), (4, 1.0 - 5.0 / 13.0)).toDF("t", "x")
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    f.withColumn("s", product(col("x")).over(w)).orderBy("t")
      .collect().foreach(r => println(r.getInt(0) + " " +
        java.lang.Double.toHexString(r.getDouble(2))))
    spark.stop()
  }
}
