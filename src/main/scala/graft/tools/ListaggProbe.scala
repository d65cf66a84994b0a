package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical probe: does Spark 4.1.2 support listagg / string_agg, and
  * with what ordering surface? (WITHIN GROUP ORDER BY, DISTINCT).
  * Throwaway — pins the surface before gate code is written. */
object ListaggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT * FROM VALUES (1,'b'),(1,'a'),(2,'c') t(k, v)")
      .createOrReplaceTempView("t")
    def tryQ(name: String, q: String): Unit =
      try {
        val r = spark.sql(q).collect().mkString(";")
        println(s"OK    $name -> $r")
      } catch { case e: Throwable =>
        println(s"FAIL  $name -> ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}")
      }
    tryQ("listagg plain", "SELECT k, listagg(v) FROM t GROUP BY k ORDER BY k")
    tryQ("listagg delim", "SELECT k, listagg(v, ',') FROM t GROUP BY k ORDER BY k")
    tryQ("listagg within group",
      "SELECT k, listagg(v, ',') WITHIN GROUP (ORDER BY v) FROM t GROUP BY k ORDER BY k")
    tryQ("listagg within group desc",
      "SELECT k, listagg(v, ',') WITHIN GROUP (ORDER BY v DESC) FROM t GROUP BY k ORDER BY k")
    tryQ("listagg distinct",
      "SELECT k, listagg(DISTINCT v, ',') WITHIN GROUP (ORDER BY v) FROM t GROUP BY k ORDER BY k")
    tryQ("string_agg", "SELECT k, string_agg(v, ',') FROM t GROUP BY k ORDER BY k")
    tryQ("mode", "SELECT k, mode(v) FROM t GROUP BY k ORDER BY k")
    tryQ("median", "SELECT k, median(length(v)) FROM t GROUP BY k ORDER BY k")
    tryQ("percentile_cont",
      "SELECT k, percentile_cont(0.5) WITHIN GROUP (ORDER BY length(v)) FROM t GROUP BY k ORDER BY k")
    spark.stop()
  }
}
