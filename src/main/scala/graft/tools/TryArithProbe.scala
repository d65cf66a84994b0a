package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution probe for q39_try_arith's ~4 s: which of the four try_*
  * columns carries the cost (hypothesis: the deliberately-overflowing
  * rows pay a caught ArithmeticException each — feature cost, not plan
  * waste). usage: runMain graft.tools.TryArithProbe [sfDir]
  */
object TryArithProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.io.Tables.registerViews(spark, sfDir)
    def t(label: String, sql: String): Unit = {
      val df = spark.sql(sql)
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => df.write.format("noop").mode("overwrite").save())
      println(f"PROBE $label%-12s ${(System.nanoTime() - t0) / 3e9}%.2f s/rep")
    }
    t("baseline", "SELECT o_orderkey FROM orders")
    t("divide", "SELECT try_divide(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey % 3) AS c FROM orders")
    t("add_ovf", "SELECT try_add(9223372036854775807, o_orderkey % 2) AS c FROM orders")
    t("mul_ovf", "SELECT try_multiply(o_orderkey, 4611686018427387904L) AS c FROM orders")
    t("element_at", "SELECT try_element_at(array('a','b'), CAST(o_orderkey % 4 + 1 AS INT)) AS c FROM orders")
    spark.stop()
  }
}
