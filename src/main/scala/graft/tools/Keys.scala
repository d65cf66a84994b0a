package graft.tools
object Keys {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(k => println("KEY " + k))
    println("TOTAL " + graft.SparkEntry.queries.size +
      " ORACLES " + graft.SparkEntry.oracleSql.size)
    spark.stop()
  }
}
