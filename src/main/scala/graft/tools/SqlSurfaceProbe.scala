package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical probe for SQL-surface gates: does this Spark build run
  * `WITH RECURSIVE` (4.0+) and correlated `LATERAL` derived tables with
  * ORDER BY/LIMIT, and with what semantics (UNION vs UNION ALL in the
  * recursion)? Pins the exact dialect the q27/q28 gates may use.
  *
  * usage: runMain graft.tools.SqlSurfaceProbe [sfDir]
  */
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.io.Tables.edges(spark, sfDir).createOrReplaceTempView("pe")
    spark.read.parquet(s"$sfDir/nation.parquet").createOrReplaceTempView("nation")
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("orders")
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("customer")

    def tryQ(tag: String, sql: String): Unit =
      try {
        val rows = spark.sql(sql).collect()
        println(s"== $tag OK: ${rows.length} rows; sample: ${rows.take(3).mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"== $tag FAIL: ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }

    tryQ("recursive UNION ALL bounded",
      """WITH RECURSIVE reach(v, hops) AS (
        |  SELECT CAST(0 AS BIGINT) AS v, 0 AS hops
        |  UNION ALL
        |  SELECT e.dst, r.hops + 1 FROM reach r JOIN pe e ON e.src = r.v
        |  WHERE r.hops < 2)
        |SELECT v, CAST(min(hops) AS BIGINT) AS hops FROM reach GROUP BY v""".stripMargin)

    tryQ("recursive UNION distinct",
      """WITH RECURSIVE reach(v) AS (
        |  SELECT CAST(0 AS BIGINT) AS v
        |  UNION
        |  SELECT e.dst FROM reach r JOIN pe e ON e.src = r.v)
        |SELECT count(*) AS n FROM reach""".stripMargin)

    tryQ("lateral orderby-limit",
      """SELECT n.n_name, t.o_orderkey, t.o_totalprice
        |FROM nation n,
        |LATERAL (SELECT o.o_orderkey, o.o_totalprice
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 3) t""".stripMargin)

    tryQ("lateral aggregate",
      """SELECT n.n_name, t.n_orders, t.total
        |FROM nation n,
        |LATERAL (SELECT count(*) AS n_orders, sum(o.o_totalprice) AS total
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey) t""".stripMargin)
    spark.stop()
  }
}
