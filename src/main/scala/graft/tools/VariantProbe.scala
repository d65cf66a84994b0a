package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical probe of the Spark 4.1 VARIANT surface before gating it:
  * which functions exist, what variant_get returns on missing paths,
  * whether VARIANT round-trips through parquet, and what the cast
  * rules are. Run: runMain graft.tools.VariantProbe
  */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("variant-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tryQ(label: String, sql: String): Unit =
      try {
        val r = spark.sql(sql).collect().map(_.toString).mkString(" | ")
        println(s"OK   $label -> $r")
      } catch {
        case e: Throwable =>
          println(s"FAIL $label -> ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}")
      }

    tryQ("parse_json", """SELECT parse_json('{"a":{"b":[1,2,3]},"s":"x"}')::string""")
    tryQ("variant_get int", """SELECT variant_get(parse_json('{"a":{"b":[1,2,3]}}'), '$.a.b[1]', 'int')""")
    tryQ("variant_get missing", """SELECT variant_get(parse_json('{"a":1}'), '$.zz', 'int')""")
    tryQ("try_variant_get wrong type", """SELECT try_variant_get(parse_json('{"a":"str"}'), '$.a', 'int')""")
    tryQ("variant_get no-cast", """SELECT variant_get(parse_json('{"a":{"b":2}}'), '$.a')::string""")
    tryQ("is_variant_null", """SELECT is_variant_null(variant_get(parse_json('{"a":null}'), '$.a'))""")
    tryQ("schema_of_variant", """SELECT schema_of_variant(parse_json('{"a":{"b":[1,2]},"s":"x"}'))""")
    tryQ("schema_of_variant_agg", """SELECT schema_of_variant_agg(parse_json(c)) FROM VALUES ('{"a":1}'), ('{"a":"s","b":2.5}') t(c)""")
    tryQ("try_parse_json bad", """SELECT try_parse_json('{"a":') IS NULL""")
    tryQ("to_json(variant)", """SELECT to_json(parse_json('{"b":1,"a":2}'))""")
    tryQ("variant array explode",
      """SELECT v::int FROM (SELECT explode(cast(variant_get(parse_json('{"xs":[3,1,2]}'), '$.xs') AS ARRAY<VARIANT>)) v)""")

    // collations (Spark 4)
    tryQ("collate eq", "SELECT 'Abc' COLLATE UTF8_LCASE = 'aBC'")
    tryQ("collate groupby",
      """SELECT collate(c, 'UTF8_LCASE') AS k, count(*) AS n
        |FROM VALUES ('Ab'), ('aB'), ('cd') t(c) GROUP BY k ORDER BY n""".stripMargin)
    tryQ("collate min", "SELECT min(collate(c, 'UTF8_LCASE')) FROM VALUES ('b'), ('A') t(c)")
    tryQ("collate trim", "SELECT 'a ' COLLATE UTF8_LCASE_RTRIM = 'A'")

    // parquet round-trip
    try {
      val dir = "/tmp/variant_probe_pq"
      spark.sql("""SELECT id, parse_json(concat('{"k":', id, ',"nested":{"s":"v', id, '"}}')) AS v FROM range(5)""")
        .write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir)
      back.printSchema()
      println("OK   parquet round-trip -> " +
        back.selectExpr("variant_get(v, '$.nested.s', 'string')").collect().mkString(","))
    } catch { case e: Throwable => println(s"FAIL parquet round-trip -> ${e.getMessage.take(300)}") }

    // UNPIVOT + SQL UDF while we're here
    tryQ("unpivot sql",
      """SELECT * FROM (SELECT 1 AS id, 10 AS a, 20 AS b) UNPIVOT (val FOR metric IN (a, b))""")
    try {
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION sq(x INT) RETURNS INT RETURN x * x")
      tryQ("sql udf", "SELECT sq(7)")
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION gm(x DOUBLE, y DOUBLE) RETURNS DOUBLE RETURN sqrt(x*y)")
      tryQ("sql udf 2-arg", "SELECT gm(4.0, 9.0)")
      // table-valued SQL UDF (sequence+explode: foldability-free body)
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION tf(n INT) RETURNS TABLE(x INT) RETURN SELECT explode(sequence(0, n - 1)) AS x")
      tryQ("sql table udf", "SELECT sum(x) FROM tf(5)")
      tryQ("sql table udf lateral correlated",
        """SELECT t.id, u.x FROM (SELECT id FROM range(1, 4)) t,
          |LATERAL tf(CAST(t.id AS INT)) u ORDER BY 1, 2""".stripMargin)
    } catch { case e: Throwable => println(s"FAIL sql udf -> ${e.getMessage.take(300)}") }

    spark.stop()
  }
}
