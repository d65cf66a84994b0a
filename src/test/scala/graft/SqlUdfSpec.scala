package graft

import graft.testkit.SparkSpec

/** SQL-defined functions (CREATE FUNCTION … RETURN expr, Spark 4) are
  * the user-extension path that stays inside codegen: the analyzer
  * inlines the body into the caller's plan, so — unlike a Scala/Python
  * UDF — nothing opaque survives to block whole-stage codegen,
  * predicate pushdown, or constant folding. q31_sql_udf gates the
  * values; this spec pins the INLINING itself.
  */
class SqlUdfSpec extends SparkSpec {

  test("scalar SQL UDF inlines: no function call survives optimization") {
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION t_cents(p DOUBLE)
                |RETURNS BIGINT RETURN CAST(floor(p * 100 + 0.5) AS BIGINT)""".stripMargin)
    val df = spark.range(3).selectExpr("t_cents(id * 1.5) AS c")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("t_cents"),
      s"SQL UDF must inline, plan still references it:\n$opt")
    assert(opt.contains("FLOOR") || opt.contains("floor"),
      s"inlined body (floor) missing from plan:\n$opt")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 150L, 300L))
  }

  test("nested SQL UDFs inline recursively and fold constants") {
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION t_cents2(p DOUBLE)
                |RETURNS BIGINT RETURN CAST(floor(p * 100 + 0.5) AS BIGINT)""".stripMargin)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION t_net(p DOUBLE, d DOUBLE)
                |RETURNS BIGINT RETURN t_cents2(p) - t_cents2(p * d)""".stripMargin)
    assert(spark.sql("SELECT t_net(10.0, 0.25)").head().getLong(0) == 750L)
    // constant arguments: the whole call folds to a literal
    val opt = spark.sql("SELECT t_net(10.0, 0.25) AS x")
      .queryExecution.optimizedPlan.toString
    assert(opt.contains("750"), s"constant-folded literal missing:\n$opt")
    // on a real column: correct per-row arithmetic
    val out = spark.range(1, 4)
      .selectExpr("t_net(CAST(id AS DOUBLE), 0.5) AS x")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(50L, 100L, 150L))
  }
}
