package graft.plans

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("matches the window row_number formulation exactly") {
    val custom = TopKPerKey.topKPerKey(li,
      Seq(col("l_suppkey")),
      Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
      k = 2)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = li
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    assert(custom.except(windowed).isEmpty && windowed.except(custom).isEmpty)
    assert(custom.count() == windowed.count())
  }

  test("physical plan has partial and final nodes with one exchange between") {
    val df = TopKPerKey.topKPerKey(li, Seq(col("l_suppkey")),
      Seq(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber")), 3)
    df.write.format("noop").mode("overwrite").save() // force final plan (AQE)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).length == 2, plan) // partial + final
    assert(plan.contains("Exchange hashpartitioning(l_suppkey"), plan)
  }

  test("cap smaller than the key count still matches the window formulation") {
    spark.conf.set(TopKStrategy.MaxPartialKeysConf, "16")
    try {
      val custom = TopKPerKey.topKPerKey(li,
        Seq(col("l_suppkey")),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 2)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val windowed = li
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      assert(custom.except(windowed).isEmpty && windowed.except(custom).isEmpty)
      assert(custom.count() == windowed.count())
    } finally spark.conf.unset(TopKStrategy.MaxPartialKeysConf)
  }

  test("1M distinct keys under a 1k partial cap complete without OOM") {
    spark.conf.set(TopKStrategy.MaxPartialKeysConf, "1000")
    try {
      val df = spark.range(2000000L).select(
        (col("id") % 1000000L).as("k"),
        expr("id div 1000000").as("v"))
      val got = TopKPerKey.topKPerKey(df, Seq(col("k")), Seq(col("v").desc), 1)
      assert(got.count() == 1000000L)
      assert(got.where(col("v") =!= 1L).count() == 0) // each key kept its max
    } finally spark.conf.unset(TopKStrategy.MaxPartialKeysConf)
  }

  test("k larger than group size returns whole groups") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopKPerKey.topKPerKey(df, Seq(col("k")), Seq(col("v").desc), 5)
      .as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (1, 20), (2, 5)))
  }
}
