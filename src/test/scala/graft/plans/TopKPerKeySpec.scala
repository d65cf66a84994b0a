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

  test("k larger than group size returns whole groups") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopKPerKey.topKPerKey(df, Seq(col("k")), Seq(col("v").desc), 5)
      .as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (1, 20), (2, 5)))
  }
}
