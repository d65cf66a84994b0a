package graft.io

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the SCALING.md claim that the engine's equi-join plans are
  * bucketing-compatible: joining two tables bucketed on the join key
  * plans ZERO shuffle exchanges — the mechanism that removes the
  * per-query exchange for fact-fact joins at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // explicit paths → the (static) warehouse dir is never used for data
    val wh = java.nio.file.Files.createTempDirectory("bucket-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an exchange; only the final
      // single aggregation exchange remains
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
