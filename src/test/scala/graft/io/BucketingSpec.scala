package graft.io

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed layout must actually eliminate the exchange — these specs
  * assert the PLAN property (no ShuffleExchangeExec), not just row
  * equality, because the whole point of the layout is the shuffle it
  * removes at scale. */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withSmj[T](f: => T): T = {
    // force the join decision to sort-merge so the assertion tests
    // bucket co-location, not the broadcast threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // idempotent per-test setup: every test writes the tables it reads, so
  // the suite has no inter-test ordering dependency (runs filtered too)
  private def writeJoinTables(): Unit = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "ord_b", "o_orderkey", 4)
  }

  test("bucketed-bucketed equi-join runs with zero shuffle") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    writeJoinTables()
    withSmj {
      val joined = Bucketing.table(spark, "li_b")
        .join(Bucketing.table(spark, "ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      assert(Bucketing.shuffleFree(joined),
        "bucketed join must not plan a ShuffleExchange")
      // and the rows are the same as the unbucketed plan's
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
      assert(joined.except(plain).isEmpty && plain.except(joined).isEmpty)
    }
  }

  test("aggregation keyed on the bucket column runs with zero shuffle") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_b2", "l_orderkey", 4)
    val agg = Bucketing.table(spark, "li_b2")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(Bucketing.shuffleFree(agg),
      "bucket-keyed aggregation must not plan a ShuffleExchange")
    val expect = li.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(agg.except(expect).isEmpty && expect.except(agg).isEmpty)
  }

  test("join keyed off the bucket column still shuffles (negative control)") {
    writeJoinTables()
    withSmj {
      val joined = Bucketing.table(spark, "li_b")
        .join(Bucketing.table(spark, "ord_b"),
          col("l_quantity") === col("o_custkey"))
      assert(!Bucketing.shuffleFree(joined),
        "non-bucket-key join should shuffle; shuffleFree() must detect it")
    }
  }
}
