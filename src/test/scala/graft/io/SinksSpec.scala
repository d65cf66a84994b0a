package graft.io

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
    .toDF("id", "tag", "v")

  test("csv round-trip preserves rows; single=true yields one file") {
    val dir = Files.createTempDirectory("sinks-csv").toString
    Sinks.writeCsv(df, dir, single = true)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val back = Sinks.readCsv(spark, dir, "id LONG, tag STRING, v DOUBLE")
    assert(back.as[(Long, String, Double)].collect().toSet ==
      df.as[(Long, String, Double)].collect().toSet)
  }

  test("partitioned parquet prunes on the partition column") {
    val dir = Files.createTempDirectory("sinks-parq").toString
    Sinks.writeParquet(df, dir, partitionBy = Seq("tag"))
    assert(new java.io.File(s"$dir/tag=a").exists())
    val back = spark.read.parquet(dir).where(col("tag") === "a")
    assert(back.count() == 2)
    // partition filter must reach the scan, not a post-filter
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(tag"), scan)
  }

  test("json round-trip") {
    val dir = Files.createTempDirectory("sinks-json").toString
    Sinks.writeJson(df, dir)
    assert(Sinks.readJson(spark, dir).count() == 3)
  }

  test("orc round-trip with partition pruning and filter pushdown") {
    val dir = Files.createTempDirectory("sinks-orc").toString
    Sinks.writeOrc(df, dir, partitionBy = Seq("tag"))
    assert(new java.io.File(s"$dir/tag=a").exists())
    val back = Sinks.readOrc(spark, dir)
    assert(back.count() == 3)
    val filtered = back.where(col("tag") === "a" && col("id") > 1)
    assert(filtered.count() == 1) // only (3, a, 3.5)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(tag"), scan)
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id"), scan)
  }
}
