package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink surface — the reference's `print`/`scan` formatted outputs
  * (`/root/reference/mapreduce-7Apr14/src/mapreduce.cpp:1566-1680`,
  * `oink/scan_print_edge.cpp`) generalized to columnar formats.
  *
  * Scale note: `single=true` (one ordered file, the reference's
  * `gather(1)` idiom) is for golden-file/test outputs only; the cluster
  * path is partitioned parquet/csv with `partitionBy` so downstream
  * scans prune on the partition column.
  */
object Sinks {

  def writeCsv(df: DataFrame, path: String, sep: String = " ",
      single: Boolean = false, header: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("sep", sep).option("header", header.toString).csv(path)
  }

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the second columnar format Spark ships natively; same
    * predicate-pushdown/column-pruning story as parquet. */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def readCsv(spark: SparkSession, path: String, schema: String, sep: String = " "): DataFrame =
    spark.read.option("sep", sep).schema(schema).csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
