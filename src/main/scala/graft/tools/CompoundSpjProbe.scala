package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic probe for compound-key SPJ (round 13). Finding that
  * shaped the design: a scan-reported 2-argument `bucket(n, src, dst)`
  * transform RESOLVES through the function catalog (kgp=Some(...)) but
  * never plans exchange-free — Spark's physical SPJ machinery accepts
  * only single-argument transforms (`KeyGroupedPartitioning.
  * isSupportedTransform` requires `children.size == 1`; confirmed by
  * disassembling the 4.1.2 catalyst bytecode). Hence compound layouts
  * are a GRID of two single-argument transforms ([bucket(n, src),
  * bucket(n, dst)], partition key = the pair) — which this probe now
  * shows planning with zero Exchange below the join. Prints the
  * optimized plan's keyGroupedPartitioning for both sides and the
  * executed join plan. */
object CompoundSpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.EdgeListCatalog")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    val root = java.nio.file.Files.createTempDirectory("graft_cspj_").toFile
    root.deleteOnExit()
    val fmt = "graft.sources.EdgeListSource"
    val e = spark.range(4000).selectExpr("id % 97 AS src", "(id * 7) % 89 AS dst")
    e.repartition(4).write.format(fmt)
      .option("bucketBy", "src,dst").option("numBuckets", "8")
      .mode("overwrite").save(s"$root/a")
    e.where((col("src") + col("dst")) % 3 === 0).repartition(2)
      .write.format(fmt)
      .option("bucketBy", "src,dst").option("numBuckets", "8")
      .mode("overwrite").save(s"$root/b")
    val df = spark.sql(
      s"""SELECT /*+ MERGE(a) */ a.src AS v, count(*) AS n
         |FROM graft.`$root/a` a JOIN graft.`$root/b` b
         |ON a.src = b.src AND a.dst = b.dst
         |GROUP BY a.src""".stripMargin)
    df.queryExecution.optimizedPlan.foreach {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        println(s"SCAN ${r.scan.description().takeWhile(_ != ',')} kgp=${r.keyGroupedPartitioning}")
      case _ =>
    }
    df.collect()
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("SortMergeJoin") || l.contains("BatchScan"))
      .mkString("\n"))
    spark.stop()
  }
}
