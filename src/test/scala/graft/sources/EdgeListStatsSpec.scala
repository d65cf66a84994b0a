package graft.sources

import java.nio.file.Files

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Zone-map sidecars (`_stats/<file>.zmap`): written at commit, used to
  * skip whole files whose min/max ranges can't satisfy pushed filters —
  * and NEVER a correctness dependency (absent/stale sidecars only cost
  * speed). */
class EdgeListStatsSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.EdgeListSource"

  /** Two single-file generations with disjoint src ranges. */
  private def twoFileTable(): String = {
    val root = Files.createTempDirectory("graftzmap").resolve("edges").toString
    Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("src", "dst").coalesce(1)
      .write.format(Fmt).mode("append").save(root)
    Seq((10L, 1000L), (11L, 1100L)).toDF("src", "dst").coalesce(1)
      .write.format(Fmt).mode("append").save(root)
    root
  }

  private def plannedPartitions(root: String, cond: org.apache.spark.sql.Column): Int =
    spark.read.format(Fmt).load(root).where(cond).rdd.getNumPartitions

  test("commit writes one sidecar per data file with exact bounds") {
    val root = twoFileTable()
    val files = EdgeListSource.listFiles(root)
    assert(files.size === 2)
    val stats = files.flatMap(EdgeStats.read)
    assert(stats.size === 2)
    assert(stats.map(s => (s.minSrc, s.maxSrc, s.rows)).toSet ===
      Set((1L, 3L, 3L), (10L, 11L, 2L)))
    assert(stats.map(s => (s.minDst, s.maxDst)).toSet ===
      Set((100L, 300L), (1000L, 1100L)))
  }

  test("pushed filter outside a file's range skips the whole file") {
    val root = twoFileTable()
    assert(plannedPartitions(root, lit(true)) === 2)       // no filter: all
    assert(plannedPartitions(root, col("src") === 10) === 1)
    assert(plannedPartitions(root, col("src") < 4) === 1)
    assert(plannedPartitions(root, col("dst") >= 1000) === 1)
    assert(plannedPartitions(root, col("src") === 99) === 0)
    // IN hitting both ranges keeps both files
    assert(plannedPartitions(root, col("src").isin(1, 11)) === 2)
    // results stay correct under the skip
    assert(spark.read.format(Fmt).load(root).where(col("src") === 10)
      .as[(Long, Long)].collect().toSeq === Seq((10L, 1000L)))
  }

  test("missing sidecars disable the skip but not the read") {
    val root = twoFileTable()
    val sd = new java.io.File(root, "_stats")
    sd.listFiles().foreach(_.delete()); sd.delete()
    assert(plannedPartitions(root, col("src") === 10) === 2) // no skip
    assert(spark.read.format(Fmt).load(root).where(col("src") === 10)
      .as[(Long, Long)].collect().toSeq === Seq((10L, 1000L)))
  }

  test("bounds stay conservative across DELETE rewrites") {
    val root = twoFileTable()
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.EdgeListCatalog")
    spark.sql(s"DELETE FROM graft.`$root` WHERE src = 3")
    // sidecar still present and still a valid (wider) bound
    assert(plannedPartitions(root, col("src") === 1) === 1)
    assert(spark.read.format(Fmt).load(root).as[(Long, Long)]
      .collect().toSet ===
      Set((1L, 100L), (2L, 200L), (10L, 1000L), (11L, 1100L)))
  }

  test("overwrite truncate drops the previous generation's sidecars") {
    val root = twoFileTable()
    Seq((50L, 60L)).toDF("src", "dst").coalesce(1)
      .write.format(Fmt).mode("overwrite").save(root)
    val files = EdgeListSource.listFiles(root)
    assert(files.size === 1)
    val sd = new java.io.File(root, "_stats")
    assert(sd.listFiles().map(_.getName).toSeq ===
      files.map(_.getName + ".zmap"))
    assert(plannedPartitions(root, col("src") === 1) === 0)
  }

  test("pushed aggregate over a skipped file set still merges correctly") {
    val root = twoFileTable()
    val got = spark.read.format(Fmt).load(root)
      .where(col("src") >= 10)
      .agg(count(lit(1)).as("n"), min("dst").as("lo"), max("dst").as("hi"))
      .as[(Long, Long, Long)].head()
    assert(got === ((2L, 1000L, 1100L)))
  }
}
