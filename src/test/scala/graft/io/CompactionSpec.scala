package graft.io

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction rewrites many small files to the size-derived count, content-equal") {
    val dir = Files.createTempDirectory("graft-compact").resolve("t").toString
    // 64 tiny files
    spark.range(100000L).select(col("id"), (col("id") % 97).as("k"))
      .repartition(64).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.toSeq).toSet

    val bytes = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(bytes.length == 64)
    val total = bytes.map(_.length).sum
    val target = total / 4 // aim for ~4 files
    val r = Compaction.compactParquet(spark, dir, target)
    assert(r.filesBefore == 64)
    val expectWant = math.max(1, math.ceil(total.toDouble / target).toInt)
    assert(r.filesAfter == expectWant, s"got ${r.filesAfter}, want $expectWant")

    val after = spark.read.parquet(dir)
    assert(after.collect().map(_.toSeq).toSet == beforeRows)

    // convergent: repeated passes with the same target settle (the
    // post-compaction table may shed per-file overhead bytes and shrink
    // once more, but a fixed point is reached and then never rewritten)
    val r2 = Compaction.compactParquet(spark, dir, target)
    assert(r2.filesBefore == r.filesAfter && r2.filesAfter <= r2.filesBefore)
    val r3 = Compaction.compactParquet(spark, dir, target)
    assert(r3.filesBefore == r3.filesAfter && r3.filesAfter == r2.filesAfter)
  }

  test("a table already at target count is left untouched") {
    val dir = Files.createTempDirectory("graft-compact2").resolve("t").toString
    spark.range(1000L).coalesce(1).write.parquet(dir)
    val fileBefore = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val mtime = fileBefore.lastModified()
    val r = Compaction.compactParquet(spark, dir, 128L << 20)
    assert(r.filesBefore == 1 && r.filesAfter == 1)
    val fileAfter = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(fileAfter.getName == fileBefore.getName && fileAfter.lastModified() == mtime)
  }
}
