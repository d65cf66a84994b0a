package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Edge-list reader/writer with the reference's exact contract.
  *
  * Input: whitespace-separated `src dst` per line, validated against
  * `(0|[1-9][0-9]*)\s(0|[1-9][0-9]*)$`; the first invalid line aborts
  * with its 1-based line number (`/root/reference/mr-pr-cpp.cpp:89-108`).
  *
  * Output: the golden PageRank format — `"<id> = <rank>"` per dense id
  * ascending, then a `"s = <Σrank>"` trailer, values with 12 significant
  * digits (C++ `setprecision(12)`, `mr-pr-cpp.cpp:254-267`).
  */
object EdgeListIO {

  final case class InvalidLine(lineNumber: Long, content: String)
    extends RuntimeException(s"invalid input at line number : $lineNumber")

  private val LinePattern = "^(0|[1-9][0-9]*)\\s(0|[1-9][0-9]*)$"

  /** Strictly validated distributed read → `(src BIGINT, dst BIGINT)`.
    *
    * Validation is a distributed full-scan aggregate (not a driver loop):
    * we number lines via a monotonic zipWithIndex on the text source and
    * keep only the FIRST offender for the abort message, matching the
    * reference's sequential scan. The data pass re-reads with a pushed
    * projection; both passes are single-scan, shuffle-free.
    */
  def readValidated(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // Directory trees/globs read like the reference's file-list map.
    val lines = spark.read.option("recursiveFileLookup", "true").textFile(path)
    // RDD zipWithIndex preserves textfile line order (partition-ordered);
    // the per-file line number (the reference validates file by file,
    // mr-pr-cpp.cpp:89-108) is the rank of the global index within its
    // file — a window over the validation pass only, not the data path.
    val numbered = lines
      .select(col("value").as("line"), input_file_name().as("f"))
      .rdd.zipWithIndex()
      .map { case (r, i) => (r.getString(0), r.getString(1), i) }
      .toDF("line", "f", "gidx")
    val bad = numbered
      .where(!col("line").rlike(LinePattern))
      .orderBy("gidx")
      .limit(1)
      .select("gidx", "f", "line")
      .collect()
    bad.headOption.foreach { r =>
      // exact per-file number: count this file's lines up to the offender
      val n = numbered
        .where(col("f") === r.getString(1) && col("gidx") <= r.getLong(0))
        .count()
      throw InvalidLine(n, r.getString(2))
    }
    numbered.select(
      split(col("line"), "\\s").getItem(0).cast("long").as("src"),
      split(col("line"), "\\s").getItem(1).cast("long").as("dst"))
  }

  /** Unvalidated fast path (schema-on-read CSV, filters/projection push
    * into the scan). Like every reader here, `path` may be a single
    * file, a glob, or a directory tree — the reference's file-list map
    * walks directories recursively (`mapreduce.cpp:1022-1043`,
    * `findfiles` recursion `:2725-2843`); Spark's equivalent is native
    * glob expansion plus `recursiveFileLookup`. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", " ").option("recursiveFileLookup", "true")
      .schema("src LONG, dst LONG").csv(path)

  /** `read_edge_weight` (`oink/map_read_edge_weight.cpp:9-27`):
    * `vi vj weight` lines. */
  def readWeighted(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", " ").option("recursiveFileLookup", "true")
      .schema("src LONG, dst LONG, weight DOUBLE").csv(path)

  /** `read_edge_label` (`oink/map_read_edge_label.cpp`): `vi vj label`. */
  def readLabeled(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", " ").option("recursiveFileLookup", "true")
      .schema("src LONG, dst LONG, label INT").csv(path)

  /** `read_vertex_weight` / `read_vertex_label`
    * (`oink/map_read_vertex_weight.cpp`, `map_read_vertex_label.cpp`). */
  def readVertexWeighted(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", " ").option("recursiveFileLookup", "true")
      .schema("id LONG, weight DOUBLE").csv(path)

  def readVertexLabeled(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", " ").option("recursiveFileLookup", "true")
      .schema("id LONG, label INT").csv(path)

  /** `read_words` (`oink/map_read_words.cpp:9-30`): whitespace tokens of
    * arbitrary text files as a single-column frame; directory trees
    * welcome (file-list map semantics). */
  def readWords(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.option("recursiveFileLookup", "true").textFile(path).toDF("line")
      .select(explode(filter(split(col("line"), "\\s+"), w => w =!= lit(""))).as("word"))
  }

  /** C++ `operator<<(double)` under `setprecision(12)`: up to 12
    * significant digits, trailing zeros trimmed, scientific notation
    * when the decimal exponent < -4 or >= 12 (%g semantics) — what the
    * golden files contain. Byte-level parity with the reference's cpp
    * goldens is asserted by EdgeListIOSpec over barabasi-100000. */
  def formatRank(x: Double): String = {
    if (x == 0.0) return "0"
    val bd = new java.math.BigDecimal(x).round(new java.math.MathContext(12))
    val unscaled = bd.stripTrailingZeros()
    val exp = unscaled.precision() - unscaled.scale() - 1 // decimal exponent
    if (exp < -4 || exp >= 12) {
      val m = java.math.BigDecimal.valueOf(unscaled.unscaledValue().longValue(), unscaled.precision() - 1)
      val mant = m.stripTrailingZeros().toPlainString
      val sign = if (exp < 0) "-" else "+"
      f"${mant}e$sign${math.abs(exp)}%02d"
    } else unscaled.toPlainString
  }

  /** Write ranks in golden format. Ranks are O(websize) lines; the
    * reference itself gathers to one file (`gather(1)` idiom), so a
    * driver-side collect is the faithful—and at web scale, the documented
    * escape hatch is `coalesce(1).sortWithinPartitions` to a distributed
    * single file. */
  def writeGolden(ranks: DataFrame, path: String): Unit = {
    val rows = ranks.orderBy("id").collect()
    val sb = new StringBuilder
    var s = 0.0
    rows.foreach { r =>
      val rank = r.getDouble(1)
      s += rank
      sb.append(r.getLong(0)).append(" = ").append(formatRank(rank)).append('\n')
    }
    sb.append("s = ").append(formatRank(s))
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Parse a golden file into (id → value, trailer). Mirrors
    * `correctness_checker.cpp:34-56` (tolerance handled by caller). */
  def parseGolden(path: String): (Map[Long, Double], Double) = {
    val lines = scala.io.Source.fromFile(path).getLines().toVector.filter(_.nonEmpty)
    val kv = scala.collection.mutable.Map[Long, Double]()
    var trailer = 0.0
    lines.foreach { l =>
      val Array(k, v) = l.split("\\s=\\s")
      if (k == "s") trailer = v.toDouble else kv(k.toLong) = v.toDouble
    }
    (kv.toMap, trailer)
  }
}
