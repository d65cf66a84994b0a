package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** R-MAT recursive-quadrant random graph generation — the reference's
  * `rmat` command (`/root/reference/oink/rmat.cpp:37-90`, generator
  * `oink/map_rmat_generate.cpp:14-67`): for each of 2^levels × density
  * edges, walk `levels` quadrant choices with probabilities (a,b,c,d),
  * accumulating one src/dst bit per level; duplicate edges are culled.
  *
  * Spark-first: the whole generator is a single codegen'd projection over
  * `spark.range(nEdges)` — no shuffle until the final `distinct`. The
  * per-(edge, level) randomness comes from the portable seeded
  * [[Hashing.hash60]], so generation is deterministic, partitioning-
  * independent, AND reproducible by the DuckDB oracle (the reference
  * instead re-seeds `srand48` per task — same intent, process-local).
  */
object RMat {

  /** One quadrant draw in [0,1) for (edge i, level l). */
  private def draw(seed: Long, i: Column, l: Int): Column =
    Hashing.rand01(seed, concat_ws(",", i, lit(l)))

  /** @param levels   log2 of vertex count
    * @param nEdges   edges to draw (before duplicate culling)
    * @param a,b,c,d  quadrant probabilities, a+b+c+d = 1
    * @return distinct (src BIGINT, dst BIGINT)
    */
  /** The (src, dst) projection columns over an `id` row index — the
    * whole generator as two expressions, shared by [[generate]] and the
    * `graft_rmat(levels, n, seed)` SQL table function. */
  def srcDstCols(levels: Int, seed: Long,
      a: Double = 0.45, b: Double = 0.15, c: Double = 0.15,
      d: Double = 0.25): (Column, Column) = {
    require(a + b + c + d > 0.999 && a + b + c + d < 1.001, "quadrant probs must sum to 1")
    val i = col("id")
    // quadrant q(l): 0=(0,0) 1=(0,1) 2=(1,0) 3=(1,1); srcbit = q>=2, dstbit = q odd
    val bits = (0 until levels).map { l =>
      val r = draw(seed, i, l)
      val srcBit = (r >= lit(a + b)).cast("long")
      val dstBit = ((r >= lit(a) && r < lit(a + b)) || r >= lit(a + b + c)).cast("long")
      (srcBit * (1L << l), dstBit * (1L << l))
    }
    (bits.map(_._1).reduce(_ + _).as("src"),
      bits.map(_._2).reduce(_ + _).as("dst"))
  }

  def generate(
      spark: SparkSession,
      levels: Int,
      nEdges: Long,
      seed: Long,
      a: Double = 0.45, b: Double = 0.15, c: Double = 0.15, d: Double = 0.25): DataFrame = {
    val (src, dst) = srcDstCols(levels, seed, a, b, c, d)
    spark.range(nEdges).select(src, dst).distinct()
  }

  /** DuckDB SQL computing the identical edge set (oracle). */
  def generateSql(
      levels: Int,
      nEdges: Long,
      seed: Long,
      a: Double = 0.45, b: Double = 0.15, c: Double = 0.15, d: Double = 0.25): String = {
    def drawSql(l: Int) = Hashing.rand01Sql(seed, s"concat_ws(',', i, '$l')")
    val srcTerms = (0 until levels).map { l =>
      s"(CASE WHEN ${drawSql(l)} >= ${a + b} THEN ${1L << l} ELSE 0 END)"
    }.mkString(" + ")
    val dstTerms = (0 until levels).map { l =>
      val r = drawSql(l)
      s"(CASE WHEN ($r >= $a AND $r < ${a + b}) OR $r >= ${a + b + c} THEN ${1L << l} ELSE 0 END)"
    }.mkString(" + ")
    s"""SELECT DISTINCT CAST($srcTerms AS BIGINT) AS src, CAST($dstTerms AS BIGINT) AS dst
       |FROM (SELECT CAST(range AS BIGINT) AS i FROM range($nEdges))""".stripMargin
  }
}
