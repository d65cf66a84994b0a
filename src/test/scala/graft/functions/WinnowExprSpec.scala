package graft.functions

import graft.testkit.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class WinnowExprSpec extends SparkSpec {
  import spark.implicits._

  /** The composed form WinnowExpr replaced (verbatim from the pre-r13
    * winnowed()): per window, the interpreted rightmost-min fold; then
    * array_distinct over the window winners. */
  private def composedFps(k: Int, w: Int) = {
    val withHs = col("hs")
    array_distinct(transform(sequence(lit(0L), size(withHs).cast("long") - w), j =>
      aggregate(sequence(j, j + w - 1),
        struct(lit(Long.MaxValue).as("h"), lit(-1L).as("pick")),
        (acc, i) => {
          val hi = element_at(withHs, (i + 1).cast("int"))
          when(hi <= acc("h"), struct(hi.as("h"), i.as("pick")))
            .otherwise(acc)
        })))
  }

  test("native fingerprints equal the composed fold form (order included)") {
    val k = 3; val w = 4
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = d.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        transform(TextAnalysis.shinglesFromTokens(col("toks"), k),
          s => Hashing.hash60(s)).as("hs0"))
      .select(col("doc_id"), col("toks"), explode(array(col("hs0"))).as("hs"))
      .where(size(col("hs")) >= w)
    val diffs = base.select(col("doc_id"),
        WinnowExpr.winnowFps(col("toks"), k, w).as("native"),
        composedFps(k, w).as("composed"))
      .where(col("native") =!= col("composed")).count()
    assert(diffs == 0L)
  }

  test("ties keep the rightmost minimum; short docs are null") {
    // tokens chosen so duplicate shingles produce equal hashes in a window
    val d = Seq((1L, "a b c a b c a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val row = d.where(col("doc_id") === 1)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(WinnowExpr.winnowFps(col("toks"), 3, 4).as("fps")).head()
    assert(!row.isNullAt(0) && row.getSeq[Any](0).nonEmpty)
    val short = d.where(col("doc_id") === 2)
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(WinnowExpr.winnowFps(col("toks"), 3, 4).as("fps")).head()
    assert(short.isNullAt(0))
  }

  test("winnow operator output matches the documented per-doc stats shape") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.winnow(d, col("doc_id"), col("text"))
    val r = out.agg(sum("n_fps"), sum("n_positions")).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > r.getLong(0))
  }
}
