package graft.functions

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** r13 regression: the fused kernels live in standalone *Impl objects
  * precisely so the generated Java links against a real static method —
  * a companion `eval` gets NO static forwarder (name clash with
  * Expression.eval), janino fails to compile the stage, and Spark
  * silently falls back to interpreted execution for every containing
  * stage. Value-equality specs cannot catch that (the fallback computes
  * the same values); this spec disables the fallback so a codegen
  * regression fails loudly.
  */
class FusedExprCodegenSpec extends SparkSpec {
  import spark.implicits._

  test("generated code for the fused expressions compiles (no interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = Seq((1L, "a b c d e f g h"), (2L, "b c d e f g h i j"))
        .toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val out = docs.select(
        SimHashExpr.simHash60(col("toks")).as("sh"),
        ShingleHashesExpr.shingleHashes(col("toks"), 3).as("hs"),
        MinHashSigExpr.minHashSig(col("toks"), 3,
          Seq(3L, 5L), Seq(7L, 11L), (1L << 61) - 1).as("mh"),
        WinnowExpr.winnowFps(col("toks"), 3, 4).as("fps"))
      assert(out.collect().length == 2)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
