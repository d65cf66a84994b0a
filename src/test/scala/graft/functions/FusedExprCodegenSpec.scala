package graft.functions

import graft.testkit.SparkSpec
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

/** r13 regression: the fused kernels live in standalone *Impl objects
  * precisely so the generated Java links against a real static method —
  * a companion `eval` gets NO static forwarder (name clash with
  * Expression.eval), janino fails to compile the stage, and Spark
  * silently falls back to interpreted execution for every containing
  * stage. Value-equality specs cannot catch that (the fallback computes
  * the same values); this spec disables the fallback so a codegen
  * regression fails loudly.
  *
  * r14 (ADVICE): the input must NOT be a LocalRelation — the
  * ConvertToLocalRelation optimizer rule evaluates a deterministic
  * projection over one at PLANNING time with an interpreted projection,
  * so the executed plan is a bare LocalTableScan and no janino
  * compilation ever happens (the r13 test passed vacuously). Building
  * from spark.range keeps a real WholeStageCodegen stage, and the spec
  * asserts it is present so the test fails loudly if the plan ever
  * stops exercising codegen.
  */
class FusedExprCodegenSpec extends SparkSpec {

  test("generated code for the fused expressions compiles (no interpreted fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.range(2)
        .select(col("id").as("doc_id"),
          split(concat(lit("a b c d e f g h x"), col("id").cast("string")), " ")
            .as("toks"),
          array((0 until 8).map(i => col("id") * i + lit(0.5)): _*)
            .as("vec"),
          array((0 until 4).map(i => (col("id") + i).cast("int") % 2): _*)
            .as("codes"),
          array((0 until 8).map(i => col("id") * lit(0.25) + i): _*)
            .as("lut"))
      val out = docs.select(
        SimHashExpr.simHash60(col("toks")).as("sh"),
        ShingleHashesExpr.shingleHashes(col("toks"), 3).as("hs"),
        MinHashSigExpr.minHashSig(col("toks"), 3,
          Seq(3L, 5L), Seq(7L, 11L), (1L << 61) - 1).as("mh"),
        WinnowExpr.winnowFps(col("toks"), 3, 4).as("fps"),
        SqDistL2.sqDist(col("vec"), reverse(col("vec"))).as("d2"),
        AdcSum.adcSum(col("codes"), col("lut"), 2).as("adc"))
      assert(out.collect().length == 2)
      val executed = out.queryExecution.executedPlan
      assert(executed.exists(_.isInstanceOf[WholeStageCodegenExec]),
        s"no WholeStageCodegen stage in the executed plan — the fused " +
          s"expressions were never compiled:\n$executed")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
