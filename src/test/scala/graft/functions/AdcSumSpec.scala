package graft.functions

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

class AdcSumSpec extends SparkSpec {
  import spark.implicits._

  private val kw = 16
  private val m = 8

  private lazy val rows = {
    val rnd = new scala.util.Random(41)
    (0 until 500).map { i =>
      (i.toLong,
        Array.fill(m)(rnd.nextInt(kw)),
        Array.fill(m * kw)(rnd.nextDouble() * 10))
    }.toDF("id", "codes", "lut")
  }

  /** The exact composed fold AdcSum replaced in ivfPqTopK. */
  private def composed = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0d),
    (acc, s) => acc + element_at(col("lut"),
      (s * kw + element_at(col("codes"), s + 1) + 1).cast("int")))

  test("native LUT fold is bit-identical to the composed aggregate(sequence) form") {
    val diffs = rows
      .select(AdcSum.adcSum(col("codes"), col("lut"), kw).as("n"),
        composed.as("c"))
      .where(col("n") =!= col("c")).count()
    assert(diffs == 0L)
  }

  test("known values and null inputs") {
    // codes [1,0], kw=2, lut=[d00,d01,d10,d11] → lut[1] + lut[2]
    val r = Seq((Array(1, 0), Array(10.0, 20.0, 30.0, 40.0)))
      .toDF("codes", "lut")
      .select(AdcSum.adcSum(col("codes"), col("lut"), 2).as("d")).head()
    assert(r.getDouble(0) == 50.0)
    val n = Seq((null.asInstanceOf[Array[Int]], Array(1.0)))
      .toDF("codes", "lut")
      .select(AdcSum.adcSum(col("codes"), col("lut"), 2).as("d")).head()
    assert(n.isNullAt(0))
  }
}
