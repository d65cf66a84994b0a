package graft.functions

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private def sketch(keys: Seq[String], parts: Int): Seq[Long] =
    keys.toDF("k").repartition(parts)
      .agg(KmvSketch.kmv(Hashing.hash60(col("k")), K).as("sk"))
      .as[Seq[Long]].head()

  test("synopsis IS the k smallest distinct hashes, sorted ascending") {
    val keys = (0 until 500).map(i => s"key-$i") ++ (0 until 500).map(i => s"key-$i")
    val got = sketch(keys, 4)
    val expect = (0 until 500).map(i => Hashing.hash60Local(s"key-$i"))
      .distinct.sorted.take(K)
    assert(got == expect)
  }

  test("fewer than k distinct values: synopsis is the whole distinct set") {
    val got = sketch((0 until 10).map(i => s"v$i"), 3)
    assert(got.length == 10 && got == got.sorted)
  }

  test("partition-merge invariance: identical synopsis for 1, 3, 8 splits") {
    val keys = (0 until 3000).map(i => s"m$i")
    val a = sketch(keys, 1)
    val b = sketch(keys, 3)
    val c = sketch(keys, 8)
    assert(a == b && b == c)
  }

  test("nulls are skipped; all-null group yields an empty synopsis") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("k")
    val got = df.agg(KmvSketch.kmv(Hashing.hash60(col("k")), K).as("sk"))
      .as[Seq[Long]].head()
    assert(got.length == 2)
    val empty = Seq.empty[String].toDF("k")
      .agg(KmvSketch.kmv(Hashing.hash60(col("k")), K).as("sk"))
      .as[Seq[Long]].head()
    assert(empty.isEmpty)
  }

  test("estimate: exact below k, within KMV error bounds above") {
    val small = Seq.tabulate(17)(i => s"s$i").toDF("k")
      .agg(KmvSketch.estimate(
        KmvSketch.kmv(Hashing.hash60(col("k")), K), K).as("e"))
      .as[Double].head()
    assert(small == 17.0)
    val big = (0 until 20000).map(i => s"b$i").toDF("k")
      .agg(KmvSketch.estimate(
        KmvSketch.kmv(Hashing.hash60(col("k")), K), K).as("e"))
      .as[Double].head()
    // RSE ~ 1/sqrt(k-2) ~ 12.7% at k=64; 4 sigma
    assert(math.abs(big - 20000) / 20000.0 < 0.51, s"estimate $big vs 20000")
  }

  test("union synopsis equals the synopsis of the concatenated input") {
    val ka = (0 until 2000).map(i => s"u$i")
    val kb = (1000 until 3000).map(i => s"u$i")
    val skA = ka.toDF("k").agg(KmvSketch.kmv(Hashing.hash60(col("k")), K).as("s"))
    val skB = kb.toDF("k").agg(KmvSketch.kmv(Hashing.hash60(col("k")), K).as("s"))
    val uni = skA.crossJoin(broadcast(skB.withColumnRenamed("s", "s2")))
      .select(KmvSketch.unionOf(col("s"), col("s2"), K).as("u"))
      .as[Seq[Long]].head()
    assert(uni == sketch(ka ++ kb, 2))
  }

  test("SQL surface: kmv() registered and matches the Column API") {
    GraftFunctions.register(spark)
    (0 until 100).map(i => s"q$i").toDF("k").createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(s"SELECT kmv(hash60(k), $K) AS sk FROM kmv_in")
      .as[Seq[Long]].head()
    assert(viaSql == sketch((0 until 100).map(i => s"q$i"), 1))
  }

  test("type errors fail analysis loudly") {
    val df = Seq(("x", 1L)).toDF("s", "h")
    intercept[Exception] {
      df.agg(KmvSketch.kmv(col("s"), K)).collect() // non-BIGINT input
    }
    intercept[Exception] {
      // non-foldable / wrong-typed k
      import org.apache.spark.sql.graftbridge.Bridge
      val bad = Bridge.column(KmvSketch(
        Bridge.expression(col("h")),
        Bridge.expression(col("h"))).toAggregateExpression())
      df.agg(bad).collect()
    }
  }
}
