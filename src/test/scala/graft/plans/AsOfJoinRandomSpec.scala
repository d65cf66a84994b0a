package graft.plans

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized adversarial rounds for the as-of merge: many keys, heavy
  * time collisions between fact and version times, keys present on only
  * one side, and hostile input partitioning — each round checked
  * against a plain-Scala reference computation. */
class AsOfJoinRandomSpec extends SparkSpec {
  import spark.implicits._

  private def reference(facts: Seq[(Long, Long)], dim: Seq[(Long, Long, Long)],
      tol: Option[Long], dir: String = "backward"): Set[(Long, Long, Option[Long])] = {
    val byKey = dim.groupBy(_._1)
    facts.map { case (k, t) =>
      val vs = byKey.getOrElse(k, Nil)
      val back = vs.filter(_._2 <= t).sortBy(_._2).lastOption
        .filter(c => tol.forall(d => t - c._2 <= d))
      val fwd = vs.filter(_._2 >= t).sortBy(_._2).headOption
        .filter(c => tol.forall(d => c._2 - t <= d))
      val cand = dir match {
        case "backward" => back
        case "forward" => fwd
        case _ => (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (f._2 - t < t - b._2) Some(f) else Some(b)
          case (b, f) => b.orElse(f)
        }
      }
      (k, t, cand.map(_._3))
    }.toSet
  }

  test("16 seeded random rounds match the reference, any partitioning, all directions") {
    for (seed <- 1 to 16) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(20)
      // coarse time grid -> many exact fact/version time collisions
      val facts = Seq.fill(300)((rnd.nextInt(nKeys).toLong,
        rnd.nextInt(40).toLong))
      // unique (key, time) on the right, as the operator contract requires
      val dim = rnd.shuffle(
        (for (k <- 0L until nKeys.toLong; t <- 0L until 40L) yield (k, t))
          .toSeq).take(80)
        .map { case (k, t) => (k, t, k * 1000 + t) } // payload derivable
      // tolerance and direction drawn INDEPENDENTLY so every
      // direction×tolerance combination gets randomized coverage
      // (seed-derived draws previously aliased: tolerance appeared only
      // with direction=backward, leaving fwdDist/fwdOk tolerance paths
      // to a single hand-written case)
      val tol = if (rnd.nextBoolean()) Some(rnd.nextInt(10).toLong + 1) else None

      val fDf = facts.toDF("k", "t").repartition(1 + rnd.nextInt(7))
      val dDf = dim.toDF("dk", "vt", "payload").repartition(1 + rnd.nextInt(7))
      val dir = Seq("backward", "forward", "nearest")(rnd.nextInt(3))
      // both physical strategies against the same reference: the
      // streaming merge (shuffle+sort) and the broadcast index variant
      // must pick identical rows under every direction×tolerance combo
      for (bcast <- Seq(false, true)) {
        val got = AsOfJoin.asOfJoin(fDf, dDf,
            Seq(col("k")), Seq(col("dk")), col("t"), col("vt"), tol, dir,
            broadcast = bcast)
          .select("k", "t", "payload")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))

        // row multiplicity: every left row emits exactly once
        assert(got.length == facts.length,
          s"seed $seed bcast=$bcast: left rows not preserved")
        val gotCounts = got.groupBy(identity).view.mapValues(_.length).toMap
        val ref = reference(facts, dim, tol, dir)
        val expCounts = facts.map { case (k, t) =>
          ref.find(r => r._1 == k && r._2 == t).get
        }.groupBy(identity).view.mapValues(_.length).toMap
        assert(gotCounts == expCounts,
          s"seed $seed ($dir, bcast=$bcast): as-of picks diverge")
      }
    }
  }

  test("broadcast exec preserves the fact side's partitioning and plans no exchange") {
    val facts = (0L until 200L).map(i => (i % 7, i)).toDF("k", "t")
      .repartition(5, col("k"))
    val dim = (0L until 7L).flatMap(k => Seq((k, 10L, k * 10), (k, 100L, k * 100)))
      .toDF("dk", "vt", "payload")
    val joined = AsOfJoin.asOfJoin(facts, dim,
      Seq(col("k")), Seq(col("dk")), col("t"), col("vt"), broadcast = true)
    joined.collect() // finalize any adaptive planning before reading the plan
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastAsOfJoin"), planStr)
    // exactly ONE shuffle anywhere: the test's own repartition(5, k).
    // The operator itself must add none (the dim side rides a
    // BroadcastExchange, which is not a shuffle).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
      def walk(p: SparkPlan): Int = {
        val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
        val nested = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case _ => 0
        }
        self + nested + p.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    assert(countShuffles(joined) == 1,
      s"fact side must not re-shuffle:\n$planStr")
    // a groupBy on the pre-hashed fact key must reuse the partitioning:
    // the aggregate plans with no exchange beyond the setup repartition
    val agg = joined.groupBy("k").count()
    assert(agg.collect().map(_.getLong(1)).sum == 200L)
    assert(countShuffles(agg) == 1,
      s"downstream groupBy must reuse fact partitioning:\n${agg.queryExecution.executedPlan}")
  }
}
