package graft.pipeline

import graft.testkit.SparkSpec
import graft.functions.Hashing

/** KMeansInt vs a sequential driver replica of the identical integer
  * Lloyd rounds, plus clustering sanity on separable data. */
class KMeansIntSpec extends SparkSpec {

  import spark.implicits._
  import KMeansInt.{Scale, Shift}

  private def quantize(v: Array[Float]): Array[Long] = {
    val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
    v.map(x => (if (scale == 0.0) 0L
      else math.floor(x / scale + 0.5).toLong) + Shift)
  }

  /** Sequential integer Lloyd: same seeds, same fixed-point means,
    * same (cost, cid) tie-break. */
  private def replica(vecs: Map[Long, Array[Long]], k: Int, iters: Int)
      : Map[Long, (Long, Long)] = {
    def cost(q: Array[Long], m: Array[Long]): Long =
      q.indices.map { j => val d = q(j) * Scale - m(j); d * d }.sum
    def assign(cents: Map[Long, Array[Long]]): Map[Long, (Long, Long)] =
      vecs.map { case (id, q) =>
        id -> cents.map { case (cid, m) => (cost(q, m), cid) }.min.swap
      }
    var cents = vecs.toSeq
      .sortBy { case (id, _) => (Hashing.hash60Local(s"${KMeansInt.Seed}|$id"), id) }
      .take(k).map { case (id, q) => id -> q.map(_ * Scale) }.toMap
    for (_ <- 0 until iters) {
      val asg = assign(cents)
      val upd = asg.groupBy(_._2._1).map { case (cid, members) =>
        val qs = members.keys.map(vecs).toSeq
        val c = qs.size.toLong
        cid -> qs.head.indices.map { j =>
          val sx = qs.map(_(j)).sum
          (sx * 2 * Scale + c) / (c * 2) // all positive: / == floor div
        }.toArray
      }
      cents = cents.map { case (cid, m) => cid -> upd.getOrElse(cid, m) }
    }
    assign(cents).map { case (id, (cid, c)) => id -> (cid, c) }
  }

  test("matches the sequential integer Lloyd replica") {
    val rnd = new scala.util.Random(41)
    val vecs = (0L until 80L).map { id =>
      id -> Array.fill(16)(rnd.nextFloat() * 2 - 1)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = KMeansInt.run(df, k = 5, iters = 3)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val want = replica(vecs.map { case (id, v) => id -> quantize(v) }.toMap,
      k = 5, iters = 3)
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(5)} vs ${(want.toSet diff got.toSet).take(5)}")
  }

  test("k-means-blocked SemDeDup prunes only same-cluster lower-id matches") {
    val rnd = new scala.util.Random(17)
    val centers = Seq(Array.fill(8)(0.9f), Array.fill(8)(-0.9f),
      Array.tabulate(8)(j => if (j % 2 == 0) 0.9f else -0.9f))
    val vecs = (0L until 60L).map { id =>
      val c = centers((id % 3).toInt)
      id -> c.map(x => x + rnd.nextFloat() * 0.05f - 0.025f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val asg = KMeansInt.run(df, k = 3, iters = 3)
    val cl = asg.as[(Long, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    val pruned = Similarity.semDedupPruneBy(df, asg, tau = 0.9)
      .as[(Long, Long, Long, Double)].collect()
    // tight blobs: every vector except each cluster's lowest id prunes
    assert(pruned.length == 60 - cl.values.toSet.size)
    pruned.foreach { case (cid, vid, n, maxSim) =>
      assert(cl(vid) == cid && maxSim >= 0.9 && n >= 1)
      assert(cl.exists { case (v2, c2) => c2 == cid && v2 < vid })
    }
  }

  test("separable blobs cluster together and the result survives repartitioning") {
    val rnd = new scala.util.Random(7)
    // 3 well-separated blobs in 8 dims
    val centers = Seq(Array.fill(8)(0.8f), Array.fill(8)(-0.8f),
      Array.tabulate(8)(j => if (j % 2 == 0) 0.8f else -0.8f))
    val vecs = (0L until 90L).map { id =>
      val c = centers((id % 3).toInt)
      id -> c.map(x => x + rnd.nextFloat() * 0.1f - 0.05f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val a = KMeansInt.run(df, k = 3, iters = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = KMeansInt.run(df.repartition(13), k = 3, iters = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // every blob lands in one cluster
    val byBlob = a.groupBy(_._1 % 3).values
    byBlob.foreach(g => assert(g.map(_._2).distinct.size == 1))
    assert(a.map(_._2).distinct.size == 3)
  }
}
