package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark: variants of the reference's MapReduce phase
  * (inverse-adjacency build) to pick the best shape for Bench. */
object MrPhaseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // MRPHASE_NOCOMPRESS=1: skip LZ4 on the ~1 MB shuffle (pure
      // overhead at this size; compression wins only when blocks are
      // network- or disk-bound)
      .config("spark.shuffle.compress",
        if (sys.env.contains("MRPHASE_NOCOMPRESS")) "false" else "true")
      .config("spark.shuffle.spill.compress",
        if (sys.env.contains("MRPHASE_NOCOMPRESS")) "false" else "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val path = "/root/reference/test/barabasi-100000.txt"
    val edges = graft.io.EdgeListIO.read(spark, path).cache()
    edges.count()
    val edges1 = edges.coalesce(1).cache(); edges1.count()

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-28s median=${ts.sorted.apply(2)}%8.1f ms  all=${ts.map(t => f"$t%.0f").mkString(",")}")
    }

    time("groupBy_collect_list")(noop(edges.groupBy("dst").agg(collect_list("src"))))
    time("coalesced1_groupBy")(noop(edges1.groupBy("dst").agg(collect_list("src"))))
    time("rdd_groupByKey")(
      edges.as[(Long, Long)].rdd.map(e => (e._2, e._1)).groupByKey(8).foreach(_ => ()))
    time("mapPartitions_local_group") {
      edges1.as[(Long, Long)].mapPartitions { it =>
        val m = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
        it.foreach { case (s, d) =>
          m.computeIfAbsent(d, _ => new java.util.ArrayList[Long]()).add(s)
        }
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.size()))
      }.write.format("noop").mode("overwrite").save()
    }
    time("repart_sortWithin") {
      noop(edges.repartition(8, col("dst")).sortWithinPartitions("dst"))
    }
    time("mapPartitions_primitive_map") {
      edges1.as[(Long, Long)].mapPartitions { it =>
        val m = new graft.core.LongAdjacencyMap()
        it.foreach { case (s, d) => m.add(d, s) }
        m.groupSizes
      }.write.format("noop").mode("overwrite").save()
    }
    time("shuffle_primitive_map") {
      edges.as[(Long, Long)]
        .repartition(32, col("dst"))
        .mapPartitions { it =>
          val m = new graft.core.LongAdjacencyMap()
          it.foreach { case (s, d) => m.add(d, s) }
          m.groupSizes
        }.write.format("noop").mode("overwrite").save()
    }
    time("mapPartitions_internalrow") {
      // bypass the tuple deserializer: read the cached InternalRows
      // directly (row object is reused; two getLong calls per edge)
      val rdd = edges1.queryExecution.toRdd.mapPartitions { it =>
        val m = new graft.core.LongAdjacencyMap()
        it.foreach { r => m.add(r.getLong(1), r.getLong(0)) }
        m.groupSizes
      }
      rdd.foreach(_ => ())
    }
    time("shuffle_internalrow") {
      val rdd = edges.repartition(32, col("dst")).queryExecution.toRdd.mapPartitions { it =>
        val m = new graft.core.LongAdjacencyMap()
        it.foreach { r => m.add(r.getLong(1), r.getLong(0)) }
        m.groupSizes
      }
      rdd.foreach(_ => ())
    }
    for (p <- Seq(2, 4, 8, 16, 32)) time(s"shuffle_internalrow_p$p") {
      val rdd = edges.repartition(p, col("dst")).queryExecution.toRdd.mapPartitions { it =>
        val m = new graft.core.LongAdjacencyMap()
        it.foreach { r => m.add(r.getLong(1), r.getLong(0)) }
        m.groupSizes
      }
      rdd.foreach(_ => ())
    }
    // raw-RDD shuffle: HashPartitioner on (dst, src) pairs — no Exchange
    // planning, no UnsafeRow serialization (plain Long pairs through the
    // Kryo/Java serializer), the closest Spark analogue to MPI alltoall
    locally {
      val pairRdd = edges.as[(Long, Long)].rdd.map(e => (e._2, e._1)).cache()
      pairRdd.count()
      for (p <- Seq(4, 8, 16, 32)) time(s"rdd_partitionBy_p$p") {
        pairRdd.partitionBy(new org.apache.spark.HashPartitioner(p))
          .mapPartitions { it =>
            val m = new graft.core.LongAdjacencyMap()
            it.foreach { case (d, s) => m.add(d, s) }
            m.groupSizes
          }.foreach(_ => ())
      }
      // fewer map tasks: m mappers × p reducers = m·p shuffle blocks;
      // at 1 MB the block count (scheduling + fetch bookkeeping), not
      // bytes, is the cost
      for (m <- Seq(2, 4, 8)) {
        val pm = pairRdd.coalesce(m).cache(); pm.count()
        for (p <- Seq(4, 8)) time(s"rdd_m${m}_p$p") {
          pm.partitionBy(new org.apache.spark.HashPartitioner(p))
            .mapPartitions { it =>
              val mm = new graft.core.LongAdjacencyMap()
              it.foreach { case (d, s) => mm.add(d, s) }
              mm.groupSizes
            }.foreach(_ => ())
        }
        pm.unpersist(false)
      }
      pairRdd.unpersist(false)
    }
    // ---- round-7 sweep: the two levers the round-6 verdict left open ----

    // Exchange floor: identical plan shape with a ~zero payload — the
    // irreducible latency any shuffle variant pays on this host. Swept
    // over map-task count because at 1 MB the m×p block bookkeeping, not
    // bytes, is the cost (m=1 matches the cached single-partition edge
    // list the real variants read; m=32 shows the block-count freight).
    for (mp <- Seq(1, 4, 32)) time(s"exchange_floor_m$mp") {
      val rdd = spark.range(0L, 1000L, 1L, mp)
        .select(col("id").as("dst"), col("id").as("src"))
        .repartition(32, col("dst")).queryExecution.toRdd.mapPartitions { it =>
          var c = 0L; it.foreach(_ => c += 1); Iterator.single(c)
        }
      rdd.foreach(_ => ())
    }

    // Map-side combine before the exchange: pre-group each map partition
    // into (dst, packed long[] srcs) so a dst with k in-edges in one
    // partition ships one record instead of k. On a 100k-edge graph with
    // 32 map partitions most dsts appear 0-1 times per partition, so the
    // shrink is bounded by the local duplication factor (hubs only).
    locally {
      val pairRdd = edges.as[(Long, Long)].rdd.map(e => (e._2, e._1)).cache()
      pairRdd.count()
      for (p <- Seq(8, 32)) time(s"mapside_combine_rdd_p$p") {
        pairRdd.mapPartitions { it =>
          val m = new graft.core.LongAdjacencyMap()
          it.foreach { case (d, s) => m.add(d, s) }
          m.groups.map { case (k, a, l) => (k, java.util.Arrays.copyOf(a, l)) }
        }.partitionBy(new org.apache.spark.HashPartitioner(p))
          .mapPartitions { it =>
            val m = new graft.core.LongAdjacencyMap()
            it.foreach { case (d, arr) =>
              var i = 0; while (i < arr.length) { m.add(d, arr(i)); i += 1 }
            }
            m.groupSizes
          }.foreach(_ => ())
      }
      // fewer map partitions raise the local duplication factor (more
      // edges per mapper -> more combining) at the cost of parallelism
      for (mp <- Seq(4, 8)) {
        val pm = pairRdd.coalesce(mp).cache(); pm.count()
        time(s"mapside_combine_rdd_m${mp}_p8") {
          pm.mapPartitions { it =>
            val m = new graft.core.LongAdjacencyMap()
            it.foreach { case (d, s) => m.add(d, s) }
            m.groups.map { case (k, a, l) => (k, java.util.Arrays.copyOf(a, l)) }
          }.partitionBy(new org.apache.spark.HashPartitioner(8))
            .mapPartitions { it =>
              val m = new graft.core.LongAdjacencyMap()
              it.foreach { case (d, arr) =>
                var i = 0; while (i < arr.length) { m.add(d, arr(i)); i += 1 }
              }
              m.groupSizes
            }.foreach(_ => ())
        }
        pm.unpersist(false)
      }
      pairRdd.unpersist(false)
    }

    // same idea through the SQL Exchange (UnsafeRow with an array column)
    time("mapside_combine_df") {
      val pre = edges.as[(Long, Long)].mapPartitions { it =>
        val m = new graft.core.LongAdjacencyMap()
        it.foreach { case (s, d) => m.add(d, s) }
        m.groups.map { case (k, a, l) => (k, java.util.Arrays.copyOf(a, l)) }
      }.toDF("dst", "srcs")
      val rdd = pre.repartition(32, col("dst")).queryExecution.toRdd.mapPartitions { it =>
        val m = new graft.core.LongAdjacencyMap()
        it.foreach { r =>
          val d = r.getLong(0); val arr = r.getArray(1)
          var i = 0; val n = arr.numElements()
          while (i < n) { m.add(d, arr.getLong(i)); i += 1 }
        }
        m.groupSizes
      }
      rdd.foreach(_ => ())
    }

    time("shuffle_boxed_map") {
      edges.as[(Long, Long)]
        .repartition(32, col("dst"))
        .mapPartitions { it =>
          val m = new java.util.HashMap[Long, java.util.ArrayList[Long]]()
          it.foreach { case (s, d) =>
            m.computeIfAbsent(d, _ => new java.util.ArrayList[Long]()).add(s)
          }
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue.size()))
        }.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
