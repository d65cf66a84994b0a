package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does the sorted sweep beat the binned interval join, and by
  * how much? Two regimes:
  *
  * 1. UNIFORM (the gate shape): intervals spread evenly, bin ≈ interval
  *    length → per-bin candidate sets are small, the codegen'd hash
  *    equi-join wins over a Row-based mapPartitions sweep.
  * 2. HOT BIN (dense telemetry burst): MANY SHORT intervals land inside
  *    one long-interval-sized bin → the binned join must test every
  *    pair sharing the bin (quadratic in the burst size, nearly all
  *    non-overlapping), while the sweep's buffer stays at the true
  *    concurrency and only output pairs cost work.
  *
  * Run: runMain graft.tools.IntervalSweepProbe [nBurst]
  */
object IntervalSweepProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($rows rows)")
    }

    val binWidth = 1800L * 1000000L // 30 min, the gate's bin

    // HOT BIN: n short (100 ms) intervals per side, all inside ONE
    // 30-minute window — deterministic hash spread, ~0.011% pair
    // overlap rate, but 100% shared-bin rate
    val span = binWidth - 200000L
    val hotL = spark.range(n).select(col("id").as("aid"),
        (abs(hash(col("id"))) % span).as("as"))
      .withColumn("ae", col("as") + 100000L)
    val hotR = spark.range(n).select((col("id") + 1000000L).as("bid"),
        (abs(hash(col("id") + 77)) % span).as("bs"))
      .withColumn("be", col("bs") + 100000L)

    for (rep <- 1 to 3) {
      time(s"hot binned   rep$rep") {
        graft.core.Ops.intervalOverlapJoin(
          hotL, hotR, "as", "ae", "bs", "be", binWidth).count()
      }
      time(s"hot sweep    rep$rep") {
        graft.core.Ops.intervalOverlapJoinSweep(
          hotL, hotR, "as", "ae", "bs", "be").count()
      }
    }

    // UNIFORM: same n, spread over 1000 bins — the gate regime
    val wide = binWidth * 1000L
    val uniL = spark.range(n).select(col("id").as("aid"),
        (abs(hash(col("id"))) % wide).as("as"))
      .withColumn("ae", col("as") + binWidth)
    val uniR = spark.range(n).select((col("id") + 1000000L).as("bid"),
        (abs(hash(col("id") + 77)) % wide).as("bs"))
      .withColumn("be", col("bs") + 600L * 1000000L)
    for (rep <- 1 to 3) {
      time(s"uniform binned rep$rep") {
        graft.core.Ops.intervalOverlapJoin(
          uniL, uniR, "as", "ae", "bs", "be", binWidth).count()
      }
      time(s"uniform sweep  rep$rep") {
        graft.core.Ops.intervalOverlapJoinSweep(
          uniL, uniR, "as", "ae", "bs", "be").count()
      }
    }
    spark.stop()
  }
}
