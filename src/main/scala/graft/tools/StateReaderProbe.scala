package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Empirical probe for the state data source reader (`statestore`
  * format): drain the TWS running-stats pipeline with a durable
  * checkpoint, then read the PERSISTED state back and print its schema
  * and a sample — pins the key/value column paths the st_state_reader
  * gate projects, instead of guessing them from docs.
  *
  * usage: runMain graft.tools.StateReaderProbe [sfDir]
  */
object StateReaderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files.createTempDirectory("graft_sreader_").toFile
    val ckpt = new java.io.File(root, "ckpt").getPath
    val out = new java.io.File(root, "out").getPath

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val df = graft.streaming.TwsOperators.runningStatsStreamTws(spark,
      graft.streaming.EventStreams.readEventsMultiBatch(spark, sfDir))
    val q = df.writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    println("== state-metadata ==")
    val meta = spark.read.format("state-metadata").load(ckpt)
    meta.show(20, truncate = false)

    println("== statestore (stateVarName=moments) ==")
    val st = spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", "moments")
      .load()
    st.printSchema()
    st.show(10, truncate = false)
    spark.stop()
  }
}
