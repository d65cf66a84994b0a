package graft.cli

import org.apache.spark.sql.SparkSession
import graft.graph.PageRank
import graft.io.EdgeListIO

/** CLI runner mirroring the reference binaries' interface
  * (`./mr-pr-cpp.o <input> -o <output>`, usage/`-o` validation at
  * `/root/reference/mr-pr-cpp.cpp:187-193`), so the reference's
  * `run.sh`-style end-to-end + checker workflow reproduces against this
  * engine: `runMain graft.cli.Main pagerank test/bull.txt -o out.txt`.
  */
object Main {

  def usage(): Nothing = {
    System.err.println(
      """usage: graft.cli.Main <command> <input> -o <output>
        |commands: pagerank""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = args match {
    case Array("pagerank", input, "-o", output) =>
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
        .appName("graft-cli")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val edges = EdgeListIO.readValidated(spark, input)
        val t0 = System.nanoTime()
        val (ranks, iters) = PageRank.runWithStats(spark, edges, None,
          PageRank.DefaultAlpha, PageRank.DefaultTol, PageRank.DefaultMaxIter, 10)
        EdgeListIO.writeGolden(ranks, output)
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"Pagerank finished in $ms%.1f ms ($iters iterations)")
      } catch {
        case EdgeListIO.InvalidLine(n, _) =>
          System.err.println(s"invalid input at line number : $n")
          sys.exit(1)
      } finally spark.stop()
    case _ => usage()
  }
}
