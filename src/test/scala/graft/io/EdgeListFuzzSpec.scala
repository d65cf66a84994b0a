package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized sweep of the connector's parser and pushdowns:
  * random edge files (value ranges crossing every literal-width
  * boundary, single- and multi-file dirs, with and without trailing
  * newline) read at random chunk sizes — including sizes far below one
  * line — with random filter / prune / group combinations, each case
  * compared against a straightforward in-memory parse of the same
  * bytes. Deterministic (fixed seed): a failure replays exactly. */
class EdgeListFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.EdgeListSource"
  private val rnd = new scala.util.Random(20260814L)

  private def v(): Long = rnd.nextInt(4) match {
    case 0 => rnd.nextInt(10).toLong            // 1-digit
    case 1 => rnd.nextInt(100000).toLong        // mid-width
    case 2 => Long.MaxValue - rnd.nextInt(1000) // 19-digit
    case _ => rnd.nextInt(2).toLong             // heavy duplicates
  }

  private def randomEdges(n: Int): Seq[(Long, Long)] =
    Seq.fill(n)((v(), v()))

  test("random files x chunk sizes x pushdowns all equal the reference parse") {
    (0 until 25).foreach { caseIdx =>
      val edges = randomEdges(1 + rnd.nextInt(200))
      val nFiles = 1 + rnd.nextInt(3)
      val trailing = rnd.nextBoolean()
      val dir = Files.createTempDirectory(s"graft_fuzz_$caseIdx")
      dir.toFile.deleteOnExit()
      edges.grouped(math.max(1, edges.size / nFiles)).zipWithIndex.foreach {
        case (part, i) =>
          val body = part.map { case (s, d) => s"$s $d" }.mkString("\n")
          Files.write(dir.resolve(f"part-$i%03d.txt"),
            (if (trailing) body + "\n" else body).getBytes(StandardCharsets.UTF_8))
      }
      val chunk = 1 + rnd.nextInt(64)
      val base = spark.read.format(Fmt)
        .option("chunkBytes", chunk.toString).load(dir.toString)
      val tag = s"case=$caseIdx chunk=$chunk files=$nFiles trailing=$trailing n=${edges.size}"

      // full read
      assert(base.as[(Long, Long)].collect().sorted.toSeq == edges.sorted, tag)

      // random filter pushdown
      val lo = rnd.nextInt(100000).toLong
      val filtered = base.where(col("dst") >= lo).as[(Long, Long)]
        .collect().sorted.toSeq
      assert(filtered == edges.filter(_._2 >= lo).sorted, s"$tag lo=$lo")

      // pruned single-column read
      val dsts = base.select("dst").as[Long].collect().sorted.toSeq
      assert(dsts == edges.map(_._2).sorted, tag)

      // grouped pushdown under a tiny flush cap
      val got = base.where(col("dst") >= lo)
        .groupBy("src").agg(count(lit(1)).as("n"), max("dst").as("mx"))
        .as[(Long, Long, Long)].collect().toSet
      val want = edges.filter(_._2 >= lo).groupBy(_._1).map { case (s, es) =>
        (s, es.size.toLong, es.map(_._2).max) }.toSet
      assert(got == want, s"$tag lo=$lo grouped")

      // limit pushdown: a prefix of the post-filter rows, count exact
      val lim = 1 + rnd.nextInt(10)
      val limited = base.where(col("dst") >= lo).limit(lim).collect()
      assert(limited.length == math.min(lim, edges.count(_._2 >= lo)),
        s"$tag lim=$lim")
    }
  }
}
