package graft.text

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized invariants for the chunking operator — the properties an
  * embedding pipeline silently relies on: total coverage (every token in
  * at least one chunk), stride-exact chunk starts, and lossless
  * reconstruction from stride-aligned chunk prefixes. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunk invariants over randomized documents") {
    val rnd = new scala.util.Random(42)
    val docs = (0 until 30).map { i =>
      val n = rnd.nextInt(300) // includes 0-token docs
      (i.toLong, (0 until n).map(j => s"w${rnd.nextInt(50)}_$j").mkString(" "))
    }
    val (window, stride) = (16, 11)
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, col("doc_id"), col("text"), window, stride)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk_idx"))).toMap

    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) assert(!out.contains(id))
      else {
        val chunks = out(id)
        // stride-exact starts 0, s, 2s, ... and contiguous chunk_idx
        assert(chunks.zipWithIndex.forall { case (r, i) =>
          r.getAs[Long]("chunk_idx") == i.toLong &&
            r.getAs[Long]("start_tok") == i.toLong * stride
        })
        assert(chunks.length == math.ceil(toks.length.toDouble / stride).toInt)
        // coverage: chunk sizes are min(window, n - start), so the union
        // of [start, start+size) covers [0, n) exactly when sizes track
        val covered = chunks.flatMap { r =>
          val s = r.getAs[Long]("start_tok").toInt
          val len = r.getAs[Long]("n_chunk_tokens").toInt
          assert(len == math.min(window, toks.length - s))
          s until (s + len)
        }.toSet
        assert(covered == toks.indices.toSet)
        // stride-aligned prefixes reconstruct the doc: hash(prefix) of
        // each chunk must equal hash of the source token slice
        chunks.foreach { r =>
          val s = r.getAs[Long]("start_tok").toInt
          val len = r.getAs[Long]("n_chunk_tokens").toInt
          val expect = graft.functions.Hashing.hash60Local(
            toks.slice(s, s + len).mkString(" "))
          assert(r.getAs[Long]("chunk_hash") == expect)
        }
      }
    }
  }
}
