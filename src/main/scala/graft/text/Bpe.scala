package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * 2016): the real merge-table learner, not the chars/4 estimate.
  *
  * Shape per merge round — exactly the Lloyd's-k-means discipline
  * ([[graft.pipeline.KMeansInt]]): one corpus-wide pair-count
  * aggregation (map-side partial counts, one shuffle of distinct pairs,
  * NOT of the corpus), a 1-row argmax collected to the driver (the merge
  * table is driver state, like centroids), and one broadcast-applied
  * symbol rewrite. Cost is O(merges) aggregations over a corpus that
  * never leaves its partitioning; at 100 TB the standard practice of
  * training on a sample rides on any upstream `Sampling` operator.
  *
  * Word-internal BPE: text splits to words, words to character symbols
  * with an end-of-word marker `</w>`; merges never cross word
  * boundaries. Ties in pair counts break lexicographically — training is
  * deterministic for a given corpus regardless of partitioning.
  */
object Bpe {

  val Eow = "</w>"

  final case class Merge(a: String, b: String)

  /** Per-word symbol state: distinct words carry their corpus counts so
    * every round counts pairs over DISTINCT WORDS weighted by frequency
    * — corpus size only matters once, in the initial word count.
    * (Not `private`: the Dataset encoder's generated projection code
    * cannot access a private case class.) */
  final case class WordSyms(word: String, cnt: Long, syms: Seq[String])

  private def initial(spark: SparkSession, docs: DataFrame, text: org.apache.spark.sql.Column): Dataset[WordSyms] = {
    import spark.implicits._
    docs.select(explode(TextAnalysis.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) =>
        WordSyms(w, c, w.map(_.toString) :+ Eow)
      }
  }

  private def applyMerge(syms: Seq[String], m: Merge): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m.a && syms(i + 1) == m.b) {
        out += (m.a + m.b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` merges. Returns the ordered merge table. */
  def train(spark: SparkSession, docs: DataFrame,
      text: org.apache.spark.sql.Column, nMerges: Int): Seq[Merge] = {
    import spark.implicits._
    var words = initial(spark, docs, text)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val top = words.flatMap { ws =>
        ws.syms.sliding(2).collect { case Seq(a, b) => ((a, b), ws.cnt) }
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (c, a, b) }
        // argmax with lexicographic tie-break: order by (-count, a, b)
        .orderBy(col("_1").desc, col("_2"), col("_3"))
        .limit(1).collect()
      if (top.isEmpty || top.head._1 < 2) done = true
      else {
        val m = Merge(top.head._2, top.head._3)
        merges += m
        val prev = words
        words = words.map(ws => ws.copy(syms = applyMerge(ws.syms, m)))
          .localCheckpoint(true) // truncate the per-round lineage
        prev.unpersist(false)
        round += 1
      }
    }
    words.unpersist(false)
    merges.result()
  }

  /** Tokenize `docs` with a learned merge table (broadcast-applied, one
    * map-side pass — no shuffle). */
  def tokenize(spark: SparkSession, docs: DataFrame,
      id: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(id.cast("long").as("doc_id"), text.as("t"))
      .as[(Long, String)]
      .map { case (docId, t) =>
        val toks = t.split(" ").filter(_.nonEmpty).flatMap { w =>
          bc.value.foldLeft(w.map(_.toString) :+ Eow: Seq[String])(applyMerge)
        }
        (docId, toks)
      }
      .toDF("doc_id", "bpe_tokens")
  }
}
