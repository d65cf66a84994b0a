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

  /** Learn `nMerges` merges. Returns the ordered merge table.
    *
    * Scale note (100 TB story): BPE training is inherently SEQUENTIAL —
    * merge k+1's pair counts depend on merge k having been applied — so
    * each round is one distributed count + one driver-side argmax
    * (`limit(1).collect()` below is the algorithm, not an accident).
    * At corpus scale the standard practice holds here unchanged: TRAIN
    * on a bounded sample (token statistics converge long before the
    * full corpus is seen), then APPLY the learned merge table fully
    * distributed — [[encode]]/[[tokenize]] are per-row map work with a
    * broadcast merge table and no driver round-trips. */
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

  // The gate calls train via trainCached so a Verify sweep (which may
  // invoke the same query twice: once for the parquet dump, once for a
  // row count) learns the merge table once per (session, dir, nMerges).
  // Governed by spark.graft.memoize like the GraphQueries caches so a
  // benchmark rep still pays the honest full cost.
  private val trainedCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Int), Seq[Merge]]

  def trainCached(spark: SparkSession, dir: String, docs: DataFrame,
      text: org.apache.spark.sql.Column, nMerges: Int): Seq[Merge] =
    if (!spark.conf.get("spark.graft.memoize", "true").toBoolean)
      train(spark, docs, text, nMerges)
    else trainedCache.getOrElseUpdate((spark, dir, nMerges),
      train(spark, docs, text, nMerges))

  def clearCache(): Unit = trainedCache.clear()

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

  /** DuckDB oracle for the FULL training loop: the `nMerges` rounds are
    * unrolled as chained materialized CTEs, so the oracle independently
    * re-learns the merge table (pair argmax with the same
    * (-count, a, b) tie-break) and re-applies every merge.
    *
    * Greedy left-to-right non-overlapping merge application — exactly
    * [[applyMerge]]'s scan — is expressed as a string `replace`: each
    * symbol is wrapped as STX‖sym‖ETX, so the pattern STX‖a‖ETX‖STX‖b‖ETX
    * can neither match across symbol boundaries (a suffix of a longer
    * symbol is never preceded by STX) nor share a delimiter between two
    * back-to-back matches (each match consumes its own full wrappers,
    * keeping `replace`'s left-to-right scan aligned with the Scala one).
    * `AS MATERIALIZED` is load-bearing: inlining the four scalar
    * subqueries on t_k would expand the chain ~4^nMerges times.
    *
    * The per-round `c >= 2` guard replays [[train]]'s early stop: once a
    * round's best pair drops below 2, no merge is applied, pair counts
    * stop changing, and every later round is a no-op — the same fixpoint
    * the Scala loop reaches by breaking.
    */
  def oracleSql(nMerges: Int): String = {
    val S = "\u0002" // STX — wraps symbol starts; never in corpus text
    val E = "\u0003" // ETX — wraps symbol ends
    def syms(enc: String) =
      s"string_split(substr($enc, 2, length($enc) - 2), '$E$S')"
    val rounds = (1 to nMerges).map { k =>
      val prev = if (k == 1) "w0" else s"w${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT syms[i+1] AS a, syms[i+2] AS b, sum(cnt) AS c
         |  FROM (SELECT cnt, ${syms("enc")} AS syms FROM $prev) t, r
         |  WHERE i <= len(syms) - 2 GROUP BY 1, 2),
         |t$k AS MATERIALIZED (SELECT a, b, c FROM p$k
         |  ORDER BY c DESC, a ASC, b ASC LIMIT 1),
         |w$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |    CASE WHEN (SELECT c FROM t$k) >= 2
         |      THEN replace(enc,
         |        '$S' || (SELECT a FROM t$k) || '$E$S' || (SELECT b FROM t$k) || '$E',
         |        '$S' || (SELECT a FROM t$k) || (SELECT b FROM t$k) || '$E')
         |      ELSE enc END AS enc
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    val last = s"w$nMerges"
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT word, count(*) AS cnt,
       |    '$S' || array_to_string(list_append(string_split(word, ''), '$Eow'),
       |      '$E$S') || '$E' AS enc
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '' GROUP BY 1),
       |r AS (SELECT unnest(range((SELECT max(length(word)) + 1 FROM w0))) AS i),
       |$rounds,
       |wtok AS (SELECT word, CAST(len(${syms("enc")}) AS BIGINT) AS ntoks FROM $last),
       |docw AS (SELECT doc_id,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
       |  FROM documents),
       |agg AS (SELECT d.doc_id, CAST(sum(w.ntoks) AS BIGINT) AS n_bpe_tokens
       |  FROM docw d JOIN wtok w USING (word) GROUP BY 1)
       |SELECT doc.doc_id,
       |  coalesce(agg.n_bpe_tokens, 0) AS n_bpe_tokens,
       |  coalesce(array_to_string(
       |    list_filter(string_split(doc.text, ' '), x -> x <> ''), ' '), '') AS detok
       |FROM documents doc LEFT JOIN agg ON agg.doc_id = doc.doc_id""".stripMargin
  }
}
