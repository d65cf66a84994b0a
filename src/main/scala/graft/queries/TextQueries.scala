package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.text.TextAnalysis
import graft.functions.Hashing

/** Driver-gate queries for the text-analysis operators over the
  * `documents` table (SURVEY.md §2.5 wordfreq lineage + the LLM-pipeline
  * text suite). DuckDB oracles replicate the exact token/shingle/hash
  * arithmetic via the portable md5-based hash60.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  val queries: Map[String, Q] = Map(
    "t_wordfreq" -> ((s, dir) =>
      TextAnalysis.wordFreq(docs(s, dir), col("text"), 20)),

    "t_langid" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir), col("doc_id"), col("text"))),

    // Per-language top-5 terms: the langid stage feeding the custom
    // TopKPerKey physical operator (capped map-side heaps — only ≤ k
    // rows per (language, partition) cross the exchange). Exercises the
    // graph between text analysis and the engine's own operator.
    "t_top_terms" -> ((s, dir) => {
      val d = docs(s, dir)
      val langs = TextAnalysis.langId(d, col("doc_id"), col("text"))
        .select(col("doc_id").as("ld"), col("lang_pred"))
      val counts = d
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
        .join(langs, col("doc_id") === col("ld"))
        .groupBy("lang_pred", "w").agg(count(lit(1)).as("cnt"))
      graft.plans.TopKPerKey.topKPerKey(counts, Seq(col("lang_pred")),
        Seq(col("cnt").desc, col("w")), k = 5)
        .select("lang_pred", "w", "cnt")
    }),

    "t_quality" -> ((s, dir) =>
      TextAnalysis.quality(docs(s, dir), col("doc_id"), col("text"))),

    // Gopher rule-based curation filter (Rae et al. 2021 A1.1): one
    // boolean per rule + conjunctive keep, single scan-side projection.
    "t_gopher" -> ((s, dir) =>
      TextAnalysis.gopherRules(docs(s, dir), col("doc_id"), col("text"))),

    // C4 line-level cleaning + page filter (Raffel et al. 2020 §2.2).
    "t_c4" -> ((s, dir) =>
      TextAnalysis.c4Rules(docs(s, dir), col("doc_id"), col("text"))),

    // Hashed-n-gram linear quality classifier (fastText-style): the
    // LEARNED curation scorer beside the rule filters — unigram+bigram
    // feature hashing into 4096 buckets, a deterministic stand-in
    // weight vector, exact integer bag-sum score, sign = keep. Pure
    // vectorized expressions: no shuffle, no UDF.
    "t_classify" -> ((s, dir) =>
      TextAnalysis.classify(docs(s, dir), col("doc_id"), col("text"))),

    // Unicode NFC normalization (native codegen expression; DuckDB
    // nfc_normalize is the oracle twin). ASCII corpus -> identity, which
    // the changed flag makes visible; NormalizeSpec covers real unicode.
    "t_normalize" -> ((s, dir) => docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.normalizeNfc(col("text")).as("norm_text"),
      (TextAnalysis.normalizeNfc(col("text")) =!= col("text")).as("changed"))),

    // BPE tokenizer training + application (Sennrich 2016): 10 merges
    // learned corpus-wide (one pair-count aggregation per merge over
    // DISTINCT words), then broadcast-applied. The oracle re-learns the
    // SAME merge table in DuckDB (Bpe.oracleSql unrolls the rounds as
    // materialized CTEs), so both the training argmax/tie-break and the
    // greedy merge application are hash-gated; detok additionally proves
    // the tokenization is lossless (concat tokens, `</w>` -> space,
    // equals the whitespace-normalized word sequence rebuilt from text).
    "t_bpe" -> ((s, dir) => {
      val d = docs(s, dir)
      val merges = graft.text.Bpe.trainCached(s, dir, d, col("text"), nMerges = 10)
      graft.text.Bpe.tokenize(s, d, col("doc_id"), col("text"), merges)
        .select(col("doc_id"),
          size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"),
          rtrim(regexp_replace(concat_ws("", col("bpe_tokens")),
            lit(java.util.regex.Pattern.quote(graft.text.Bpe.Eow)), lit(" ")))
            .as("detok"))
    }),

    // PMI collocations: top adjacent-pair associations — identical
    // double tree in both engines, rounded before the top-N cut.
    "t_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(docs(s, dir), col("text"))),

    // Corpus-trained add-k bigram LM scoring each doc's fluency.
    "t_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLogLoss(docs(s, dir), col("doc_id"), col("text"))),

    // Per-doc top-3 TF-IDF terms through the custom TopKPerKey physical
    // operator (capped map-side heaps; only ≤ k rows per (doc,
    // partition) cross the exchange). Scores round to 9 before the cut
    // so the selection never rides a last-ulp difference.
    "t_tfidf" -> ((s, dir) => {
      val d = docs(s, dir)
      val tf = d.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, Seq("w"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("w"), col("tf"),
          round(col("tf").cast("double") *
            log(col("n").cast("double") / col("df").cast("double")), 9)
            .as("tfidf"))
      graft.plans.TopKPerKey.topKPerKey(scored, Seq(col("doc_id")),
        Seq(col("tfidf").desc, col("w")), k = 3)
        .select("doc_id", "w", "tf", "tfidf")
    }),

    "t_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(docs(s, dir), col("doc_id"), col("text"))),

    // Overlapping token-window chunking (64-token chunks every 48): the
    // embedding/RAG prep pass; chunk text rides only as a hash.
    "t_chunk" -> ((s, dir) =>
      TextAnalysis.chunk(docs(s, dir), col("doc_id"), col("text"),
        window = 64, stride = 48)),

    "t_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir), col("doc_id"), col("text"))),

    // Winnowing fingerprint selection (MOSS): rightmost-min of each
    // 4-window over the 3-gram hash stream; any shared substring of
    // ≥ 6 tokens is guaranteed to share a fingerprint.
    "t_winnow" -> ((s, dir) =>
      TextAnalysis.winnow(docs(s, dir), col("doc_id"), col("text"))),

    // MOSS candidate generation: winnowing fingerprints as the band
    // space — the consumer of t_winnow's fingerprint selection (pairs
    // sharing >= 2 fingerprint hashes, buckets capped at 64 docs).
    "d_winnow" -> ((s, dir) =>
      graft.pipeline.Dedup.winnowCandidates(
        docs(s, dir), col("doc_id"), col("text"))),

    // Within-doc duplicate-3-gram fraction (Gopher/C4-style repetition
    // quality filter).
    "t_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(docs(s, dir), col("doc_id"), col("text"))),

    // PII-style scrubbing over a deterministic fixture: the synthetic
    // corpus contains no addresses/numbers, so the gate query appends a
    // per-doc contact line (identically in the oracle SQL) and verifies
    // the redaction regexes + counts over it.
    "t_redact" -> ((s, dir) =>
      TextAnalysis.redact(
        docs(s, dir).select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@mail.example.com ref "), (col("doc_id") + 7) * 123457L).as("text")),
        col("doc_id"), col("text"))),

    // Concat-and-chunk sequence packing: 512-token budget, 8 shards.
    "t_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(docs(s, dir), col("doc_id"), col("text"),
        budget = 512L, nShards = 8)),

    // Unigram-LM log-loss / perplexity quality scoring: the corpus's own
    // unigram distribution is the model (CCNet-style, no external LM).
    "t_perplexity" -> ((s, dir) =>
      TextAnalysis.unigramLogLoss(docs(s, dir), col("doc_id"), col("text"))),

    // Count-min sketch point queries: estimate the top-20 words'
    // frequencies from 4x1024 integer counters next to the exact count
    // (est >= exact by construction; all-integer, exact oracle).
    "t_countmin" -> ((s, dir) => {
      val d = docs(s, dir)
      val top = TextAnalysis.wordFreq(d, col("text"), 20)
        .withColumnRenamed("cnt", "exact_cnt")
        .withColumnRenamed("word", "word")
      TextAnalysis.countMinEstimate(
        TextAnalysis.countMinCounters(d, col("text")), top)
    }),

    // BM25 keyword retrieval: score every document against a fixed
    // 3-term query (term filter before the shuffle, broadcast df/corpus
    // stats, fixed-order term sum).
    "t_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(docs(s, dir), col("doc_id"), col("text"),
        Bm25Terms)),

    // Corpus-level training-budget stats: docs and token mass per
    // predicted language — the numbers a data-mixture plan is built
    // from. Two single-scan aggregates joined on doc_id.
    "t_corpus_stats" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.langId(d, col("doc_id"), col("text"))
        .join(TextAnalysis.tokenCounts(d, col("doc_id"), col("text")), "doc_id")
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("ndocs"),
          sum("ws_tokens").as("total_tokens"),
          sum("bpe_est").as("total_bpe"))
    })
  )

  private val H = (e: String) => Hashing.hash60Sql(e)

  /** Shared winnowing CTE chain (k=3, w=4): per-position gram hashes →
    * per-start full-window minima → rightmost-argmin picks → distinct
    * (doc_id, pick, h) fingerprints. The quadratic starts×grams join is
    * fine at oracle scale; the engine path is the array-land linear
    * formulation in [[TextAnalysis.winnow]]. */
  private lazy val WinnowCtes =
    s"""t AS (SELECT doc_id,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |g AS (SELECT doc_id, i AS p,
       |  ${H("concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])")} AS h
       |  FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) r
       |  WHERE i <= len(toks) - 3),
       |st AS (SELECT doc_id, p AS j, min(h) OVER win AS m,
       |  count(*) OVER win AS span
       |  FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY p
       |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
       |stv AS (SELECT doc_id, j, m FROM st WHERE span = 4),
       |picks AS (SELECT s.doc_id, s.j, max(g.p) AS pick
       |  FROM stv s JOIN g ON g.doc_id = s.doc_id
       |    AND g.p >= s.j AND g.p < s.j + 4 AND g.h = s.m
       |  GROUP BY 1, 2),
       |fps AS (SELECT DISTINCT k.doc_id, k.pick, g.h
       |  FROM picks k JOIN g ON g.doc_id = k.doc_id AND g.p = k.pick)""".stripMargin
  private val markers = TextAnalysis.LangMarkers
  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** Fixed bag-of-words query for the BM25 gate. */
  private val Bm25Terms = Seq("hash", "join", "spark")

  val oracles: Map[String, String] = Map(
    "t_wordfreq" ->
      """SELECT w AS word, count(*) AS cnt FROM (
        | SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE w <> '' GROUP BY w
        |ORDER BY cnt DESC, word ASC LIMIT 20""".stripMargin,

    "t_langid" -> {
      val scoreCols = markers.map { case (lang, ws) =>
        s"sum(CASE WHEN w IN (${inList(ws)}) THEN 1 ELSE 0 END) AS s_$lang"
      }.mkString(",\n  ")
      val langs = markers.map(_._1)
      val m = "greatest(" + langs.map(l => s"s_$l").mkString(", ") + ")"
      val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |sc AS (SELECT doc_id,
         |  $scoreCols
         |  FROM toks WHERE w <> '' GROUP BY doc_id),
         |mx AS (SELECT *, $m AS m FROM sc)
         |SELECT doc_id, CASE WHEN m <= 0 THEN 'und' $pick END AS lang_pred
         |FROM mx""".stripMargin
    },

    "t_top_terms" -> {
      val scoreCols = markers.map { case (lang, ws) =>
        s"sum(CASE WHEN w IN (${inList(ws)}) THEN 1 ELSE 0 END) AS s_$lang"
      }.mkString(",\n  ")
      val langs = markers.map(_._1)
      val m = "greatest(" + langs.map(l => s"s_$l").mkString(", ") + ")"
      val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |sc AS (SELECT doc_id,
         |  $scoreCols
         |  FROM toks WHERE w <> '' GROUP BY doc_id),
         |lid AS (SELECT doc_id, CASE WHEN m <= 0 THEN 'und' $pick END AS lang_pred
         |  FROM (SELECT *, $m AS m FROM sc)),
         |cnts AS (
         |  SELECT l.lang_pred, t.w, count(*) AS cnt
         |  FROM toks t JOIN lid l ON l.doc_id = t.doc_id
         |  WHERE t.w <> '' GROUP BY 1, 2)
         |SELECT lang_pred, w, cnt FROM (
         |  SELECT *, row_number() OVER (PARTITION BY lang_pred
         |    ORDER BY cnt DESC, w ASC) AS rn FROM cnts)
         |WHERE rn <= 5""".stripMargin
    },

    "t_corpus_stats" -> {
      val scoreCols = markers.map { case (lang, ws) =>
        s"sum(CASE WHEN w IN (${inList(ws)}) THEN 1 ELSE 0 END) AS s_$lang"
      }.mkString(",\n  ")
      val langs = markers.map(_._1)
      val m = "greatest(" + langs.map(l => s"s_$l").mkString(", ") + ")"
      val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |sc AS (SELECT doc_id,
         |  $scoreCols
         |  FROM toks WHERE w <> '' GROUP BY doc_id),
         |mx AS (SELECT *, $m AS m FROM sc),
         |lang AS (SELECT doc_id, CASE WHEN m <= 0 THEN 'und' $pick END AS lang_pred
         |  FROM mx),
         |tok AS (SELECT doc_id,
         |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ws_tokens,
         |  CAST(ceil(CAST(length(text) AS DOUBLE) / CAST(4.0 AS DOUBLE)) AS BIGINT) AS bpe_est
         |  FROM documents)
         |SELECT lang_pred, count(*) AS ndocs,
         | CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
         | CAST(sum(bpe_est) AS BIGINT) AS total_bpe
         |FROM lang JOIN tok USING (doc_id) GROUP BY lang_pred""".stripMargin
    },

    "t_tfidf" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM tk WHERE w <> ''
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT t.doc_id, t.w, t.tf,
        |    round(CAST(t.tf AS DOUBLE) *
        |      ln(CAST(n.n AS DOUBLE) / CAST(d.df AS DOUBLE)), 9) AS tfidf
        |  FROM tf t JOIN dfreq d ON d.w = t.w, n)
        |SELECT doc_id, w, tf, tfidf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, w ASC) AS rn FROM sc)
        |WHERE rn <= 3""".stripMargin,

    "t_pmi" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |uni AS (SELECT w, count(*) AS c FROM (
        |  SELECT unnest(toks) AS w FROM t) GROUP BY w),
        |big AS (SELECT toks[i+1] AS w1, toks[i+2] AS w2, count(*) AS c12
        |  FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) r
        |  WHERE i <= len(toks) - 2 GROUP BY 1, 2),
        |nt AS (SELECT CAST(sum(c) AS DOUBLE) AS ntd FROM uni),
        |nb AS (SELECT CAST(sum(c12) AS DOUBLE) AS nbd FROM big)
        |SELECT w1, w2, c12, pmi FROM (
        |  SELECT b.w1, b.w2, b.c12,
        |    round(ln(((CAST(b.c12 AS DOUBLE) * nt.ntd) * nt.ntd) /
        |      ((nb.nbd * CAST(u1.c AS DOUBLE)) * CAST(u2.c AS DOUBLE))), 9) AS pmi
        |  FROM big b
        |  JOIN uni u1 ON u1.w = b.w1
        |  JOIN uni u2 ON u2.w = b.w2, nt, nb
        |  WHERE b.c12 >= 5)
        |ORDER BY pmi DESC, w1, w2 LIMIT 100""".stripMargin,

    "t_bigram_lm" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |bi AS (SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |  FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) r
        |  WHERE i <= len(toks) - 2),
        |pair AS (SELECT doc_id, w1, w2, count(*) AS kc FROM bi GROUP BY 1, 2, 3),
        |model AS (SELECT w1, w2, CAST(sum(kc) AS BIGINT) AS c12
        |  FROM pair GROUP BY 1, 2),
        |lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM model GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT unnest(toks) AS w FROM t)),
        |sc AS (SELECT p.doc_id, CAST(sum(p.kc) AS BIGINT) AS n_bigrams,
        |  round(sum(CAST(p.kc AS DOUBLE) *
        |      -ln((CAST(m.c12 AS DOUBLE) + 0.5) /
        |          (CAST(l.c1 AS DOUBLE) + 0.5 * CAST(vocab.v AS DOUBLE)))) /
        |    CAST(sum(p.kc) AS DOUBLE), 6) AS avg_nll
        |  FROM pair p
        |  JOIN model m ON m.w1 = p.w1 AND m.w2 = p.w2
        |  JOIN lft l ON l.w1 = p.w1, vocab
        |  GROUP BY p.doc_id)
        |SELECT doc_id, n_bigrams, avg_nll, round(exp(avg_nll), 6) AS ppl
        |FROM sc""".stripMargin,

    "t_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |  concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS s
        |  FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) r
        |  WHERE i <= len(toks) - 3),
        |c AS (SELECT doc_id, s, count(*) AS cnt FROM sh GROUP BY doc_id, s)
        |SELECT doc_id,
        | CAST(sum(cnt) AS BIGINT) AS n_shingles,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | CAST(1.0 AS DOUBLE) -
        |   CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS rep_ratio,
        | CAST(max(cnt) AS BIGINT) AS max_repeat
        |FROM c GROUP BY doc_id""".stripMargin,

    "t_redact" -> {
      val email = TextAnalysis.EmailRe
      val num = TextAnalysis.LongNumRe
      s"""WITH d AS (SELECT doc_id,
         |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |  '@mail.example.com ref ' || CAST((doc_id + 7) * 123457 AS VARCHAR) AS text
         |  FROM documents),
         |ne AS (SELECT doc_id, text,
         |  regexp_replace(text, '$email', '<EMAIL>', 'g') AS no_email FROM d)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(no_email, '$num')) AS BIGINT) AS n_nums,
         |  regexp_replace(no_email, '$num', '<NUM>', 'g') AS clean_text
         |FROM ne""".stripMargin
    },

    "t_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
         |  (${H("CAST(doc_id AS VARCHAR)")} % 8) AS shard FROM documents),
         |c AS (SELECT doc_id, shard, n_tokens,
         |  CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id), 0) - n_tokens AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, shard, n_tokens,
         |  cum_before // 512 AS seq_id,
         |  cum_before % 512 AS seq_offset,
         |  (n_tokens > 0 AND (cum_before + n_tokens - 1) // 512 > cum_before // 512) AS spans_cut
         |FROM c""".stripMargin,

    "t_quality" -> {
      val stop = inList(markers.head._2)
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents)
         |SELECT doc_id,
         | CAST(len(toks) AS BIGINT) AS n_tokens,
         | CAST(length(array_to_string(toks, '')) AS DOUBLE) / len(toks) AS mean_token_len,
         | CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) / len(toks) AS stopword_ratio,
         | least(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / CAST(100.0 AS DOUBLE)) *
         |   (CAST(1.0 AS DOUBLE) - CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) / len(toks)) AS quality_score
         |FROM t""".stripMargin
    },

    "t_normalize" ->
      """SELECT doc_id, nfc_normalize(text) AS norm_text,
        |  nfc_normalize(text) <> text AS changed
        |FROM documents""".stripMargin,

    // same feature-hash + weight arithmetic via the portable hash60;
    // the LEFT JOIN emits the zero row for a token-free doc exactly as
    // the engine's empty-array aggregate does
    "t_classify" ->
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |u AS (SELECT doc_id, unnest(toks) AS g FROM t),
         |b AS (SELECT doc_id, toks[i+1] || ' ' || toks[i+2] AS g
         |  FROM t, (SELECT unnest(range((SELECT COALESCE(max(len(toks)), 0) FROM t))) AS i) r
         |  WHERE i <= len(toks) - 2),
         |f AS (SELECT * FROM u UNION ALL SELECT * FROM b),
         |w AS (SELECT doc_id,
         |  (${H(s"concat('clfw|', CAST((${H("concat('clf|', g)")} % 4096) AS VARCHAR))")} % 2001) - 1000 AS wt
         |  FROM f),
         |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(wt) AS BIGINT) AS sc FROM w GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(s.n, 0) AS n_feats,
         |  COALESCE(s.sc, 0) AS score, COALESCE(s.sc, 0) > 0 AS keep
         |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,

    "t_bpe" -> graft.text.Bpe.oracleSql(nMerges = 10),

    "t_c4" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lns
        |  FROM documents),
        |k AS (SELECT doc_id, text, lns,
        |  list_filter(lns, l ->
        |    len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
        |    AND (rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!'
        |         OR rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%"')) AS kept
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(lns) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(lower(text), '{') AS has_brace,
        |  (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
        |   AND NOT contains(lower(text), '{')) AS keep,
        |  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
        |FROM k""".stripMargin,

    "t_gopher" -> {
      val stopSum = TextAnalysis.GopherStopWords
        .map(w => s"CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         |  list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lns
         |  FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS nw,
         |  CAST(length(array_to_string(toks, '')) AS DOUBLE)
         |    / len(toks) AS mean_len,
         |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
         |    AS DOUBLE) / len(toks) AS alpha_ratio,
         |  (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
         |   + CAST((length(text) - length(replace(text, '...', ''))) // 3
         |     AS DOUBLE)) / len(toks) AS sym_ratio,
         |  CAST(len(lns) AS BIGINT) AS nl,
         |  CAST(len(list_filter(lns, l -> ltrim(l) LIKE '-%'
         |    OR ltrim(l) LIKE '*%')) AS DOUBLE) AS bullets,
         |  CAST(len(list_filter(lns, l -> rtrim(l) LIKE '%...'))
         |    AS DOUBLE) AS ellipses,
         |  ($stopSum) AS n_stop
         |  FROM t),
         |r AS (SELECT doc_id, nw,
         |  (nw >= 50 AND nw <= 100000) AS r_wordcount,
         |  (nw > 0 AND mean_len >= 3.0 AND mean_len <= 10.0) AS r_meanlen,
         |  (nw > 0 AND alpha_ratio >= 0.8) AS r_alpha,
         |  (nw > 0 AND sym_ratio < 0.1) AS r_symbol,
         |  (nl > 0 AND bullets / nl < 0.9) AS r_bullet,
         |  (nl > 0 AND ellipses / nl < 0.3) AS r_ellipsis,
         |  (n_stop >= 2) AS r_stopwords
         |  FROM m)
         |SELECT doc_id, nw AS n_words, r_wordcount, r_meanlen, r_alpha,
         |  r_symbol, r_bullet, r_ellipsis, r_stopwords,
         |  (r_wordcount AND r_meanlen AND r_alpha AND r_symbol
         |   AND r_bullet AND r_ellipsis AND r_stopwords) AS keep
         |FROM r""".stripMargin
    },

    "t_perplexity" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |pairs AS (SELECT doc_id, w, count(*) AS k FROM tk WHERE w <> ''
        |  GROUP BY doc_id, w),
        |vocab AS (SELECT w, CAST(sum(k) AS BIGINT) AS c FROM pairs GROUP BY w),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab),
        |agg AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
        |  round(sum(CAST(k AS DOUBLE) *
        |      -ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) /
        |    CAST(sum(k) AS DOUBLE), 6) AS avg_nll
        |  FROM pairs JOIN vocab USING (w) CROSS JOIN tot GROUP BY doc_id)
        |SELECT doc_id, n_tokens, avg_nll, round(exp(avg_nll), 6) AS ppl
        |FROM agg""".stripMargin,

    "t_countmin" -> {
      val W = TextAnalysis.CmWidth
      def hs(i: Int, e: String) =
        s"${Hashing.hash60Sql(TextAnalysis.CmSeed + i, e)} % $W"
      val ctes = (0 until TextAnalysis.CmRows).map(i =>
        s"c$i AS (SELECT ${hs(i, "w")} AS b, count(*) AS cnt FROM tw GROUP BY 1)")
        .mkString(",\n")
      val joins = (0 until TextAnalysis.CmRows).map(i =>
        s"JOIN c$i x$i ON x$i.b = ${hs(i, "t.word")}").mkString("\n")
      val mins = (0 until TextAnalysis.CmRows).map(i => s"x$i.cnt").mkString(", ")
      s"""WITH tw AS (SELECT w FROM (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE w <> ''),
         |top AS (SELECT w AS word, count(*) AS exact_cnt FROM tw
         |  GROUP BY 1 ORDER BY exact_cnt DESC, word ASC LIMIT 20),
         |$ctes
         |SELECT t.word, t.exact_cnt, least($mins) AS cm_est
         |FROM top t
         |$joins""".stripMargin
    },

    // Float-literal discipline: every fractional constant is written
    // with an e0 suffix so DuckDB parses DOUBLE, not DECIMAL (decimal
    // arithmetic would diverge from Spark's double math), and compound
    // constants stay in operand form ((1.2e0 + 1.0e0), never 2.2e0) so
    // both engines fold the identical IEEE operations.
    "t_bm25" -> {
      val score =
        """ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
          |    / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0)
          |  * (CAST(tf AS DOUBLE) * (1.2e0 + 1.0e0))
          |  / (CAST(tf AS DOUBLE) + 1.2e0 * ((1.0e0 - 0.75e0)
          |     + 0.75e0 * (CAST(dl AS DOUBLE)
          |                 / (CAST(tot_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"""
          .stripMargin
      val termSums = Bm25Terms.map(t =>
        s"coalesce(sum(CASE WHEN w = '$t' THEN s END), 0.0e0) AS s_$t")
        .mkString(",\n  ")
      val total = Bm25Terms.map(t => s"s_$t").mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS tot_len FROM dl),
         |tf AS (SELECT doc_id, w, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS w FROM t)
         |  WHERE w IN (${inList(Bm25Terms)}) GROUP BY 1, 2),
         |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, tf.w,
         |  $score AS s
         |  FROM tf JOIN dfx USING (w) JOIN dl USING (doc_id) CROSS JOIN st),
         |px AS (SELECT doc_id,
         |  $termSums
         |  FROM sc GROUP BY 1)
         |SELECT doc_id, round($total, 6) AS bm25 FROM px""".stripMargin
    },

    "t_tokens" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS ws_tokens,
        | CAST(ceil(CAST(length(text) AS DOUBLE) / CAST(4.0 AS DOUBLE)) AS BIGINT) AS bpe_est
        |FROM documents""".stripMargin,

    // range(0, n, 48) (exclusive stop) replays Spark's
    // sequence(0, n-1, 48) (inclusive stop) start set exactly;
    // list_slice clamps at the list end like Spark's slice.
    "t_chunk" ->
      s"""WITH d AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |st AS (SELECT doc_id, toks,
         |  unnest(range(0, len(toks), 48)) AS start
         |  FROM d WHERE len(toks) > 0)
         |SELECT doc_id,
         |  CAST(start // 48 AS BIGINT) AS chunk_idx,
         |  CAST(start AS BIGINT) AS start_tok,
         |  CAST(least(64, len(toks) - start) AS BIGINT) AS n_chunk_tokens,
         |  ${H("array_to_string(list_slice(toks, start + 1, start + 64), ' ')")}
         |    AS chunk_hash
         |FROM st""".stripMargin,

    "t_winnow" ->
      s"""WITH $WinnowCtes,
         |np AS (SELECT doc_id, count(*) AS n_positions FROM g GROUP BY 1)
         |SELECT f.doc_id, np.n_positions, count(*) AS n_fps,
         |  CAST(floor(count(*) * 1000000 / np.n_positions) AS BIGINT)
         |    AS density_x1e6,
         |  CAST(sum(f.h % 2147483647) AS BIGINT) AS fp_checksum
         |FROM fps f JOIN np USING (doc_id)
         |GROUP BY f.doc_id, np.n_positions""".stripMargin,

    // engine path is the banded per-fingerprint join; the oracle is the
    // same selection expressed as the straightforward self-join
    "d_winnow" ->
      s"""WITH $WinnowCtes,
         |fp2 AS (SELECT DISTINCT doc_id, h FROM fps),
         |ok AS (SELECT h FROM fp2 GROUP BY h HAVING count(*) <= 64),
         |fpo AS (SELECT f.doc_id, f.h FROM fp2 f JOIN ok USING (h))
         |SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared_fps
         |FROM fpo x JOIN fpo y ON x.h = y.h AND x.doc_id < y.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "t_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |sh AS (SELECT doc_id,
         |  concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS s
         |  FROM t, (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) r
         |  WHERE i <= len(toks) - 3),
         |m AS (SELECT doc_id, min(${H("s")}) AS min_shingle_fp FROM sh GROUP BY doc_id)
         |SELECT d.doc_id, ${H("d.text")} AS fp,
         |  ${H("substr(d.text, 1, 64)")} AS prefix_fp,
         |  m.min_shingle_fp
         |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id""".stripMargin
  )
}
