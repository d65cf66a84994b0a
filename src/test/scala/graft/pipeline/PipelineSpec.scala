package graft.pipeline

import graft.testkit.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely unrelated content here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "shrt")) // too short for 3-gram shingles
    .toDF("doc_id", "text")

  test("PMI collocations: adjacent pairs only, exact formula, minCount cut") {
    val corpus = Seq("new york new york", "new york", "of new", "of new",
      "of of").toDF("text")
    val got = TextAnalysis.pmiCollocations(corpus, col("text"),
      minCount = 2, topN = 3).as[(String, String, Long, Double)].collect()
    // bigrams: (new,york)=3 (york,new)=1 (of,new)=2 (of,of)=1 → B=7
    // unigrams: new=5 york=3 of=4 → N=12; minCount=2 keeps two pairs
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq(("new", "york", 3L), ("of", "new", 2L)))
    val pNy = math.log(((3.0 * 12) * 12) / ((7.0 * 5) * 3))
    val pOn = math.log(((2.0 * 12) * 12) / ((7.0 * 4) * 5))
    assert(math.abs(got(0)._4 - pNy) < 1e-9)
    assert(math.abs(got(1)._4 - pOn) < 1e-9)
  }

  test("bigram LM: add-k smoothed NLL matches hand computation") {
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogLoss(corpus, col("doc_id"), col("text"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // bigrams: doc1 (a,b)(b,a)(a,b), doc2 (a,b) → model c(a,b)=3 c(b,a)=1
    // left: c(a,·)=3 c(b,·)=1; vocab V=3 (a, b, x); k=0.5
    val pAb = (3.0 + 0.5) / (3.0 + 0.5 * 3)
    val pBa = (1.0 + 0.5) / (1.0 + 0.5 * 3)
    val d1 = (2 * -math.log(pAb) + -math.log(pBa)) / 3.0
    val d2 = -math.log(pAb)
    assert(got.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 has no bigram
    assert(got(0)._2 === 3L && math.abs(got(0)._3 - d1) < 1e-6)
    assert(got(1)._2 === 1L && math.abs(got(1)._3 - d2) < 1e-6)
    assert(math.abs(got(0)._4 - math.exp(got(0)._3)) < 1e-5)
  }

  test("exact dedup groups identical texts") {
    val g = Dedup.exact(docs, col("doc_id"), col("text"))
    val dup = g.where(col("cnt") === 2).collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("keeper_id") == 1L)
    assert(g.count() == 4) // 4 distinct contents
  }

  test("minhash LSH surfaces exact and near dups, not the unrelated doc") {
    val pairs = Dedup.minHashCandidates(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    assert(pairs((1L, 4L)), "exact dup must collide in every band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc should not be a candidate")
  }

  test("row-local minhash signature equals the batch aggregate") {
    val batch = Dedup.minHashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i))).toMap
    val rowWise = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.baseHashes(col("toks")).as("xs"))
      .where(size(col("xs")) > 0)
      .select(col("doc_id") +: Dedup.rowSignature(col("xs")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i))).toMap
    assert(rowWise == batch)
  }

  test("minhash estimates jaccard: identical docs agree on all hashes") {
    val sig = Dedup.minHashSignatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i))).toMap
    assert(sig(1L) == sig(4L))
    assert(sig(1L) != sig(3L))
    assert(!sig.contains(5L), "sub-shingle-length doc yields no signature")
  }

  test("simhash: identical docs equal, near-dups within small hamming distance") {
    val sh = Dedup.simHash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(near <= Dedup.SimHashBits / 3, s"near-dup hamming $near too large")
    assert(near < far, "near-dup must be closer than the unrelated doc")
  }

  test("simhash fails loudly past the packed-counter token ceiling") {
    // 2^20 tokens would overflow a 20-bit counter slot; the guard must
    // raise instead of silently carrying into the neighboring counter.
    val big = Seq((1L, ("w " * (1 << 20)).trim)).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.simHash(big, col("doc_id"), col("text")).collect()
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("simHash counter overflow"))
  }

  test("simhash near-pair probe expansion equals all-pairs hamming filter") {
    val sh = Dedup.simHash(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 2
    } yield (a, b)).toSet
    val got = Dedup.simHashNearPairs(docs, col("doc_id"), col("text"), maxDist = 2)
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got((1L, 4L)), "exact dup pair must be present")
  }

  test("minhash scored candidates: exact dup scores 1.0, others below") {
    val scored = Dedup.minHashScored(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(scored((1L, 4L)) == 1.0)
    assert(scored.filterNot(_._1 == (1L, 4L)).values.forall(_ < 1.0))
  }

  test("ngram jaccard: exact dup 1.0, near dup high, disjoint 0") {
    val pairs = Seq((1L, 4L), (1L, 2L), (1L, 3L)).toDF("a", "b")
    val j = Dedup.ngramJaccard(docs, col("doc_id"), col("text"), pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 2L)) > 0.7 && j((1L, 2L)) < 1.0)
    assert(j((1L, 3L)) == 0.0)
  }

  test("redact scrubs emails then digit runs, with per-doc counts") {
    val d = Seq(
      (1L, "mail me at jane.doe+x@corp.example.com or call 5551234567"),
      (2L, "short num 12345 survives, 123456 does not"),
      (3L, "no pii here")).toDF("doc_id", "text")
    val r = TextAnalysis.redact(d, col("doc_id"), col("text"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) == ((1L, 1L, "mail me at <EMAIL> or call <NUM>")))
    assert(r(2L) == ((0L, 1L, "short num 12345 survives, <NUM> does not")))
    assert(r(3L) == ((0L, 0L, "no pii here")))
  }

  test("packSequences chunks each shard's doc_id-ordered token stream") {
    val d = Seq.tabulate(12)(i => (i.toLong, Seq.fill(300)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val p = TextAnalysis.packSequences(d, col("doc_id"), col("text"),
        budget = 512L, nShards = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(p.size == 12)
    // per shard: docs in doc_id order, 300 tokens each, cut every 512
    p.groupBy(_._2._1).foreach { case (_, docsInShard) =>
      val ordered = docsInShard.toSeq.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (_, (_, ntok, seqId, off, spans)) =>
        assert(ntok == 300L)
        assert(seqId == cum / 512 && off == cum % 512)
        assert(spans == ((cum + 299) / 512 > cum / 512))
        cum += 300
      }
    }
  }

  test("repetition flags duplicate 3-grams; short docs emit no row") {
    val d = Seq(
      (1L, "a b c a b c a b c"),     // "a b c" ×3 among repeats
      (2L, "all distinct words here no repeats at all ok"),
      (3L, "x y")).toDF("doc_id", "text") // < 3 tokens -> no shingles
    val r = TextAnalysis.repetition(d, col("doc_id"), col("text"))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4))).toMap
    assert(!r.contains(3L))
    assert(r(2L)._3 == 0.0 && r(2L)._4 == 1L)
    // doc 1: 7 shingles, 3 distinct ("a b c","b c a","c a b") -> 4/7 repeated
    assert(r(1L) == ((7L, 3L, 1.0 - 3.0 / 7.0, 3L)))
  }

  test("int8 quantization: codes stay in [-127,127], stats match by hand") {
    val d = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(d, col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // scale = 1/127; codes = [127, -63, 32, 0] (round-half-up)
    assert(q(1L) == ((1.0 / 127.0, 4L, 96L, 222L, -63L, 127L)))
    // all-zero vector: scale 0, all codes 0
    assert(q(2L) == ((0.0, 2L, 0L, 0L, 0L, 0L)))
  }

  test("random projection: exact driver replica, partition invariance, geometry") {
    val rnd = new scala.util.Random(59)
    val dim = 24
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val outDim = 16
    val got = Similarity.randomProject(df, dim, outDim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact driver-side replica of the fold (same order, same literals)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    for ((id, emb) <- vecs; k <- 0 until outDim) {
      var acc = 0.0
      for (j <- 0 until dim) acc += emb(j).toDouble * Similarity.projWeight(k, j)
      val want = math.rint(acc * scale * 1e6) / 1e6
      assert(got((id, k.toLong)) == want, s"($id,$k): ${got((id, k.toLong))} vs $want")
    }
    // partitioning must not change a single bit
    val b = Similarity.randomProject(df.repartition(7), dim, outDim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == b)
    // J-L geometry: squared norms are preserved on average (loose bound)
    val ratios = vecs.map { case (id, emb) =>
      val orig = emb.map(x => x.toDouble * x).sum
      val proj = (0 until outDim).map(k => got((id, k.toLong))).map(v => v * v).sum
      proj / orig
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"norm ratio mean $mean off")
  }

  test("brute-force ANN finds the nearest vector and honors k + ranking") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
      (4L, Array(0.95f, 0.05f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Similarity.bruteForceTopK(q, vecs, 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(top.toSeq == Seq(4L, 1L))
  }

  test("LSH buckets put near-identical vectors together") {
    val vecs = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Array.fill(8)(1.0f) else Array.fill(8)(-1.0f)
      base(i % 8) += (i * 0.001f)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(vecs, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(2L), "same-direction vectors share a bucket")
    assert(b(0L) != b(1L), "opposite vectors land in different buckets")
  }

  test("multi-table LSH top-k: OR-amplification recovers brute-force recall") {
    val rnd = new scala.util.Random(11)
    // 5 clusters of 8 vectors: near-neighbors are in-cluster by construction.
    val vecs = (0 until 40).map { i =>
      val center = Array.tabulate(8)(j => if (j == i % 5) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val q = vecs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val bf = pairSet(Similarity.bruteForceTopK(q, vecs, 3))
    val multi = pairSet(Similarity.lshTopK(vecs, dim = 8, k = 3, planes = 4, tables = 4))
    val single = pairSet(Similarity.lshTopK(vecs, dim = 8, k = 3, planes = 4, tables = 1))
    val recallMulti = (bf & multi).size.toDouble / bf.size
    val recallSingle = (bf & single).size.toDouble / bf.size
    assert(recallMulti >= recallSingle,
      s"OR-amplification must not lose recall ($recallMulti < $recallSingle)")
    assert(recallMulti >= 0.6, s"multi-table recall $recallMulti too low")
  }

  test("IVF top-k: probing more lists recovers brute-force recall") {
    val rnd = new scala.util.Random(23)
    // 5 clusters of 8 vectors: near-neighbors are in-cluster by construction.
    val vecs = (0 until 40).map { i =>
      val center = Array.tabulate(8)(j => if (j == i % 5) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val q = vecs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val bf = pairSet(Similarity.bruteForceTopK(q, vecs, 3))
    val wide = pairSet(Similarity.ivfTopK(vecs, k = 3, nlist = 8, nprobe = 4))
    val narrow = pairSet(Similarity.ivfTopK(vecs, k = 3, nlist = 8, nprobe = 1))
    val recallWide = (bf & wide).size.toDouble / bf.size
    val recallNarrow = (bf & narrow).size.toDouble / bf.size
    assert(recallWide >= recallNarrow,
      s"more probes must not lose recall ($recallWide < $recallNarrow)")
    assert(recallWide >= 0.6, s"IVF nprobe=4 recall $recallWide too low")
  }

  test("stratified sampling is deterministic, partitioning-independent, and rate-true") {
    val df = spark.range(4000).select(col("id"), (col("id") % 3).cast("string").as("st"))
    def sample(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratified(d, col("id"), col("st"),
        Map("0" -> 0.2), default = 0.7, seed = 7L)
        .select("id").as[Long].collect().toSet
    val s1 = sample(df)
    val s2 = sample(df.repartition(17)) // different partitioning, same rows
    assert(s1 == s2)
    val zeroRate = s1.count(_ % 3 == 0).toDouble / (4000 / 3)
    val otherRate = s1.count(_ % 3 != 0).toDouble / (4000 * 2 / 3)
    assert(math.abs(zeroRate - 0.2) < 0.05, s"stratum-0 rate $zeroRate")
    assert(math.abs(otherRate - 0.7) < 0.05, s"default rate $otherRate")
  }

  test("LSH bucket cap drops oversized buckets explicitly and reports them") {
    // 6 identical docs share every band bucket (size 6); 2 near-dups
    // share theirs (size 2). Cap at 4: the big bucket's 15 pairs vanish,
    // the small one's pair survives, and the report counts the drops.
    val docs = ((0 until 6).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta")) ++
      Seq((10L, "one two three four five six seven"),
          (11L, "one two three four five six seven"))).toDF("doc_id", "text")
    val sig = Dedup.minHashSignatures(docs, col("doc_id"), col("text"))
    val uncapped = Dedup.candidatesFromSignatures(sig).count()
    val capped = Dedup.candidatesFromSignatures(sig, maxBucket = 4)
      .as[(Long, Long)].collect().toSet
    assert(uncapped == 16L) // C(6,2) + 1
    assert(capped == Set((10L, 11L)))
    assert(Dedup.oversizedBuckets(sig, maxBucket = 4) == Dedup.numBands.toLong)
  }

  test("IVF k-means refinement does not degrade assignment quality") {
    val rnd = new scala.util.Random(29)
    val vecs = (0 until 40).map { i =>
      val center = Array.tabulate(8)(j => if (j == i % 5) 1.0f else 0.0f)
      (i.toLong, center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    def quality(cents: org.apache.spark.sql.DataFrame): Double =
      vecs.crossJoin(broadcast(cents))
        .groupBy("vec_id")
        .agg(max(Similarity.cosine(col("embedding"), col("cvec"))).as("best"))
        .agg(avg("best")).head().getDouble(0)
    val seeded = quality(Similarity.ivfCentroids(vecs, nlist = 5))
    val trained = quality(Similarity.ivfTrain(vecs, nlist = 5, iters = 3))
    assert(trained >= seeded - 1e-9,
      s"spherical k-means must not degrade assignment cosine ($trained < $seeded)")
  }

  test("multimodal: typed mapPartitions decode equals declarative metadata path") {
    val typed = Multimodal.extractFeatures(spark, docs)
      .select("doc_id", "byte_len", "width", "height", "channels")
    val sql = Multimodal.featuresSql(docs)
    assert(typed.except(sql).isEmpty && sql.except(typed).isEmpty)
  }

  test("multimodal: imageio decoder reads real PNG dims, stub-falls-back otherwise") {
    // a real 7x5 RGB PNG encoded by the same JDK codec the decoder uses
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 2, 0xff8800)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    assert(Multimodal.ImageIODecoder.decode(png) == ((7, 5, 3)))
    // undecodable bytes: identical to the deterministic stub
    val junk = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.ImageIODecoder.decode(junk) ==
      Multimodal.StubDecoder.decode(junk))
    // the conf flag routes the whole typed pass through imageio; on the
    // synthetic UTF-8 payloads every row falls back to stub values, so
    // the two passes must be identical frame-wide
    spark.conf.set("spark.graft.media.decoder", "imageio")
    try {
      val viaFlag = Multimodal.extractFeatures(spark, docs)
      spark.conf.set("spark.graft.media.decoder", "stub")
      val viaStub = Multimodal.extractFeatures(spark, docs)
      assert(viaFlag.except(viaStub).isEmpty && viaStub.except(viaFlag).isEmpty)
    } finally spark.conf.unset("spark.graft.media.decoder")
  }

  test("gopher rules fire on the right documents") {
    val good = (("the quick brown fox jumps right over a lazy dog and " +
      "that hound will have gone to sleep with all of them around ") * 3).trim
    val d = Seq(
      (1L, good),                                     // passes everything
      (2L, "short text only"),                        // fails r_wordcount/r_stopwords
      (3L, ("#tag " * 60).trim),                      // hash spam: fails r_symbol
      (4L, (1 to 60).map(i => s"- bullet $i line").mkString("\n")), // fails r_bullet
      (5L, ("supercalifragilisticexpialidocious " * 60).trim), // fails r_meanlen
      (6L, (1 to 60).map(_.toString).mkString(" ")))  // digits only: fails r_alpha
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(d, col("doc_id"), col("text"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("r_wordcount") && !r(2L).getAs[Boolean]("r_stopwords"))
    assert(!r(3L).getAs[Boolean]("r_symbol") && r(3L).getAs[Boolean]("r_alpha"))
    assert(!r(4L).getAs[Boolean]("r_bullet") && !r(4L).getAs[Boolean]("keep"))
    assert(!r(5L).getAs[Boolean]("r_meanlen"))
    assert(r(5L).getAs[Boolean]("r_wordcount")) // 60 words is in range
    assert(!r(6L).getAs[Boolean]("r_alpha"))
  }

  test("scd2 merge closes changed versions, appends new, ignores idempotent") {
    val dim = Seq(
      (1L, "alpha", 0L, Scd2.OpenTs),
      (2L, "beta", 0L, Scd2.OpenTs),
      (3L, "gamma-old", 0L, 50L),       // closed history row
      (3L, "gamma", 50L, Scd2.OpenTs))
      .toDF("doc_id", "text", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "alpha-v2"), // changed -> close + append
      (2L, "beta"),     // identical -> idempotent no-op
      (9L, "new-doc"))  // brand new key
      .toDF("doc_id", "text")
    val out = Scd2.merge(dim, updates, "doc_id", Seq("text"), ts = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, "alpha", 0L, 100L),
      (1L, "alpha-v2", 100L, Scd2.OpenTs),
      (2L, "beta", 0L, Scd2.OpenTs),
      (3L, "gamma-old", 0L, 50L),
      (3L, "gamma", 50L, Scd2.OpenTs),
      (9L, "new-doc", 100L, Scd2.OpenTs)))
    // point-in-time views
    val merged = Scd2.merge(dim, updates, "doc_id", Seq("text"), ts = 100L)
    val at75 = Scd2.snapshot(merged, 75L)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at75 == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    val at100 = Scd2.snapshot(merged, 100L)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at100 == Set((1L, "alpha-v2"), (2L, "beta"), (3L, "gamma"), (9L, "new-doc")))
  }

  test("scd2 merge refuses an out-of-order batch with the offending key") {
    val dim = Seq(
      (1L, "alpha", 0L, Scd2.OpenTs),
      (3L, "gamma", 50L, Scd2.OpenTs))
      .toDF("doc_id", "text", "valid_from", "valid_to")
    // ts=50 is NOT after key 3's open valid_from=50 -> guard must fire
    val bad = Scd2.merge(dim, Seq((3L, "gamma-v2")).toDF("doc_id", "text"),
      "doc_id", Seq("text"), ts = 50L)
    val e = intercept[Exception](bad.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("out-of-order") && m.contains("key 3")))
    // ...but an unaffected in-order key on the same frame still merges
    val ok = Scd2.merge(dim, Seq((1L, "alpha-v2")).toDF("doc_id", "text"),
      "doc_id", Seq("text"), ts = 50L).collect()
    assert(ok.length == 3)
  }

  test("scd2 asOfJoin picks each fact's own covering version") {
    val dim = Seq(
      (1L, "a1", 0L, 100L), (1L, "a2", 100L, Scd2.OpenTs),
      (2L, "b1", 0L, Scd2.OpenTs),
      (3L, "c1", 80L, Scd2.OpenTs))  // no version before 80
      .toDF("doc_id", "text", "valid_from", "valid_to")
    val facts = Seq(
      (1L, 99L), (1L, 100L),   // straddle the version boundary
      (2L, 0L),                // inclusive lower bound
      (3L, 10L),               // before the key's first version -> no match
      (9L, 50L))               // unknown key -> no match
      .toDF("doc_id", "probe_ts")
    val out = Scd2.asOfJoin(facts, dim, "doc_id", "probe_ts")
      .select("doc_id", "probe_ts", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 99L, "a1"), (1L, 100L, "a2"), (2L, 0L, "b1")))
  }

  test("scd2 mergeLate splits the covering version, prepends, and is idempotent") {
    val dim = Seq(
      (1L, "a1", 0L, 100L),             // closed: will split around t=50
      (1L, "a2", 100L, Scd2.OpenTs),
      (2L, "b1", 0L, Scd2.OpenTs),      // open: will split around t=50
      (3L, "c1", 80L, Scd2.OpenTs),     // first version AFTER ts -> prepend
      (4L, "d1", 0L, Scd2.OpenTs))      // untouched (no update)
      .toDF("doc_id", "text", "valid_from", "valid_to")
    val late = Seq(
      (1L, "a1-late"), (2L, "b1-late"), (3L, "c0"), (9L, "n0"))
      .toDF("doc_id", "text")
    val expected = Set(
      (1L, "a1", 0L, 50L), (1L, "a1-late", 50L, 100L), (1L, "a2", 100L, Scd2.OpenTs),
      (2L, "b1", 0L, 50L), (2L, "b1-late", 50L, Scd2.OpenTs),
      (3L, "c0", 50L, 80L), (3L, "c1", 80L, Scd2.OpenTs),
      (4L, "d1", 0L, Scd2.OpenTs),
      (9L, "n0", 50L, Scd2.OpenTs))
    val once = Scd2.mergeLate(dim, late, "doc_id", Seq("text"), ts = 50L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(once) == expected)
    // re-delivering the same late batch is a no-op (covering versions now
    // carry the late payload; the prepend window is closed)
    assert(rows(Scd2.mergeLate(once, late, "doc_id", Seq("text"), ts = 50L))
      == expected)
  }

  test("c4 rules keep punctuated prose lines and flag code/lorem pages") {
    val prose = "The quick brown fox jumps over the lazy sleeping dog."
    val d = Seq(
      (1L, Seq(prose, prose, prose, "- nav", "short one.").mkString("\n")),
      (2L, Seq(prose, prose, prose, "function f() { return 1; }").mkString("\n")),
      (3L, "Lorem ipsum dolor sit amet, consectetur adipiscing elit.\n" +
        prose + "\n" + prose + "\n" + prose),
      (4L, Seq(prose, "no punctuation here at all").mkString("\n")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.c4Rules(d, col("doc_id"), col("text"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 1: 3 prose lines survive ("- nav" too few words; "short one."
    // only 2 words), page kept
    assert(r(1L).getAs[Long]("n_kept_lines") == 3L && r(1L).getAs[Boolean]("keep"))
    assert(r(1L).getAs[String]("clean_text") == Seq(prose, prose, prose).mkString("\n"))
    // doc 2: brace page dropped despite 3 good lines
    assert(r(2L).getAs[Boolean]("has_brace") && !r(2L).getAs[Boolean]("keep"))
    // doc 3: lorem page dropped
    assert(r(3L).getAs[Boolean]("has_lorem") && !r(3L).getAs[Boolean]("keep"))
    // doc 4: only 1 kept line -> below the 3-line page minimum
    assert(r(4L).getAs[Long]("n_kept_lines") == 1L && !r(4L).getAs[Boolean]("keep"))
  }

  test("langid picks the marker-dominant language") {
    val d = Seq(
      (1L, "the cat and the dog is a friend of mine"),
      (2L, "der hund und die katze ist das haus"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val m = TextAnalysis.langId(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("incremental exact dedup drops digests seen in the existing corpus") {
    val existing = docs.where(col("doc_id") === 1L)
    val fresh = docs.where(col("doc_id") =!= 1L)
    val kept = Dedup.exactIncremental(fresh, existing, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 5L)) // 4 is an exact dup of existing doc 1
  }

  test("decontaminate flags the docs sharing n-grams with the benchmark") {
    val bench = docs.where(col("doc_id") === 1L)
    val train = docs.where(col("doc_id") =!= 1L)
    val out = Dedup.decontaminate(train, bench, col("doc_id"), col("text"), n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 4 is an exact dup (all 7 shingles), doc 2 differs in the last
    // word (6 of 7 shingles); docs 3 (disjoint) and 5 (too short) are clean
    assert(out == Map(4L -> 7L, 2L -> 6L))
  }

  test("unigram log-loss matches hand-computed probabilities") {
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // corpus: a->2, b->2, c->1, N=5
    val out = TextAnalysis.unigramLogLoss(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_nll"), r.getAs[Double]("ppl")))).toMap
    val nll1 = -math.log(2.0 / 5.0)                          // all tokens p=2/5
    val nll2 = (-math.log(2.0 / 5.0) - math.log(1.0 / 5.0)) / 2.0
    assert(out(1L)._1 == 3L && out(2L)._1 == 2L)
    assert(math.abs(out(1L)._2 - nll1) < 1e-6)
    assert(math.abs(out(2L)._2 - nll2) < 1e-6)
    assert(math.abs(out(2L)._3 - math.exp(out(2L)._2)) < 1e-5)
  }

  test("PQ ADC ranks an exact duplicate vector first; codes stay in range") {
    val rnd = new scala.util.Random(5)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
    val vecs = (base :+ ((40L, base.head._2))).toDF("vec_id", "embedding")
    // vec 40 duplicates vec 0 -> identical codes -> the minimum possible
    // ADC distance for each other (encode argmin == the query's own
    // distance-table argmin per subspace)
    val top1 = Similarity.pqTopK(vecs, dim = 16, k = 1, subspaces = 4, codewords = 8)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    assert(top1(0L) == 40L && top1(40L) == 0L)
    val cb = Similarity.pqCodebook(vecs, dim = 16, subspaces = 4, codewords = 8)
    val codes = Similarity.pqEncode(vecs, cb, dim = 16, subspaces = 4)
    assert(codes.count() == 41L * 4)
    val r = codes.agg(min("code"), max("code")).head()
    assert(r.getInt(0) >= 0 && r.getInt(1) < 8)
  }

  test("IVF-PQ: duplicate vectors find each other; recall tracks brute force") {
    val rnd = new scala.util.Random(41)
    // 4 well-separated clusters of 10; vec 40 duplicates vec 0, so they
    // share a list, share residual codes, and must be each other's top-1
    // (ADC distance to an identical code vector is the per-subspace
    // minimum by the encode argmin).
    val base = (0 until 40).map { i =>
      val center = Array.tabulate(16)(j => if (j == i % 4) 3.0f else 0.0f)
      (i.toLong, center.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val vecs = (base :+ ((40L, base.head._2))).toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(vecs, dim = 16, k = 3,
      nlist = 8, nprobe = 4, subspaces = 4, codewords = 16)
    val top1 = out.where(col("rank") === 1)
      .select("qid", "vec_id").as[(Long, Long)].collect().toMap
    assert(top1(0L) == 40L && top1(40L) == 0L)
    // recall@3 vs exact cosine: clusters are far apart, so probing 4 of
    // 8 lists with residual-coded distances must stay mostly faithful
    val q = vecs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val bf = pairSet(Similarity.bruteForceTopK(q, vecs, 3))
    val ivfpq = pairSet(out)
    val recall = (bf & ivfpq).size.toDouble / bf.size
    assert(recall >= 0.6, s"IVF-PQ recall@3 $recall too low")
    // determinism: a re-run (different partitioning) is identical
    val again = pairSet(Similarity.ivfPqTopK(vecs.repartition(7), dim = 16,
      k = 3, nlist = 8, nprobe = 4, subspaces = 4, codewords = 16))
    assert(again == ivfpq)
  }

  test("token-budget mixture keeps listed domains at mass-derived rates") {
    val d = (1L to 4L).map(i =>
      (i, if (i <= 2) "a" else "b", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))
      .toDF("doc_id", "dom", "text") // 10 tokens each; mass(a)=mass(b)=20
    def mix(budget: Long) = Sampling.tokenBudgetMixture(
      d, col("doc_id"), col("text"), col("dom"),
      shares = Map("a" -> 1.0), totalBudget = budget, seed = 7L)
    // share(b)=0 -> b never appears; rate caps at 1.0 -> all of a kept
    val all = mix(100L).collect()
    assert(all.length == 2 && all.forall(r => r.getAs[String]("domain") == "a"
      && r.getAs[Double]("keep_rate") == 1.0 && r.getAs[Long]("n_tokens") == 10L))
    // half the budget -> rate 0.5, and the same run twice keeps the same rows
    val half = mix(10L)
    assert(half.head().getAs[Double]("keep_rate") == 0.5)
    val ids = half.select("doc_id").as[Long].collect().toSet
    assert(ids == mix(10L).select("doc_id").as[Long].collect().toSet)
    assert(ids.subsetOf(Set(1L, 2L)))
  }

  test("substring-span stats: union coverage, left-join zeros, short docs") {
    // width-8 windows over the shared fixture: docs 1/2/4 share the
    // window at pos 0; docs 1/4 also share pos 1; docs 3 (unique
    // window) and 5 (too short for any window) must report zeros.
    val out = Dedup.substrSpanStats(docs, col("doc_id"), col("text"), k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("n_dup_tokens"), r.getAs[Double]("dup_frac")))).toMap
    assert(out(1L) == ((9L, 2L, 9L, 1.0)))      // spans at 0 and 1 union to all 9 tokens
    assert(out(2L) == ((9L, 1L, 8L, 8.0 / 9.0))) // only pos 0 duplicated -> tokens 0-7
    assert(out(4L) == out(1L))                  // exact dup of doc 1
    assert(out(3L) == ((8L, 0L, 0L, 0.0)))
    assert(out(5L) == ((1L, 0L, 0L, 0.0)))
  }

  test("substring-span stats count WITHIN-document duplicated spans too") {
    // one doc repeating its own 8-token window (internal boilerplate,
    // the case ExactSubstr exists for) plus an unrelated clean doc
    val d = Seq(
      (1L, "a b c d e f g h a b c d e f g h"),
      (2L, "p q r s t u v w x y")).toDF("doc_id", "text")
    val out = Dedup.substrSpanStats(d, col("doc_id"), col("text"), k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("n_dup_tokens"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(out(1L) == ((2L, 16L, 1.0)),
      s"self-repeated window must flag both occurrences, got ${out(1L)}")
    assert(out(2L) == ((0L, 0L, 0.0)))
  }

  test("bm25 matches the formula by hand and skips term-free docs") {
    val d = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c"), (4L, "b b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(d, col("doc_id"), col("text"), Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (k1, b) = (1.2, 0.75)
    val avgdl = 10.0 / 4
    def s(tf: Long, df: Long, dl: Long): Double =
      math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0) * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(!out.contains(4L), "doc without query terms must be absent")
    assert(out(1L) == r6(s(2, 1, 3)))          // only 'a'
    assert(out(2L) == r6(s(1, 2, 2)))          // only 'c'
    assert(out(3L) == r6(s(3, 2, 3)))
  }

  test("weighted sample: deterministic, partition-independent, favors weight") {
    val rows = (1L to 1000L).map(i => (i, if (i <= 500) 20L else 1L)).toDF("id", "w")
    def draw(parts: Int) = Sampling.weightedSample(
        rows.repartition(parts), col("id"), col("w"), k = 100, seed = 3L)
      .select("id").as[Long].collect().toSet
    val a = draw(1); val b = draw(7)
    assert(a == b, "sample must not depend on partitioning")
    assert(a.size == 100)
    val heavy = a.count(_ <= 500)
    assert(heavy > 80, s"20x-weighted half got only $heavy of 100 slots")
    // k >= population keeps every positive-weight row
    val small = Seq((1L, 5L), (2L, 0L), (3L, 1L)).toDF("id", "w")
    val all = Sampling.weightedSample(small, col("id"), col("w"), 10, 3L)
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 3L), "zero-weight rows never sampled; rest all kept")
  }

  test("semantic dedup prunes the higher-id exact duplicate only") {
    val rnd = new scala.util.Random(9)
    val base = (0 until 30).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
    // vec 30 duplicates vec 7; all others are random (cosine ~0.75 on
    // random positive vectors, far below tau=0.99)
    val vecs = (base :+ ((30L, base(7)._2))).toDF("vec_id", "embedding")
    val pruned = Similarity.semDedupPrune(vecs, nlist = 4, tau = 0.99)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_similar"), r.getAs[Double]("max_sim")))).toMap
    assert(pruned.keySet == Set(30L), s"expected only the duplicate, got $pruned")
    assert(pruned(30L) == ((1L, 1.0)))
  }

  test("dsir weights favor target-like docs; short docs score zero") {
    val raw = Seq(
      (1L, "alpha beta alpha beta"), // matches target bigrams
      (2L, "gamma delta gamma delta"), // matches nothing in target
      (3L, "alpha beta gamma delta"), // half-match
      (4L, "solo")) // no bigram
      .toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val w = Sampling.dsirLogWeights(raw, target, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("logw")))).toMap
    assert(w(4L) == ((0L, 0.0)))
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2,
      s"expected target-likeness ordering, got $w")
    assert(w(1L)._1 == 3L && w(3L)._1 == 3L)
  }

  test("count-min estimates never undercount and match exact on this corpus") {
    val counters = TextAnalysis.countMinCounters(docs, col("text"))
    assert(counters.count() <= TextAnalysis.CmRows.toLong * TextAnalysis.CmWidth)
    // sketch mass conservation: each row's counters sum to the token count
    val totals = counters.groupBy("row").agg(sum("cnt").as("t"))
      .select("t").as[Long].collect().toSet
    val nTokens = docs.select(explode(TextAnalysis.tokens(col("text")))).count()
    assert(totals == Set(nTokens), s"row sums $totals != token count $nTokens")
    val words = docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("exact_cnt"))
    val est = TextAnalysis.countMinEstimate(counters, words)
      .collect().map(r => r.getAs[String]("word") ->
        ((r.getAs[Long]("exact_cnt"), r.getAs[Long]("cm_est")))).toMap
    est.foreach { case (w, (exact, cm)) =>
      assert(cm >= exact, s"count-min undercounted '$w': $cm < $exact")
    }
    // tiny distinct vocabulary vs 1024 buckets -> no collisions expected
    assert(est.values.forall { case (e, c) => e == c },
      "unexpected collision in a ~30-word vocabulary over 1024 buckets")
  }

  test("quality and token counts are consistent") {
    val q = TextAnalysis.quality(docs, col("doc_id"), col("text"))
      .where(col("doc_id") === 1).head()
    assert(q.getAs[Long]("n_tokens") == 9)
    val t = TextAnalysis.tokenCounts(docs, col("doc_id"), col("text"))
      .where(col("doc_id") === 5).head()
    assert(t.getAs[Long]("ws_tokens") == 1)
    assert(t.getAs[Long]("bpe_est") == 1) // ceil(4/4)
  }

  test("source overlap matrix matches hand-computed shingle sets") {
    // a: doc1 (7 trigrams, all distinct); b: doc2 = near-dup of doc1
    // (6 shared trigrams of 7); c: unrelated (no shared trigrams)
    val sdocs = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy cat"),
      ("c", "completely different words entirely unrelated content here now"))
      .toDF("source", "text")
    val got = Dedup.sourceOverlap(sdocs, col("source"), col("text"), n = 3)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set(("a", "b"))) // c shares nothing -> absent
    val (_, _, nA, nB, common, jac, cont) = got(("a", "b"))
    assert(nA == 7 && nB == 7 && common == 6)
    assert(jac == 6.0 / 8.0 && cont == 6.0 / 7.0)
  }

  test("segment dedup keeps first occurrence and reassembles in order") {
    // width 2: doc 1 = [ab][cd][ab] (trailing re-occurrence within one
    // doc), doc 2 = [ab][xy] (cross-doc dup of 1's first segment),
    // doc 3 = [cd] alone (dup of 1's middle), doc 4 unique odd tail
    val sdocs = Seq(
      (1L, "a b c d a b"),
      (2L, "a b x y"),
      (3L, "c d"),
      (4L, "p q r"))
      .toDF("doc_id", "text")
    val got = Dedup.segmentDedup(sdocs, col("doc_id"), col("text"), width = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((3L, 2L, "a b c d")))   // third segment "a b" deduped
    assert(got(2L) == ((2L, 1L, "x y")))       // "a b" already owned by doc 1
    assert(got(3L) == ((1L, 0L, "")))          // whole doc was a duplicate
    assert(got(4L) == ((2L, 2L, "p q r")))     // odd-length tail survives
  }
}
