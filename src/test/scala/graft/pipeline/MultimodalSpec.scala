package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Both decoder paths, end to end through the distributed
  * `mapPartitions` plumbing: the deterministic stub (the oracle-checkable
  * default, equal to the declarative `featuresSql` twin) and the REAL
  * JDK `javax.imageio` decoder on in-memory PNG/JPEG fixtures, with the
  * stub fallback on undecodable bytes. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  private def withDecoder[T](name: String)(f: => T): T = {
    spark.conf.set("spark.graft.media.decoder", name)
    try f finally spark.conf.unset("spark.graft.media.decoder")
  }

  test("stub path equals the declarative featuresSql twin") {
    // ASCII fixtures: the stub hashes the first 32 payload BYTES
    // (ISO-8859-1 view) while featuresSql hashes the first 32 CHARS —
    // identical only when byte==char, which the synthetic testdata
    // guarantees and this equality twin therefore assumes
    val docs = Seq((1L, "alpha doc text"), (2L, "a much longer beta document body"),
      (3L, "third plain ascii text")).toDF("doc_id", "text")
    val typed = Multimodal.extractFeatures(spark, docs).toDF()
      .select("doc_id", "byte_len", "width", "height", "channels")
      .collect().map(_.toSeq).toSet
    val sql = Multimodal.featuresSql(docs)
      .collect().map(_.toSeq).toSet
    assert(typed == sql && typed.size == 3)
  }

  test("imageio decoder reads real PNG and JPEG dimensions") {
    val media = Seq(
      (1L, png(7, 5)),
      (2L, jpeg(64, 48)),
      (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = withDecoder("imageio") {
      Multimodal.extractFeaturesFromPayload(spark, media)
        .collect().map(m => m.doc_id -> m).toMap
    }
    assert((r(1L).width, r(1L).height, r(1L).channels) == (7, 5, 3))
    assert((r(2L).width, r(2L).height, r(2L).channels) == (64, 48, 3))
    // undecodable bytes fall back to the deterministic stub, not a crash
    val stub = Multimodal.StubDecoder.decode("not an image at all".getBytes("UTF-8"))
    assert((r(3L).width, r(3L).height, r(3L).channels) == stub)
    // byte_len is the real payload size either way
    assert(r(1L).byte_len == png(7, 5).length.toLong)
  }

  test("JPEG reality check: geometry exact, pixel sums inside a lossy envelope") {
    // decode a JDK-encoded JPEG of the SAME pixel law as the PNG gate
    // through the real-pixel path. Geometry must be EXACT (that half is
    // gate-checked in mm_jpeg_meta); pixel sums are lossy — bound the
    // MEAN per-pixel per-channel deviation from the pre-encode truth.
    val docs = (0L until 40L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val decoded = withDecoder("imageio") {
      Multimodal.pngDecodeFeatures(spark,
        Multimodal.withJpegPayload(spark, docs))
        .collect().map(d => d.doc_id -> d).toMap
    }
    assert(decoded.size == 40)
    (0L until 40L).foreach { id =>
      val d = decoded(id)
      val w = (8 + id % 16).toInt
      val h = (4 + id % 8).toInt
      // geometry survives the lossy codec exactly
      assert((d.width, d.height, d.channels, d.n_px) ==
        (w, h, 3, w.toLong * h), s"geometry drift for doc $id")
      // closed-form pre-encode channel sums (the PNG law)
      def truth(f: Long => Long): Long =
        (0 until h).map(y => w.toLong * f(y.toLong)).sum
      val tr = truth(y => (3 * id + 2 * y) % 256)
      val tg = truth(y => (2 * id + y) % 256)
      val tb = truth(y => (id + y) % 256)
      // lossy envelope: mean |deviation| per pixel per channel must be
      // small (JPEG quantization + chroma subsampling noise), while a
      // wrong decode (flipped rows, channel swap, garbage) blows it up
      val nPx = w.toLong * h
      def meanDev(got: Long, want: Long): Double =
        math.abs(got - want).toDouble / nPx
      assert(meanDev(d.sum_r, tr) < 24.0,
        s"doc $id red drift ${meanDev(d.sum_r, tr)}")
      assert(meanDev(d.sum_g, tg) < 24.0,
        s"doc $id green drift ${meanDev(d.sum_g, tg)}")
      assert(meanDev(d.sum_b, tb) < 24.0,
        s"doc $id blue drift ${meanDev(d.sum_b, tb)}")
    }
    // the geometry face jpegMetaFeatures agrees with the raster decode
    val meta = withDecoder("imageio") {
      Multimodal.jpegMetaFeatures(spark,
        Multimodal.withJpegPayload(spark, docs))
        .collect().map(m => m.doc_id -> m).toMap
    }
    (0L until 40L).foreach { id =>
      val (m, d) = (meta(id), decoded(id))
      assert((m.width, m.height, m.channels, m.n_px) ==
        (d.width, d.height, d.channels, d.n_px))
    }
    // the guard rail: no real-decoder conf, no silent stub
    intercept[IllegalArgumentException] {
      Multimodal.jpegMetaFeatures(spark,
        Multimodal.withJpegPayload(spark, docs))
    }
  }

  test("default (no conf) stays on the stub decoder — mm_features gate shape") {
    val docs = Seq((1L, "gate text")).toDF("doc_id", "text")
    val viaDefault = Multimodal.extractFeatures(spark, docs).collect().head
    val stub = Multimodal.StubDecoder.decode("gate text".getBytes("UTF-8"))
    assert((viaDefault.width, viaDefault.height, viaDefault.channels) == stub)
  }

  test("WAV round-trip: synthesized RIFF containers decode to closed forms") {
    // the container header javax.sound writes for PCM is the canonical
    // 44 bytes — the mm_audio oracle's byte_len formula depends on it
    val w0 = Multimodal.synthWav(0L)
    assert(w0.length == 44 + 2 * 64, s"unexpected WAV size ${w0.length}")
    assert(new String(w0.take(4), "US-ASCII") == "RIFF")
    assert(new String(w0.slice(8, 12), "US-ASCII") == "WAVE")

    val docs = Seq(0L, 5L, 191L, 192L, 9191L).toDF("doc_id")
    val out = Multimodal.audioFeatures(spark,
        Multimodal.withWavPayload(spark, docs))
      .collect().map(a => a.doc_id -> a).toMap
    for (id <- Seq(0L, 5L, 191L, 192L, 9191L)) {
      val a = out(id)
      assert(a.sample_rate == 8000 && a.n_channels == 1)
      assert(a.n_samples == 64 + id % 192, s"doc $id samples ${a.n_samples}")
      assert(a.peak_amp == 1000 + id % 9000, s"doc $id peak ${a.peak_amp}")
      assert(a.byte_len == 44 + 2 * (64 + id % 192))
    }
  }

  test("AVI container: synthesized file parses back field-for-field; junk rejected") {
    // the synthesized bytes are a structurally valid RIFF/AVI file
    val a = Multimodal.synthAvi(7L)
    assert(new String(a.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(a.slice(8, 12), "US-ASCII") == "AVI ")
    // little-endian RIFF size = file length - 8
    val riffSize = java.nio.ByteBuffer.wrap(a, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(riffSize == a.length - 8)

    for (id <- Seq(0L, 3L, 11L, 12L, 63L, 9999L)) {
      val m = Multimodal.aviMetadata(Multimodal.synthAvi(id))
      assert(m.width == 16 + id % 64 && m.height == 16 + id % 48, s"doc $id")
      assert(m.n_frames == 4 + id % 12 && m.frames_seen == m.n_frames, s"doc $id")
      assert(m.us_per_frame == 33333L)
      assert(m.byte_len == 224 + 24 * (4 + id % 12))
    }
    // non-RIFF and RIFF-but-not-AVI payloads fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.aviMetadata("not a riff file at all".getBytes)
    }
    intercept[IllegalArgumentException] {
      Multimodal.aviMetadata(Multimodal.synthWav(1L)) // RIFF/WAVE, not AVI
    }
  }

  test("BI_RGB frame decode: pixel sums match the closed form; bottom-up rows honored") {
    for (id <- Seq(0L, 1L, 5L, 14L, 255L, 9999L)) {
      val d = Multimodal.decodeAviRgb(id, Multimodal.synthAviRgb(id))
      val (w, h, nf) = ((8 + id % 16).toInt, (4 + id % 8).toInt, (2 + id % 4).toInt)
      assert(d.width == w && d.height == h && d.n_frames == nf, s"doc $id")
      assert(d.n_px == w.toLong * h * nf)
      def tot(f: (Long, Long) => Long): Long =
        (0 until nf).map(fr => (0 until h).map(y =>
          w * f(fr.toLong, y.toLong)).sum).sum
      assert(d.sum_b == tot((f, y) => (id + 7 * f + y) % 256), s"doc $id B")
      assert(d.sum_g == tot((f, y) => (2 * id + f + y) % 256), s"doc $id G")
      assert(d.sum_r == tot((f, y) => (3 * id + f + 2 * y) % 256), s"doc $id R")
      // logical TOP row of frame 0 lives at the END of the pixel array
      // (bottom-up): a top-is-first decoder would read (3id + 2(h-1))%256
      assert(d.top_row_r == w.toLong * ((3 * id) % 256), s"doc $id orientation")
    }
    // compressed (or non-24-bit) streams must reject, not stub
    val bad = Multimodal.synthAviRgb(3L)
    // biCompression lives 16 bytes into the strf payload; flip it to 1
    val strfAt = {
      val s4 = "strf".getBytes("US-ASCII")
      (0 until bad.length - 4).find(i => bad.slice(i, i + 4).sameElements(s4)).get
    }
    bad(strfAt + 8 + 16) = 1 // MS-RLE8
    intercept[IllegalArgumentException] { Multimodal.decodeAviRgb(3L, bad) }
  }

  test("NN resize: identity at source dims; floor-map law up and down; row-weighted checksum") {
    for (id <- Seq(0L, 1L, 5L, 14L, 255L, 9999L)) {
      val payload = Multimodal.synthAviRgb(id)
      val (w, h, nf) = ((8 + id % 16).toInt, (4 + id % 8).toInt, (2 + id % 4).toInt)
      // identity: resizing to the source grid reproduces the full
      // decode's channel sums exactly (floor map is the identity there)
      val same = Multimodal.resizeAviRgb(id, payload, w, h)
      val full = Multimodal.decodeAviRgb(id, payload)
      assert(same.sum_r == full.sum_r && same.sum_g == full.sum_g &&
        same.sum_b == full.sum_b, s"doc $id identity")
      // independent brute-force replay of the floor map at 16x8
      val r = Multimodal.resizeAviRgb(id, payload, 16, 8)
      assert(r.src_w == w && r.src_h == h && r.n_frames == nf)
      def px(f: Long, y: Long): (Long, Long, Long) =
        (((3 * id + f + 2 * y) % 256, (2 * id + f + y) % 256,
          (id + 7 * f + y) % 256))
      var er = 0L; var eg = 0L; var eb = 0L; var ewr = 0L
      for (f <- 0 until nf; yp <- 0 until 8; _ <- 0 until 16) {
        val (pr, pg, pb) = px(f.toLong, yp.toLong * h / 8)
        er += pr; eg += pg; eb += pb; ewr += (yp + 1) * pr
      }
      assert(r.sum_r == er && r.sum_g == eg && r.sum_b == eb, s"doc $id 16x8")
      assert(r.wsum_r == ewr, s"doc $id weighted checksum")
    }
  }

  test("frame sampling: n >= nf degrades to full decode; n=2 reads only {0, nf/2}") {
    for (id <- Seq(0L, 1L, 5L, 14L, 255L, 9999L)) {
      val payload = Multimodal.synthAviRgb(id)
      val (w, h, nf) = ((8 + id % 16).toInt, (4 + id % 8).toInt, (2 + id % 4).toInt)
      val full = Multimodal.decodeAviRgb(id, payload)
      // oversampling covers every frame exactly once (indices dedup)
      val all = Multimodal.sampleAviFrames(id, payload, 16)
      assert(all.n_sampled == nf && all.n_frames == nf, s"doc $id all")
      assert(all.sum_r == full.sum_r && all.sum_g == full.sum_g &&
        all.sum_b == full.sum_b, s"doc $id all sums")
      // n=2: frames {0, nf/2}, replayed brute-force
      val s2 = Multimodal.sampleAviFrames(id, payload, 2)
      val picked = Set(0L, nf.toLong / 2)
      assert(s2.n_sampled == picked.size && s2.width == w && s2.height == h)
      def tot(f: (Long, Long) => Long): Long =
        picked.toSeq.map(fr => (0 until h).map(y =>
          w * f(fr, y.toLong)).sum).sum
      assert(s2.sum_r == tot((f, y) => (3 * id + f + 2 * y) % 256), s"doc $id R")
      assert(s2.sum_g == tot((f, y) => (2 * id + f + y) % 256), s"doc $id G")
      assert(s2.sum_b == tot((f, y) => (id + 7 * f + y) % 256), s"doc $id B")
    }
  }

  test("aHash: brute-force closed form; row-block structure; tamper sensitivity") {
    for (id <- Seq(0L, 1L, 5L, 14L, 255L, 9999L)) {
      val payload = Multimodal.synthAviRgb(id)
      val h = (4 + id % 8).toInt
      val nf = (2 + id % 4).toInt
      val hashes = Multimodal.aHashAviRgb(id, payload)
      assert(hashes.size == nf, s"doc $id frame count")
      hashes.foreach { fh =>
        // closed form: pixels are row-constant, so cell luminance only
        // depends on the floor-mapped source row
        val srow = (0 until 8).map { yp =>
          val y = yp * h / 8
          ((3 * id + fh.frame_idx + 2 * y) % 256) +
            ((2 * id + fh.frame_idx + y) % 256) +
            ((id + 7 * fh.frame_idx + y) % 256)
        }
        val tot = srow.sum
        var lo = 0L; var hi = 0L
        for (yp <- 0 until 8; xp <- 0 until 8 if 8 * srow(yp) > tot) {
          val idx = yp * 8 + xp
          if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
        }
        assert(fh.ahash_lo == lo && fh.ahash_hi == hi,
          s"doc $id frame ${fh.frame_idx}")
        // row-constant input -> every 8-bit row of the hash is 0x00 or 0xff
        Seq(fh.ahash_lo, fh.ahash_hi).foreach { half =>
          (0 until 4).foreach { r =>
            val byte = (half >> (8 * r)) & 0xff
            assert(byte == 0L || byte == 0xffL, s"doc $id row block $byte")
          }
        }
      }
      // tamper: blast frame 0's LOGICAL row 0 to white and assert the
      // hash moves to the closed form recomputed with that row at max
      // luminance — deterministic, and catches a decoder that ignores
      // the tampered bytes or the bottom-up row map
      val f0 = hashes.head
      val tampered = payload.clone()
      val stride = (((8 + id % 16).toInt * 3) + 3) & ~3
      // find "00db" then skip 8 bytes (fourcc + size) to the pixel base
      val key = "00db".getBytes("US-ASCII")
      val pos = tampered.indices.find(i => i + 4 <= tampered.length &&
        key.indices.forall(j => tampered(i + j) == key(j))).get + 8
      // file row h-1 = logical row 0 under bottom-up orientation
      val rowOff = pos + (h - 1) * stride
      (0 until stride).foreach(i => tampered(rowOff + i) = 0xff.toByte)
      val th = Multimodal.aHashAviRgb(id, tampered).head
      val srow0 = (0 until 8).map { yp =>
        val y = yp * h / 8
        if (y == 0) 765L
        else ((3 * id + 2 * y) % 256) + ((2 * id + y) % 256) +
          ((id + y) % 256)
      }
      val tot0 = srow0.sum
      var elo = 0L; var ehi = 0L
      for (yp <- 0 until 8; xp <- 0 until 8 if 8 * srow0(yp) > tot0) {
        val idx = yp * 8 + xp
        if (idx < 32) elo |= 1L << idx else ehi |= 1L << (idx - 32)
      }
      assert(th.ahash_lo == elo && th.ahash_hi == ehi,
        s"doc $id tampered hash != closed form (orig $f0, got $th)")
    }
  }

  test("aHashBandTable: 4 x 16-bit bands that reassemble the hash exactly") {
    val h = Seq((1L, 0L, 0x12345678L, 0xfedcba98L))
      .toDF("doc_id", "frame_idx", "ahash_lo", "ahash_hi")
    val rows = Multimodal.aHashBandTable(h)
      .select("band", "bits").as[(Int, Long)].collect().toMap
    assert(rows.size == 4, s"expected 4 bands, got ${rows.size}")
    assert((rows(1) << 16 | rows(0)) == 0x12345678L)
    assert((rows(3) << 16 | rows(2)) == 0xfedcba98L)
    rows.values.foreach(b => assert(b >= 0 && b < (1L << 16)))
  }

  test("banded near-dup probe equals brute-force Hamming at maxDist 8") {
    // synthetic fingerprints engineered around the threshold: exact dup,
    // 1-bit, 8-bit (boundary, spread across bands), 9-bit (just out),
    // and far pairs — recall must be lossless vs the quadratic truth
    val rnd = new scala.util.Random(7)
    val standing = (0 until 40).map { i =>
      (100L + i, 0L, rnd.nextLong() & 0xffffffffL, rnd.nextLong() & 0xffffffffL)
    }
    def flip(h: (Long, Long, Long, Long), nBits: Int, id: Long) = {
      // flip nBits distinct positions spread over the full 64 bits —
      // adversarial for banding (touches many bands)
      val picks = rnd.shuffle((0 until 64).toList).take(nBits)
      val (lo, hi) = picks.foldLeft((h._3, h._4)) { case ((l, g), p) =>
        if (p < 32) (l ^ (1L << p), g) else (l, g ^ (1L << (p - 32)))
      }
      (id, 0L, lo, hi)
    }
    val batch = Seq(
      (0L, 0L, standing(0)._3, standing(0)._4),   // exact
      flip(standing(1), 1, 1L),
      flip(standing(2), 8, 2L),                    // boundary: kept
      flip(standing(3), 9, 3L),                    // just out
      (4L, 0L, rnd.nextLong() & 0xffffffffL, rnd.nextLong() & 0xffffffffL))
    val cols = Seq("doc_id", "frame_idx", "ahash_lo", "ahash_hi")
    val sDf = standing.toDF(cols: _*); val bDf = batch.toDF(cols: _*)
    val got = Multimodal.aHashNearDupProbe(
        Multimodal.aHashIndex(sDf), sDf, bDf, 8)
      .select("doc_id", "src_doc", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      b <- batch; s <- standing
      d = java.lang.Long.bitCount(b._3 ^ s._3) +
        java.lang.Long.bitCount(b._4 ^ s._4)
      if d <= 8
    } yield (b._1, s._1, d.toLong)).toSet
    assert(got == brute,
      s"banded=${got.size} brute=${brute.size}; missing=${brute -- got}")
    assert(brute.exists(_._3 == 0L) && brute.exists(_._3 == 8L))
    assert(!brute.exists(p => p._1 == 3L && p._2 == 103L))
    // the broadcast-brute operator and the adaptive pick return the
    // SAME pair set — at either extreme of the threshold (tiny forces
    // the multi-index branch, huge forces brute), so both branches of
    // the crossover pick are exercised against the same truth
    val bruteOp = Multimodal.aHashNearDupBrute(sDf, bDf, 8)
      .select("doc_id", "src_doc", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(bruteOp == brute)
    Seq(0L, Long.MaxValue).foreach { threshold =>
      val auto = Multimodal.aHashNearDupAuto(
          Multimodal.aHashIndex(sDf), sDf, bDf, 8,
          bruteMaxPairs = threshold)
        .select("doc_id", "src_doc", "hamming")
        .as[(Long, Long, Long)].collect().toSet
      assert(auto == brute, s"adaptive pick diverged at threshold $threshold")
    }
  }
}
