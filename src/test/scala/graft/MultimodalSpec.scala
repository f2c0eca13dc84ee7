package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.multimodal.Multimodal

/** Binary-column plumbing: schema, stub-codec featurization determinism,
  * frame sampling shape, and column pruning past the binary payload.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = Multimodal.mediaTable(Tables.documents(spark, TestSpark.sfDir))

  test("media table: binary payload + typed metadata") {
    val m = media
    assert(m.schema("bytes").dataType.typeName == "binary")
    val r = m.orderBy("doc_id").head()
    assert(Set("image", "audio", "video").contains(r.getAs[String]("kind")))
    assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("height") >= 1)
  }

  test("featurize: deterministic stub features, one row per media row") {
    val f1 = Multimodal.featurize(spark, media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.featurize(spark, media).collect().sortBy(_.doc_id)
    assert(f1.length == media.count())
    assert(f1.map(_.avg_byte).toSeq == f2.map(_.avg_byte).toSeq, "stub codec is deterministic")
    assert(f1.forall(_.feat.length == 4))
    assert(f1.forall(f => f.avg_byte >= 0 && f.avg_byte <= 255))
  }

  test("frame sampling: n frames per payload, fixed size") {
    val frames = Multimodal.frameSample(media, n = 4, frameBytes = 16)
    val counts = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet == Set(4L))
    assert(frames.filter(octet_length(col("frame")) > 16).count() == 0)
  }

  test("resize: payload scales with the pixel-count ratio, metadata updates") {
    val before = media.select(col("doc_id"), octet_length(col("bytes")).as("n0"),
      col("width"), col("height"))
    val after = Multimodal.resize(media, 320, 240)
    assert(after.select("width").distinct().head().getInt(0) == 320)
    assert(after.select("height").distinct().head().getInt(0) == 240)
    val joined = after.select(col("doc_id"), octet_length(col("bytes")).as("n1"))
      .join(before, "doc_id").collect()
    joined.foreach { r =>
      // same arithmetic ORDER as the implementation (multiply before
      // divide) — computing the ratio first can shift the ceil by 1
      val expect = math.max(1, math.ceil(
        r.getAs[Int]("n0").toDouble * (320.0 * 240) /
          (r.getAs[Int]("width").toDouble * r.getAs[Int]("height")))).toLong
      // truncation caps at the source length (substring never extends)
      assert(r.getAs[Int]("n1") == math.min(expect, r.getAs[Int]("n0").toLong),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("ImageIoCodec: pixel-exact stats from a real hand-built PNG") {
    import spark.implicits._
    // 2×2 PNG with known pixels: red, green, blue, white
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(Multimodal.MediaRow(7L, "image", bos.toByteArray, 2, 2))
      .toDS().toDF()
    // through the full distributed featurize path, not a direct call
    val f = Multimodal.featurize(spark, media, Multimodal.ImageIoCodec).head()
    assert(f.doc_id == 7L && f.feat.length == 4)
    val expMean = (255.0 + 0 + 0 + 255) / 4 // each channel: on in 2 of 4 pixels
    assert(f.feat(0) == expMean / 255.0 && f.feat(1) == expMean / 255.0 &&
      f.feat(2) == expMean / 255.0, s"channel means: ${f.feat.toSeq}")
    assert(f.feat(3) == 4.0, "pixel count")
    assert(f.avg_byte == 0.299 * expMean + 0.587 * expMean + 0.114 * expMean,
      "Rec.601 luma of the exact channel means")
  }

  test("ImageIoCodec rejects non-image payloads loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode("definitely not a png".getBytes("UTF-8"))
    }
  }

  test("synthetic PNG table round-trips through the real decoder") {
    val png = Multimodal.syntheticPngTable(spark,
      Tables.documents(spark, TestSpark.sfDir).limit(20))
    // payloads are genuine PNGs (magic bytes) …
    val first = png.orderBy("doc_id").head().getAs[Array[Byte]]("bytes")
    assert(first.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    // … and decode to 16 pixels each, deterministically
    val a = Multimodal.featurize(spark, png, Multimodal.ImageIoCodec)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.featurize(spark, png, Multimodal.ImageIoCodec)
      .collect().sortBy(_.doc_id)
    assert(a.length == 20 && a.forall(_.feat(3) == 256.0))
    assert(a.map(_.avg_byte).toSeq == b.map(_.avg_byte).toSeq)
  }

  test("metadata queries prune the binary column from the scan") {
    // width/kind derive from doc_id/n_chars only — text (the payload
    // source) must not be read
    val plan = media.select("doc_id", "width").queryExecution.executedPlan.toString
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"),
      s"binary source column should be pruned from the scan: $read")
  }

  // --- perceptual-hash image dedup ------------------------------------------

  /** Deterministic 32×32 test image: smooth two-axis gradient (structure
    * dHash can see), tweakable per test.
    */
  private def gradientPng(edit: (Int, Int) => Int = (_, _) => 0,
      brighten: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val base = math.min(255, 4 * x + 2 * y + brighten + edit(x, y))
      val v = math.max(0, base)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash: identical images hash identically; brightness shift is invariant") {
    def hash(b: Array[Byte]) = Multimodal.dHash64(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    val a = hash(gradientPng())
    assert(a == hash(gradientPng()), "determinism")
    // dHash compares neighbors, so +20 on every pixel flips no bit
    // (as long as nothing clips at 255 — max luma here is 206)
    assert(a == hash(gradientPng(brighten = 20)), "brightness invariance")
  }

  test("planted image near-dup: retouched copy found, unrelated image not") {
    import org.apache.spark.sql.functions.col
    import graft.dedup.Dedup
    import spark.implicits._
    val a = gradientPng()
    // local retouch: a 4×4 patch dimmed — most of the image unchanged
    val b = gradientPng(edit = (x, y) => if (x >= 8 && x < 12 && y >= 8 && y < 12) -30 else 0)
    // unrelated: high-frequency checkerboard, structurally different
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = if ((x / 2 + y / 2) % 2 == 0) 230 else 10
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val c = bos.toByteArray
    val media = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "bytes")
    val pairs = Dedup.hammingPairs(
        Multimodal.dHashTable(spark, media), "doc_id", "dhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "retouched near-dup must surface")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      "unrelated image must not pair")
  }

  // --- real WAV audio codec -------------------------------------------------

  test("WavCodec: exact statistics on hand-built samples") {
    // alternating ±0.5 full-scale square wave: every stat hand-computable
    val s = Array[Short](16384, -16384, 16384, -16384)
    val (level, feat) = Multimodal.WavCodec.decode(Multimodal.writeWav(s, 8000))
    assert(level == 16384.0 / 32768.0 * 255.0)
    assert(feat(0) == 0.5, "rms of constant |0.5| signal")
    assert(feat(1) == 3.0 / 4.0, "3 sign changes over 4 samples")
    assert(feat(2) == 4.0 / 8000.0, "duration")
    assert(feat(3) == 4.0)
  }

  test("WavCodec: chunk walker skips extra chunks; rejects non-WAV loudly") {
    val s = Array[Short](1000, -1000)
    val plain = Multimodal.writeWav(s, 8000)
    // splice a LIST chunk between fmt and data — still decodable
    val extra = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
      .array()
    val spliced = plain.take(36) ++ extra ++ plain.drop(36)
    // patch the RIFF size field for the inserted 12 bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val (dl, df0) = Multimodal.WavCodec.decode(spliced)
    val (pl, pf) = Multimodal.WavCodec.decode(plain)
    assert(dl == pl && df0.toSeq == pf.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode("definitely not audio data padded to 44+ bytes!!!"
        .getBytes("UTF-8"))
    }
    // hostile declared chunk size near Int.MaxValue must fail LOUDLY
    // (missing fmt/data), not overflow the walker into a raw index error
    val hostile = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(40).put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(0x7ffffff0)
      .put(new Array[Byte](24)).array()
    intercept[IllegalArgumentException] { Multimodal.WavCodec.decode(hostile) }
  }

  test("synthetic WAV table round-trips through the real decoder") {
    val wav = Multimodal.syntheticWavTable(spark,
      Tables.documents(spark, TestSpark.sfDir).limit(20))
    val first = wav.orderBy("doc_id").head().getAs[Array[Byte]]("bytes")
    assert(new String(first.take(4), "US-ASCII") == "RIFF")
    val a = Multimodal.featurize(spark, wav, Multimodal.WavCodec)
      .collect().sortBy(_.doc_id)
    assert(a.length == 20 && a.forall(_.feat(3) == 400.0))
    assert(a.forall(f => f.feat(0) > 0 && f.feat(1) > 0), "tones have energy + crossings")
  }

  // --- real animated-GIF video codec ----------------------------------------

  private def grayFrame(v: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (i <- 0 until 16) img.setRGB(i % 4, i / 4, (v << 16) | (v << 8) | v)
    img
  }

  test("GifVideoCodec: exact frame count and lumas on a hand-built animation") {
    val gif = Multimodal.writeGif(Seq(grayFrame(10), grayFrame(100), grayFrame(250)))
    val (level, feat) = Multimodal.GifVideoCodec.decode(gif)
    assert(feat(0) == 3.0, "frame count")
    assert(math.abs(feat(1) - 10.0) < 1e-9, "first-frame luma")
    assert(math.abs(feat(2) - 250.0) < 1e-9, "last-frame luma")
    assert(feat(3) == 48.0, "3 frames x 16 px")
    assert(math.abs(level - 120.0) < 1e-9, "mean over frames")
    intercept[IllegalArgumentException] {
      Multimodal.GifVideoCodec.decode("not a gif at all, just filler bytes".getBytes)
    }
  }

  test("videoFrames: one row per frame; identical videos share frame hashes") {
    import spark.implicits._
    val a = Multimodal.writeGif(Seq(grayFrame(10), grayFrame(200)))
    val media = Seq((0L, "video", a, 4, 4), (1L, "video", a, 4, 4))
      .toDF("doc_id", "kind", "bytes", "width", "height")
    val rows = Multimodal.videoFrames(spark, media).collect()
    assert(rows.length == 4)
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc(0L).map(_.getInt(1)).sorted.toSeq == Seq(0, 1))
    val h0 = byDoc(0L).sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
    val h1 = byDoc(1L).sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
    assert(h0 == h1, "identical payloads → identical per-frame dHashes")
  }

  test("videoNearDup: trimmed copy found above threshold, unrelated not") {
    import spark.implicits._
    // dHash keys on horizontal structure (its bits are RISING luma edges,
    // and on 4-wide frames only the 3 column boundaries can rise), so the
    // planted frames are column profiles with distinct rising-edge sets
    def colProfile(vs: Int*): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) {
        val v = vs(x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val f = Seq(
      colProfile(200, 10, 10, 10),  // rises: none
      colProfile(10, 200, 10, 10),  // rises: {0→1}
      colProfile(10, 10, 200, 10),  // rises: {1→2}
      colProfile(10, 10, 10, 200))  // rises: {2→3}
    val a = Multimodal.writeGif(f)
    val b = Multimodal.writeGif(f.take(3) :+ colProfile(10, 100, 200, 10)) // 3 of 5 shared
    val c = Multimodal.writeGif(Seq(
      colProfile(10, 100, 10, 200), colProfile(10, 100, 200, 255)))
    val media = Seq((0L, "video", a, 4, 4), (1L, "video", b, 4, 4),
        (2L, "video", c, 4, 4))
      .toDF("doc_id", "kind", "bytes", "width", "height")
    val pairs = Multimodal.videoNearDup(spark, media, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 1L)), "mostly-shared-frames copy must surface")
    assert(math.abs(pairs((0L, 1L)) - 3.0 / 5.0) < 1e-12, "|∩|=3, |∪|=5")
    assert(pairs.keySet == Set((0L, 1L)), "unrelated video must not pair")
  }

  test("videoNearDup frameHamming: re-encoded-style drifted frames still match") {
    import spark.implicits._
    // 32×32 sinusoid frames: distinct frequencies → well-separated dHashes;
    // a small patch retouch drifts one frame's hash by only a few bits
    def sine(f: Int, patch: Boolean = false): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val base = 128 + (100 * math.sin(2 * math.Pi * f * x / 32.0)).toInt
        // retouch sits at the f=1 sine PEAK (x≈8), where neighbor columns
        // are nearly equal and a dip actually flips comparisons
        val v = math.max(0, math.min(255,
          if (patch && x >= 6 && x < 11 && y >= 13 && y < 19) base - 60 else base))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def h(img: java.awt.image.BufferedImage) = Multimodal.dHash64(img)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val frames = (1 to 4).map(sine(_))
    val drifted = sine(1, patch = true)
    // fixture self-check: the retouch drifts ≤ 7 bits but is not identical;
    // distinct frequencies stay far apart in Hamming space
    assert(ham(h(frames.head), h(drifted)) > 0 && ham(h(frames.head), h(drifted)) <= 7,
      s"retouch drift = ${ham(h(frames.head), h(drifted))} bits")
    for (i <- 0 until 4; j <- i + 1 until 4)
      assert(ham(h(frames(i)), h(frames(j))) > 7, s"frames $i/$j too close")
    val a = Multimodal.writeGif(frames)
    val b = Multimodal.writeGif(drifted +: frames.tail)
    val media = Seq((0L, "video", a, 4, 4), (1L, "video", b, 4, 4))
      .toDF("doc_id", "kind", "bytes", "width", "height")
    // exact matching: 3 of 5 shared; near matching: all frames canonical-equal
    val exact = Multimodal.videoNearDup(spark, media, threshold = 0.5)
      .head()
    assert(math.abs(exact.getDouble(2) - 0.6) < 1e-12)
    val near = Multimodal.videoNearDup(spark, media, threshold = 0.5, frameHamming = 7)
      .head()
    assert(near.getDouble(2) == 1.0, s"canonicalized copy must fully match: $near")
  }

  // --- audio fingerprint ----------------------------------------------------

  test("audioFingerprint64: gain-invariant, edit-local, discriminative") {
    // envelope-modulated tone: per-window energy actually varies, so the
    // delta bits are structural, not numeric noise
    def clip(envPeriod: Double, gain: Double = 1.0,
        mute: Option[Range] = None): Array[Short] =
      Array.tabulate(6500) { i =>
        val env = 0.2 + 0.8 * (0.5 + 0.5 * math.sin(2 * math.Pi * i / envPeriod))
        val muted = mute.exists(_.contains(i / 100)) // window index at 100/window
        val v = if (muted) 0.0
          else gain * env * 12000 * math.sin(2 * math.Pi * 440 * i / 8000.0)
        v.toShort
      }
    def fp(s: Array[Short]) = Multimodal.audioFingerprint64(s)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val a = fp(clip(900.0))
    assert(a == fp(clip(900.0)), "determinism")
    assert(a == fp(clip(900.0, gain = 1.3)), "uniform gain flips no bit")
    val edited = fp(clip(900.0, mute = Some(30 to 32)))
    assert(ham(a, edited) > 0 && ham(a, edited) <= 8,
      s"local mute drifts a few bits: ${ham(a, edited)}")
    assert(ham(a, fp(clip(370.0))) > 10,
      s"different envelope is far: ${ham(a, fp(clip(370.0)))}")
  }

  test("q90: fixture audio clusters exist and exemplar is the min member") {
    val r = SparkEntry.queries("q90_audio_near_dup")(spark, TestSpark.sfDir)
      .collect()
    assert(r.nonEmpty, "fixture duplicate texts must yield audio clusters")
    r.foreach { row =>
      assert(row.getAs[Long]("n_members") >= 2)
      assert(row.getAs[Long]("exemplar") == row.getAs[Long]("cluster"))
    }
  }

  test("q88: every fixture video decodes to exactly 4 frames") {
    val r = SparkEntry.queries("q88_video_frames")(spark, TestSpark.sfDir)
    assert(r.filter(col("n_frames") =!= 4).count() == 0)
    assert(r.count() > 0)
  }

  test("q85: fixture PNG clusters exist and exemplar is the min member") {
    val r = SparkEntry.queries("q85_image_near_dup")(spark, TestSpark.sfDir)
      .collect()
    assert(r.nonEmpty, "fixture duplicate texts must yield image clusters")
    r.foreach { row =>
      assert(row.getAs[Long]("n_members") >= 2)
      assert(row.getAs[Long]("exemplar") == row.getAs[Long]("cluster"),
        "cluster label is the min member id")
    }
  }

  test("GIF round-trip is pixel-lossless — q88/q89's oracle precondition") {
    // the video oracles predict decoded stats from the generation stream,
    // valid ONLY while the ≤256-color grayscale GIF encode → decode loop
    // is exact; a JDK writer that started quantizing/dithering must fail
    // here loudly rather than silently breaking the closed forms
    val md = java.security.MessageDigest.getInstance("MD5")
    for (t <- Seq("hello world foo bar", "the quick brown fox", "zz")) {
      val frames = (0 until 4).map { f =>
        val src = Multimodal.seededBytes(md, t, f.toLong, 256)
        val img = new java.awt.image.BufferedImage(
          16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until 256).foreach { i =>
          val v = src(i) & 0xff
          img.setRGB(i % 16, i / 16, (v << 16) | (v << 8) | v)
        }
        (src, img)
      }
      val bytes = Multimodal.writeGif(frames.map(_._2))
      val back = Multimodal.readGifFrames(bytes)
      assert(back.length == 4)
      frames.zip(back).foreach { case ((src, _), dec) =>
        (0 until 256).foreach { i =>
          val exp = src(i) & 0xff
          val p = dec.getRGB(i % 16, i / 16)
          assert(((p >> 16) & 0xff) == exp && ((p >> 8) & 0xff) == exp &&
            (p & 0xff) == exp, s"GIF round-trip lost pixel $i of '$t'")
        }
      }
    }
  }

  test("fixture corpus is ASCII — q51's byte-stat oracle precondition") {
    // q51's oracle reconstructs UTF-8 byte sums via per-character ascii()
    // codepoints, valid ONLY while every character is single-byte; a
    // regenerated fixture with non-ASCII text must fail here loudly
    // rather than silently shifting the oracle's arithmetic
    val nonAscii = Tables.documents(spark, TestSpark.sfDir)
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(nonAscii == 0,
      s"$nonAscii documents carry non-ASCII text — q51's ascii()-based " +
        "oracle no longer equals the byte statistics")
  }

  test("fingerprintDecontaminate: hamming-<=3 benchmark match flags, " +
      "corpus-internal dups don't, benchmark rides a broadcast") {
    import spark.implicits._
    import graft.dedup.Dedup
    val b = 0x0123456789ABCDEFL
    def flip(v: Long, bits: Int*): Long =
      bits.foldLeft(v)((a, i) => a ^ (1L << i))
    val bench = Seq((900L, b), (901L, flip(b, 40, 41, 42, 43, 44, 45, 46, 47)))
      .toDF("doc_id", "fp")
    val corpus = Seq(
      (1L, b),                      // exact copy of 900 — contaminated
      (2L, flip(b, 1, 17, 33)),     // hamming 3 (3 distinct chunks) — contaminated
      (3L, flip(b, 1, 17, 33, 49)), // hamming 4 — clean
      (4L, 0x7777000011112222L),    // corpus-internal dup pair, far from bench
      (5L, 0x7777000011112222L)
    ).toDF("doc_id", "fp")
    val out = Dedup.fingerprintDecontaminate(corpus, bench, "doc_id", "fp")
    val m = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("contaminated")
      && m(1L).getAs[Long]("first_match") == 900L)
    // all 4 chunks of doc 1 meet 900's — n_matched collapses to DISTINCT
    // benchmark matches, not chunk meetings
    assert(m(1L).getAs[Long]("n_matched") == 1L)
    assert(m(2L).getAs[Boolean]("contaminated")
      && m(2L).getAs[Long]("first_match") == 900L)
    assert(!m(3L).getAs[Boolean]("contaminated")
      && m(3L).getAs[Long]("n_matched") == 0L)
    assert(!m(4L).getAs[Boolean]("contaminated")
      && !m(5L).getAs[Boolean]("contaminated"),
      "corpus-internal duplicates are dedup's business, not contamination's")
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "benchmark chunk rows must ride a broadcast — the corpus side never exchanges")
  }
}
