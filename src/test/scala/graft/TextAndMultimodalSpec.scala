package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class TextAndMultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.table(spark, sf, "documents")

  test("tokenizer assumption: text is clean single-space (no empty tokens)") {
    val bad = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === "").count()
    assert(bad == 0, "split-only tokenization requires clean text")
  }

  test("every document has >= 10 tokens (n-gram guards are dead paths)") {
    val minTok = docs.select(size(split(col("text"), " ")).as("n"))
      .agg(min("n")).as[Int].head()
    assert(minTok >= 10)
  }

  test("minhash banding is deterministic across runs") {
    val a = SparkEntry.queries("q_minhash_band")(spark, sf).collect()
    val b = SparkEntry.queries("q_minhash_band")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == docs.count() * 4, "4 bands per doc")
  }

  test("simhash: 32-bit signatures, deterministic, near-dup distance sane") {
    val sh = SparkEntry.queries("q_simhash")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(sh.size == docs.count())
    val again = SparkEntry.queries("q_simhash")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(sh == again)
  }

  test("exact-dedup keeps one keeper per distinct text") {
    val out = SparkEntry.queries("q_dedup_exact")(spark, sf)
    assert(out.count() == docs.select("text").distinct().count())
  }

  test("semdedup: representatives are group minima, keeps are closed (r8)") {
    val res = SparkEntry.queries("q_semdedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.length === Tables.table(spark, sf, "embeddings").count(),
      "every vector must report a representative")
    // a representative never exceeds its member (min-id convention),
    // keeps are exactly the self-representatives, and every named
    // representative is itself kept (the keep-set is closed — deleting
    // keep=0 rows never strands a group)
    res.foreach { case (v, rep, keep) =>
      assert(rep <= v)
      assert((keep == 1L) === (rep == v))
    }
    val keeps = res.filter(_._3 == 1L).map(_._1).toSet
    res.foreach { case (_, rep, _) => assert(keeps.contains(rep)) }
    assert(res.exists(_._3 == 0L),
      "fixture must produce at least one pruned semantic duplicate")
  }

  test("dsir weight ranks target-language docs above the rest (r8)") {
    val w = SparkEntry.queries("q_dsir_weight")(spark, sf)
    val byLang = w.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg("log_weight").as("aw"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(byLang(true) > byLang(false),
      s"en docs must average a higher importance weight: $byLang")
    assert(w.count() === docs.count(), "every doc must be scored")
  }

  test("pack_greedy: bins respect capacity, number contiguously, " +
      "and are maximal (r8)") {
    val out = SparkEntry.queries("q_pack_greedy")(spark, sf)
      .select("lang", "shard", "doc_id", "n_tokens", "bin_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length === docs.count(), "every doc must be placed")
    out.groupBy(t => (t._1, t._2)).foreach { case (shard, rows) =>
      val scan = rows.sortBy(_._3) // doc_id order = the visit order
      // bins number 1..k contiguously within the shard
      val bins = scan.map(_._5)
      assert(bins.head == 1L && bins.zip(bins.tail).forall {
        case (a, b) => b == a || b == a + 1 }, s"$shard: $bins")
      val fills = scan.groupBy(_._5).toSeq.sortBy(_._1)
        .map { case (b, rs) => (b, rs.map(_._4).sum, rs.length) }
      fills.foreach { case (b, fill, n) =>
        // a bin over capacity can only be a single oversized doc
        assert(fill <= 256L || n == 1, s"$shard bin $b: fill=$fill n=$n")
      }
      // greedy maximality: the doc that OPENED bin b+1 must not have
      // fit into bin b (otherwise the packing left capacity unused)
      scan.zip(scan.tail).foreach { case (prev, cur) =>
        if (cur._5 == prev._5 + 1) {
          val prevFill = scan.filter(_._5 == prev._5).map(_._4).sum
          assert(prevFill + cur._4 > 256L,
            s"$shard: doc ${cur._3} fit in bin ${prev._5} but opened a new one")
        }
      }
    }
    assert(out.map(_._5).max > 1L, "fixture must need more than one bin")
  }

  test("multimodal: stub decode is partition-local, deterministic, typed") {
    val media = Multimodal.asMediaFrame(docs, "doc_id", "text", "text/plain")
    assert(media.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("media_id", "long"), ("kind", "string"), ("payload", "binary")))
    val feats = Multimodal.stubDecode(media)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.width >= 64 && r.height >= 64))
    // deterministic across runs
    val again = Multimodal.stubDecode(media).collect()
    assert(rows.map(_.media_id).sorted.sameElements(
      again.map(_.media_id).sorted))
    val f1 = rows.sortBy(_.media_id).map(_.features.toSeq).toSeq
    val f2 = again.sortBy(_.media_id).map(_.features.toSeq).toSeq
    assert(f1 == f2)
  }

  test("multimodal: frame sampling emits n slices covering the payload") {
    val media = Multimodal.asMediaFrame(docs.limit(10), "doc_id", "text",
      "video/fake")
    val frames = Multimodal.frameSample(media, 4)
    assert(frames.count() == 40)
    val widths = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(widths.forall(_ == 4))
    assert(frames.filter(octet_length(col("frame_bytes")) === 0).count() == 0)
  }

  test("multimodal: stub resize halves dims and downsamples bytes") {
    // stub-only kind (outside image/audio/video): resize plumbing
    // composes with the STUB decode path (decoder kinds decode for real
    // and text bytes would flag -1 dims)
    val media = Multimodal.asMediaFrame(docs.limit(8), "doc_id", "text",
      "blob/fake")
    val decoded = Multimodal.stubDecode(media)
    val resized = Multimodal.stubResize(decoded, media, 2)
    val byId = decoded.collect().map(d => d.media_id -> d).toMap
    resized.collect().foreach { r =>
      val orig = byId(r.getLong(0))
      assert(r.getInt(2) == orig.width / 2 && r.getInt(3) == orig.height / 2)
      val nb = r.getLong(4)
      assert(nb == (orig.n_bytes + 1) / 2, s"$nb vs ${orig.n_bytes}")
      // deterministic: byte i of resized == byte 2i of original payload
      val rp = r.getAs[Array[Byte]]("resized_payload")
      assert(rp.length == nb)
    }
  }

  test("multimodal: image kind decodes REAL dimensions via ImageIO") {
    // synthetic PNGs built in memory: w×h with a known pixel split —
    // left half black, right half white → luminance histogram puts ~half
    // the mass in bin 0 and ~half in bin 7
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq((1L, png(64, 48)), (2L, png(10, 200)))
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("image/png").as("kind"), col("payload"))
    val rows = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(rows.map(r => (r.width, r.height)).toSeq ==
      Seq((64, 48), (10, 200)), "ImageIO must report true pixel dims")
    rows.foreach { r =>
      assert(r.features.length == 8)
      assert(math.abs(r.features.sum - 1.0f) < 1e-4, "normalized histogram")
      assert(r.features(0) === 0.5f, "black half -> bin 0")
      assert(r.features(7) === 0.5f, "white half -> bin 7")
    }
  }

  test("multimodal: animated GIF frame sampling extracts REAL frames") {
    // multi-frame GIF built in memory: 6 frames, each a solid gray level
    // ramping 0,50,100,150,200,250 — sampled frames must decode to the
    // RIGHT frame's luminance, proving true per-frame extraction (not
    // byte slicing)
    def gif(levels: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val out = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      levels.foreach { lvl =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (lvl << 16) | (lvl << 8) | lvl
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); out.close(); writer.dispose()
      bos.toByteArray
    }
    val levels = Seq(0, 50, 100, 150, 200, 250)
    val media = Seq((1L, gif(levels, 16, 12)),
        (2L, "not a gif".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("video/gif").as("kind"), col("payload"))
    val frames = Multimodal.sampleGifFrames(media, 3)
    val rows = frames.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getAs[Array[Byte]](2), r.getInt(3), r.getInt(4)))
    // corrupt payload contributes zero rows; the GIF yields 3 of 6 frames
    assert(rows.forall(_._1 == 1L))
    assert(rows.map(_._2).sorted.toSeq === Seq(0, 2, 4),
      "evenly spaced original frame indices")
    assert(rows.forall(r => r._4 == 16 && r._5 == 12))
    // each sampled frame re-decodes to the ORIGINAL frame's gray level
    rows.sortBy(_._2).zip(Seq(0, 100, 200)).foreach { case (r, lvl) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r._3))
      val got = img.getRGB(8, 6) & 0xff
      assert(math.abs(got - lvl) <= 8, // GIF palette quantization slack
        s"frame ${r._2}: gray $got vs expected ~$lvl")
    }
    // a GIF with fewer frames than requested yields all of them
    val small = Seq((3L, gif(Seq(10, 240), 8, 8)))
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("video/gif").as("kind"), col("payload"))
    assert(Multimodal.sampleGifFrames(small, 5).count() === 2)
  }

  test("multimodal: audio kind decodes REAL rate/channels via javax.sound") {
    // synthetic WAV built in memory: 16-bit signed PCM with a known
    // loudness shape — first half silence, second half a full-ish-scale
    // sine → RMS envelope is ~0 in segments 0-3 and ~amp/(fs·√2) in 4-7
    def wav(rate: Float, channels: Int, nFrames: Int,
        amp: Short): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat,
        AudioInputStream, AudioSystem}
      val bytes = new Array[Byte](nFrames * channels * 2)
      for (i <- 0 until nFrames; c <- 0 until channels) {
        val s: Short =
          if (i < nFrames / 2) 0
          else (amp * math.sin(2 * math.Pi * 440 * i / rate)).toShort
        val off = (i * channels + c) * 2
        bytes(off) = (s & 0xff).toByte
        bytes(off + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
        channels, 2 * channels, rate, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, wav(8000f, 1, 8000, 30000)),
      (2L, wav(16000f, 2, 1600, 30000)),
      (3L, "not a wav".getBytes("UTF-8"))) // undecodable: quarantine flag
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("audio/wav").as("kind"), col("payload"))
    val rows = Multimodal.decode(media).collect().sortBy(_.media_id)
    // width = channels, height = sample rate (documented mapping)
    assert(rows.map(r => (r.width, r.height)).toSeq ==
      Seq((1, 8000), (2, 16000), (-1, -1)))
    val mono = rows(0)
    assert(mono.features.length == 8)
    assert(mono.features.take(4).forall(_ < 0.01f), "leading silence")
    val expected = (30000.0 / 32768.0 / math.sqrt(2)).toFloat // sine RMS
    mono.features.drop(4).foreach { f =>
      assert(math.abs(f - expected) < 0.02f, s"$f vs $expected")
    }
    assert(rows(2).features.isEmpty, "undecodable -> empty features")
  }

  test("multimodal: audio contour hash — rate-invariant, " +
      "reversal-sensitive, corrupt quarantined (r8)") {
    import spark.implicits._
    // linear loudness ramp: the 32-bit contour only encodes the SHAPE
    // (segment j louder than j+1?), so the same ramp at a different
    // sample rate/length hashes identically, and the reversed ramp
    // flips every defined comparison
    def rampWav(rate: Float, nFrames: Int, desc: Boolean): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat,
        AudioInputStream, AudioSystem}
      val bytes = new Array[Byte](nFrames * 2)
      for (i <- 0 until nFrames) {
        val frac = if (desc) 1.0 - i.toDouble / nFrames
          else i.toDouble / nFrames
        val s = (frac * 30000 *
          math.sin(2 * math.Pi * 440 * i / rate)).toShort
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
        1, 2, rate, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, rampWav(8000f, 8000, desc = false)),
      (2L, rampWav(16000f, 4000, desc = false)), // same shape, other rate
      (3L, rampWav(8000f, 8000, desc = true)),   // reversed contour
      (4L, Array[Byte](9, 9, 9))                 // corrupt
    ).toDF("media_id", "payload")
      .select(col("media_id"), lit("audio/wav").as("kind"), col("payload"))
    val hs = Multimodal.audioContourHash(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(!hs(4L)._2, "corrupt payload must be quarantined")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L)._1, hs(2L)._1) <= 2,
      s"same contour, different rate: ${ham(hs(1L)._1, hs(2L)._1)}")
    assert(ham(hs(1L)._1, hs(3L)._1) >= 24,
      s"reversed contour must flip most bits: ${ham(hs(1L)._1, hs(3L)._1)}")
    // pigeonhole pairing at the contour's TRUE 32-bit geometry finds
    // exactly the same-shape pair
    val pairs = Multimodal.audioNearDups(media, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("multimodal: hammingPairs full-width chunk mask at bits=64, " +
      "maxDist=0 (ADVICE r9)") {
    // the pre-r9 mask clamped the single-chunk width to 63 bits, so two
    // hashes differing ONLY in bit 63 still chunk-collided (harmless for
    // correctness via the exact bit_count filter, but wrong blocking).
    // Full-width -1L mask: bit-63-only difference must not pair at
    // maxDist=0, exact duplicates must.
    import spark.implicits._
    val hs = Seq(
      (1L, 0x8000000000000000L), // bit 63 set
      (2L, 0x0000000000000000L), // differs from 1 only in bit 63
      (3L, 0x8000000000000000L)  // exact dup of 1
    ).toDF("media_id", "dhash")
    val got = Multimodal.hammingPairs(hs, bits = 64, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 3L)))
  }

  test("multimodal: resizeImages scales the long edge, round-trips decode") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(128, 64)),  // downscale: long edge 128 -> 32
      (2L, png(16, 8)),    // already small: untouched dims
      (3L, "garbage".getBytes("UTF-8"))) // undecodable: pass-through
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("image/png").as("kind"), col("payload"))
    val resized = Multimodal.resizeImages(media, 32)
    val byId = resized.collect().map(r => r.getLong(0) -> r).toMap
    assert((byId(1L).getInt(2), byId(1L).getInt(3)) === ((32, 16)))
    assert((byId(2L).getInt(2), byId(2L).getInt(3)) === ((16, 8)))
    assert((byId(3L).getInt(2), byId(3L).getInt(3)) === ((-1, -1)))
    assert(byId(3L).getAs[Array[Byte]]("payload").toSeq ===
      "garbage".getBytes("UTF-8").toSeq, "undecodable passes through")
    // the resized payload is a REAL image: decode reports the new dims
    val redecoded = Multimodal.decode(
        resized.filter(col("media_id") === 1L)
          .select("media_id", "kind", "payload"))
      .collect().head
    assert((redecoded.width, redecoded.height) === ((32, 16)))
  }

  test("multimodal: undecodable image payload flags -1, does not crash") {
    val media = Seq((9L, "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(col("media_id"), lit("image/png").as("kind"), col("payload"))
    val r = Multimodal.decode(media).collect().head
    assert(r.width == -1 && r.height == -1)
    assert(r.features.isEmpty)
    assert(r.n_bytes == 19L)
  }

  test("multimodal: frame sampling on payloads shorter than n frames") {
    import spark.implicits._
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val media = Multimodal.asMediaFrame(tiny, "doc_id", "text", "tiny")
    val frames = Multimodal.frameSample(media, 4).collect()
    // 2 bytes / 4 frames -> step 1: exactly 2 non-empty 1-byte frames
    assert(frames.length == 2)
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 1))
  }

  // ---- r7: real video container metadata (MP4 box walk / AVI header)

  /** Minimal-but-valid MP4: ftyp + moov(mvhd + audio trak(0×0) +
    * video trak(tkhd 640×360)), timescale 1000, duration 5000 → 5 s.
    * The audio track comes FIRST to prove the walker skips 0×0 tracks. */
  private def mp4Bytes(v1Tkhd: Boolean = false): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length)
      bb.put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mvhdP = java.nio.ByteBuffer.allocate(100)
    mvhdP.putInt(0)            // version 0 + flags
    mvhdP.putInt(0).putInt(0)  // ctime, mtime
    mvhdP.putInt(1000)         // timescale
    mvhdP.putInt(5000)         // duration -> 5 s
    val mvhd = box("mvhd", mvhdP.array())
    def tkhd(w: Int, h: Int): Array[Byte] =
      if (v1Tkhd) {
        val p = java.nio.ByteBuffer.allocate(96)
        p.putInt(0x01000000)   // version 1 + flags
        p.position(88)
        p.putInt(w << 16).putInt(h << 16)
        box("tkhd", p.array())
      } else {
        val p = java.nio.ByteBuffer.allocate(84)
        p.putInt(0)            // version 0 + flags
        p.position(76)
        p.putInt(w << 16).putInt(h << 16)
        box("tkhd", p.array())
      }
    val audioTrak = box("trak", tkhd(0, 0))
    val videoTrak = box("trak", tkhd(640, 360))
    val moov = box("moov", mvhd ++ audioTrak ++ videoTrak)
    ftyp ++ moov
  }

  /** Minimal-but-valid AVI: RIFF('AVI ' LIST('hdrl' avih)) —
    * 320×240, 300 frames × 33333 µs ≈ 10 s. */
  private def aviBytes(): Array[Byte] = {
    val avihP = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avihP.putInt(33333)        // dwMicroSecPerFrame
    avihP.position(16)
    avihP.putInt(300)          // dwTotalFrames
    avihP.position(32)
    avihP.putInt(320).putInt(240)
    val bb = java.nio.ByteBuffer.allocate(12 + 12 + 8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 12 + 8 + 56)
    bb.put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56)
    bb.put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(56).put(avihP.array())
    bb.array()
  }

  test("multimodal: video kinds parse REAL container metadata (r7)") {
    import graft.multimodal.VideoMeta
    // pure parser: MP4 v0 + v1 tkhd, AVI, hostile inputs
    assert(VideoMeta.parse(mp4Bytes()) ===
      Some(VideoMeta.VideoInfo(640, 360, 5000L)))
    assert(VideoMeta.parse(mp4Bytes(v1Tkhd = true)) ===
      Some(VideoMeta.VideoInfo(640, 360, 5000L)))
    assert(VideoMeta.parse(aviBytes()) ===
      Some(VideoMeta.VideoInfo(320, 240, 9999900L / 1000L)))
    assert(VideoMeta.parse("not a video at all".getBytes) === None)
    assert(VideoMeta.parse(Array.empty[Byte]) === None)
    assert(VideoMeta.parse(mp4Bytes().take(20)) === None) // truncated moov
    // a hostile size field must not crash or loop
    val hostile = mp4Bytes()
    hostile(0) = 0x7f.toByte // absurd first-box length
    assert(VideoMeta.parse(hostile) === None)

    // through the decode() pipeline: real dims + duration feature,
    // quarantine for unparseable video payloads
    val media = spark.createDataFrame(Seq(
      (1L, "video/mp4", mp4Bytes()),
      (2L, "video/avi", aviBytes()),
      (3L, "video/mp4", "garbage payload".getBytes))).toDF(
      "media_id", "kind", "payload")
    val out = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(out(0).width === 640 && out(0).height === 360)
    assert(out(0).features.toSeq === Seq(5.0f))
    assert(out(1).width === 320 && out(1).height === 240)
    assert(math.abs(out(1).features.head - 9.9999) < 0.01)
    assert(out(2).width === -1 && out(2).height === -1)
    assert(out(2).features.isEmpty)
  }

  test("q_tfidf: corpus-frequent words score zero, df=1 words score max") {
    val rows = SparkEntry.queries("q_tfidf")(spark, sf).collect()
    assert(rows.length === 50)
    val n = docs.select("doc_id").distinct().count()
    rows.foreach { r =>
      val (tf, df, score) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      val expect = tf * math.log(n.toDouble / df)
      assert(math.abs(score - expect) < 1e-3, s"${r.getString(1)}")
      assert(df < n, "a word in every doc has idf 0 and can't reach top-50")
    }
    // descending by score with full tie-break
    val scores = rows.map(_.getDouble(4)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("multimodal: image dHash — resize-stable, inversion-sensitive, " +
      "corrupt quarantined (r8)") {
    import spark.implicits._
    def gradientPng(w: Int, h: Int, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v0 = (x * 255) / math.max(1, w - 1)
        val v = if (invert) 255 - v0 else v0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, "image/png", gradientPng(64, 48, invert = false)),
      (2L, "image/png", gradientPng(32, 24, invert = false)), // resized twin
      (3L, "image/png", gradientPng(64, 48, invert = true)),  // opposite
      (4L, "image/png", Array[Byte](1, 2, 3))                 // corrupt
    ).toDF("media_id", "kind", "payload")
    val hs = Multimodal.imageDHash(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(!hs(4L)._2, "corrupt payload must be quarantined")
    assert(hs(1L)._2 && hs(2L)._2 && hs(3L)._2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the same gradient at half size hashes (near-)identically
    assert(ham(hs(1L)._1, hs(2L)._1) <= 6,
      s"resize should preserve the dHash: ${ham(hs(1L)._1, hs(2L)._1)}")
    // the inverted gradient flips (nearly) every comparison
    assert(ham(hs(1L)._1, hs(3L)._1) >= 32,
      s"inversion should flip most bits: ${ham(hs(1L)._1, hs(3L)._1)}")
    // pigeonhole near-dup pairs find exactly the resized twin
    val pairs = Multimodal.imageNearDups(media, maxDist = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("q_token_zipf: non-positive slope, r2 in [0,1], exact rank fit " +
      "reproduces the slope (r8)") {
    val rows = SparkEntry.queries("q_token_zipf")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // ranked desc by construction → the fitted slope cannot be positive
      assert(r.getAs[Double]("slope") <= 0.0, s"$r")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(r.getAs[Long]("n_tokens") >= 2L) // regression is defined
    }
    // independent slope recomputation for one language via the closed
    // form beta = cov(x,y)/var(x) over the same ranked top-100
    val lang = rows.head.getString(0)
    val freq = Tables.table(spark, sf, "documents")
      .filter(col("lang") === lang)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(100)
      .collect().map(_.getAs[Long]("cnt"))
    val xy = freq.zipWithIndex.map { case (c, i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val (mx, my) = (xy.map(_._1).sum / xy.length, xy.map(_._2).sum / xy.length)
    val beta = xy.map { case (x, y) => (x - mx) * (y - my) }.sum /
      xy.map { case (x, _) => (x - mx) * (x - mx) }.sum
    assert(math.abs(rows.head.getAs[Double]("slope") - beta) < 1e-3)
  }

  test("q_map_struct: every props map has exactly the single key 'k'") {
    val rows = SparkEntry.queries("q_map_struct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_keys") === 1L)
      assert(r.getAs[String]("min_key") === "k")
      assert(r.getAs[Long]("sum_kv") >= 0L)
    }
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total === Tables.table(spark, sf, "events").count())
  }
}
