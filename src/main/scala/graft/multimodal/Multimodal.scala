package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by the decoders. */
case class MediaFeatures(media_id: Long, kind: String, width: Int,
    height: Int, n_bytes: Long, features: Array[Float])

/** Perceptual fingerprint record produced by [[Multimodal.imageDHash]]
  * and [[Multimodal.audioContourHash]]: 64-bit image difference hash /
  * 32-bit audio loudness contour; `decodable = false` is the standard
  * decode quarantine (hash 0). */
case class ImageHash(media_id: Long, kind: String, dhash: Long,
    decodable: Boolean)

/** Resized-media record produced by [[Multimodal.resizeImages]]. */
case class ResizedMedia(media_id: Long, kind: String, width: Int,
    height: Int, n_bytes: Long, payload: Array[Byte])

/** One sampled frame produced by [[Multimodal.sampleGifFrames]]. */
case class SampledFrame(media_id: Long, frame_no: Int,
    frame_bytes: Array[Byte], width: Int, height: Int)

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-local batch transforms.
  *
  * IMAGE DECODE IS REAL: `kind = "image*"` payloads go through JDK
  * `javax.imageio` (PNG/JPEG/BMP/GIF read offline, no added dependency) —
  * true pixel dimensions plus an 8-bin normalized luminance histogram as
  * the feature vector. Undecodable image payloads surface loudly as
  * `width = height = -1` with empty features (a curation pipeline filters
  * or quarantines on that flag; silently faking dimensions would poison
  * downstream stats).
  *
  * AUDIO DECODE IS REAL TOO: `kind = "audio*"` payloads go through JDK
  * `javax.sound.sampled` (WAV/AIFF/AU PCM read offline, no added
  * dependency) — true channel count and sample rate plus an 8-segment
  * normalized RMS loudness envelope as the feature vector (the standard
  * cheap audio fingerprint for curation: silence/clipping detection,
  * coarse near-dup blocking). Same quarantine shape on failure.
  *
  * VIDEO CONTAINER METADATA IS REAL (r7): `kind = "video*"` payloads go
  * through [[VideoMeta]] — a pure-JVM MP4 box walk (`moov/trak/tkhd`
  * dims, `mvhd` duration) and AVI RIFF `avih` header parse, public
  * format specs, no codec — true width/height plus duration-seconds as
  * the feature. The JDK has no general video codec, so frame PIXELS
  * remain out of reach; unparseable video quarantines as `-1` like every
  * other kind, and frame SAMPLING is real for animated GIF
  * ([[sampleGifFrames]]: true per-frame extraction via ImageIO's
  * multi-frame reader, each sampled frame re-encoded PNG and decodable
  * by [[decode]]). [[stubFeatures]] now covers only kinds that are
  * neither image, audio, nor video. Either way the Spark shape is the
  * production one:
  *
  *   - schema: `(media_id LONG, kind STRING, payload BINARY)` + metadata;
  *   - execution: `mapPartitions` — partition-local, iterator-to-iterator
  *     (no per-row task overhead, no driver collect), the Scala analogue
  *     of a Pandas-UDF `mapInPandas` batch loop;
  *   - scale: payloads never shuffle unless the plan demands it; feature
  *     vectors (small) flow onward, so repartition BEFORE decode by
  *     `media_id` to spread codec CPU, not after.
  *
  * A real deployment swaps [[stubFeatures]] for whatever decoder its
  * leftover kinds need, and extends [[decodeVideo]]'s features with a
  * codec's frame-level signal; nothing else changes.
  */
object Multimodal {
  /** Wrap any table into the canonical media frame (here: text bytes as
    * payload — the plumbing is payload-agnostic). */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"))

  /** STUB features for kinds outside image/audio/video (no decoder OF
    * ANY KIND applies — e.g. ad-hoc binary blobs in the media frame):
    * deterministic pseudo-metadata + an 8-dim feature vector from payload
    * bytes. Replace with a real decoder at deployment. */
  private[multimodal] def stubFeatures(id: Long, kind: String,
      payload: Array[Byte]): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    val w = 64 + (h & 0x3ff).toInt          // fake width 64..1087
    val ht = 64 + ((h >>> 10) & 0x3ff).toInt
    val feats = Array.tabulate(8) { j =>
      // deterministic fake embedding: mix of hash and byte prefix
      val m = graft.functions.MinHashAgg.splitmix64(h + j)
      (m.toDouble / Long.MaxValue).toFloat
    }
    MediaFeatures(id, kind, w, ht, payload.length.toLong, feats)
  }

  /** REAL image decode via JDK ImageIO (PNG/JPEG/BMP/GIF — all available
    * offline, headless-safe): true width/height plus an 8-bin luminance
    * histogram (Rec.601 weights, normalized to sum 1) as the feature
    * vector. Returns `width = height = -1` and empty features when
    * ImageIO cannot decode the payload — the loud per-row failure shape
    * (a corrupt image must not crash a 100 TB decode stage OR silently
    * pass fake dimensions downstream). */
  private[multimodal] def decodeImage(id: Long, kind: String,
      payload: Array[Byte]): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null } // truncated/hostile bytes → flagged
    if (img == null)
      MediaFeatures(id, kind, -1, -1, payload.length.toLong,
        Array.empty[Float])
    else {
      val w = img.getWidth
      val h = img.getHeight
      val bins = new Array[Long](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000 // Rec.601 integer luminance 0..255
          bins(lum >> 5) += 1L // 8 bins of width 32
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      MediaFeatures(id, kind, w, h, payload.length.toLong,
        bins.map(b => (b.toDouble / n).toFloat))
    }
  }

  /** REAL audio decode via JDK javax.sound.sampled (WAV/AIFF/AU — all
    * available offline): true channel count and sample rate, plus an
    * 8-segment RMS loudness envelope (each segment's root-mean-square
    * amplitude over full-scale, so 0 = silence, ~0.7 = full-scale sine)
    * as the feature vector. Non-PCM encodings are converted to 16-bit
    * signed PCM first (the JDK converts u-law/a-law/8-bit for free).
    *
    * Schema mapping (MediaFeatures is the one decoded-media record all
    * kinds share): `width = channels`, `height = sample rate (Hz)` —
    * documented here and in MIGRATION.md. Undecodable payloads return
    * `width = height = -1` with empty features, the same loud quarantine
    * flag as [[decodeImage]]. */
  private[multimodal] def decodeAudio(id: Long, kind: String,
      payload: Array[Byte]): MediaFeatures = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val quarantine =
      MediaFeatures(id, kind, -1, -1, payload.length.toLong,
        Array.empty[Float])
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val src = raw.getFormat
      // normalize to 16-bit signed little-endian PCM at the source rate
      // so the sample loop below handles every JDK-readable encoding
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        2 * src.getChannels, src.getSampleRate, false)
      val in = AudioSystem.getAudioInputStream(fmt, raw)
      val bytes =
        try in.readAllBytes()
        finally { in.close(); raw.close() }
      val nSamples = bytes.length / 2 // interleaved 16-bit samples
      if (nSamples == 0) quarantine
      else {
        val sums = new Array[Double](8)
        val counts = new Array[Long](8)
        var i = 0
        while (i < nSamples) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toDouble
          val seg = (i * 8L / nSamples).toInt
          sums(seg) += s * s
          counts(seg) += 1L
          i += 1
        }
        val feats = Array.tabulate(8) { j =>
          if (counts(j) == 0L) 0f
          else (math.sqrt(sums(j) / counts(j)) / 32768.0).toFloat
        }
        MediaFeatures(id, kind, fmt.getChannels,
          math.round(fmt.getSampleRate), payload.length.toLong, feats)
      }
    } catch { case _: Exception => quarantine } // truncated/hostile bytes
  }

  /** REAL video container metadata via [[VideoMeta]] (MP4 box walk /
    * AVI RIFF header — pure JVM, public specs, no codec): true
    * width/height plus duration (seconds) as a 1-element feature vector.
    * Frame pixels still need a codec the JDK lacks, so that is the
    * feature surface a container can honestly provide. Unparseable
    * payloads return the `width = height = -1` quarantine, the same loud
    * flag as [[decodeImage]] — never hash-derived fake dims. */
  private[multimodal] def decodeVideo(id: Long, kind: String,
      payload: Array[Byte]): MediaFeatures =
    VideoMeta.parse(payload) match {
      case Some(v) =>
        MediaFeatures(id, kind, v.width, v.height, payload.length.toLong,
          Array((v.durationMs / 1000.0).toFloat))
      case None =>
        MediaFeatures(id, kind, -1, -1, payload.length.toLong,
          Array.empty[Float])
    }

  private[multimodal] def decodeBytes(id: Long, kind: String,
      payload: Array[Byte]): MediaFeatures =
    if (kind != null && kind.startsWith("image")) decodeImage(id, kind, payload)
    else if (kind != null && kind.startsWith("audio"))
      decodeAudio(id, kind, payload)
    else if (kind != null && kind.startsWith("video"))
      decodeVideo(id, kind, payload)
    else stubFeatures(id, kind, payload)

  /** Batch decode: partition-local, iterator-to-iterator. Image kinds
    * decode for real (ImageIO), audio kinds decode for real
    * (javax.sound.sampled), video kinds parse REAL container metadata
    * (MP4/AVI headers — [[decodeVideo]]); only kinds outside
    * image/audio/video take the documented stub. */
  def decode(media: DataFrame): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          decodeBytes(r.getLong(0), r.getString(1),
            r.getAs[Array[Byte]](2))
        }
      }(enc)
  }

  /** Back-compat alias for [[decode]] (the name predates the real image
    * path; non-image kinds still stub). */
  def stubDecode(media: DataFrame): Dataset[MediaFeatures] = decode(media)

  /** STUB resize: deterministic byte-level downsample of the payload
    * (every `factor`-th byte) with the metadata scaled to match — the
    * plumbing (binary in, smaller binary + adjusted dims out, pure
    * column ops) is what a real image resize plugs into. */
  def stubResize(decoded: Dataset[MediaFeatures], media: DataFrame,
      factor: Int): DataFrame = {
    require(factor >= 2, "factor must be >= 2")
    val small = media.select(col("media_id"), col("payload"))
      .withColumn("resized",
        expr(s"""filter(transform(split(hex(payload), '(?<=\\\\G..)'),
          (h, i) -> IF(i % $factor = 0, h, NULL)), x -> x IS NOT NULL)"""))
      .select(col("media_id"),
        expr("unhex(concat_ws('', resized))").as("resized_payload"))
    decoded.toDF().join(small, "media_id")
      .select(col("media_id"), col("kind"),
        (col("width") / factor).cast("int").as("width"),
        (col("height") / factor).cast("int").as("height"),
        octet_length(col("resized_payload")).cast("long").as("n_bytes"),
        col("resized_payload"))
  }

  /** REAL image resize via ImageIO + Graphics2D (image kinds only):
    * decode, scale so the longest edge is `maxDim` (never upscale),
    * re-encode as PNG. Partition-local `mapPartitions`, same shape as
    * [[decode]] — payloads in, smaller payloads + true new dims out.
    * Undecodable payloads pass through UNCHANGED with `width = height =
    * -1` (quarantine flag, consistent with [[decodeImage]]).
    *
    * Output: `(media_id LONG, kind STRING, width INT, height INT,
    * n_bytes LONG, payload BINARY)` — the resized media frame, ready to
    * feed back into [[decode]] / downstream stages. */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1, "maxDim must be >= 1")
    val enc = org.apache.spark.sql.Encoders.product[ResizedMedia]
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, kind, payload) =
            (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null)
            ResizedMedia(id, kind, -1, -1, payload.length.toLong, payload)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
            val (nw, nh) = (math.max(1, math.round(w * scale).toInt),
              math.max(1, math.round(h * scale).toInt))
            val out = new java.awt.image.BufferedImage(nw, nh,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            val bytes = bos.toByteArray
            ResizedMedia(id, kind, nw, nh, bytes.length.toLong, bytes)
          }
        }
      }(enc).toDF()
  }

  /** REAL frame sampling for animated GIF payloads — the one multi-frame
    * format the JDK decodes offline (ImageIO's GIF reader exposes every
    * frame). Picks `n` evenly-spaced frames (all of them when the GIF has
    * ≤ n), re-encodes each as PNG, and emits one row per sampled frame:
    * `(media_id, frame_no, frame_bytes, width, height)` — `frame_no` is
    * the ORIGINAL frame index, and each `frame_bytes` feeds straight back
    * into [[decode]]. Same shape a real video pipeline produces from its
    * codec; same partition-local `mapPartitions` execution as [[decode]].
    *
    * FRAME SEMANTICS: frames are the RAW STORED frames as
    * `ImageReader.read(i)` returns them. For delta-optimized GIFs
    * (frames stored as sub-rectangles over a disposal canvas) a sampled
    * frame may be a partial rect, not the composited visible frame —
    * compositing would need the IIOMetadata offsets/disposal chain. The
    * dims reported are the stored frame's, which is exactly what
    * [[decode]] will re-report when fed `frame_bytes`.
    * Undecodable/single-frame-failed payloads emit ZERO rows plus nothing
    * else (a corrupt asset must not kill the 100 TB stage; its absence
    * from the output IS the quarantine signal — count-join against the
    * input to list casualties). */
  def sampleGifFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val enc = Encoders.product[SampledFrame]
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (id, payload) = (r.getLong(0), r.getAs[Array[Byte]](1))
          // the input stream must close on EVERY path (no-reader, corrupt
          // payload, mid-read exception): with ImageIO's default
          // file-backed cache each leaked stream pins an fd + temp file,
          // and the corrupt-asset path is exactly the one a long-lived
          // executor hits millions of times
          var in: javax.imageio.stream.ImageInputStream = null
          var reader: javax.imageio.ImageReader = null
          try {
            in = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            val readers = javax.imageio.ImageIO.getImageReaders(in)
            if (!readers.hasNext) Nil
            else {
              reader = readers.next()
              reader.setInput(in)
              val m = reader.getNumImages(true)
              if (m <= 0) Nil
              else {
                // n evenly spaced original-frame indices, dedup-ordered
                val picks =
                  if (m <= n) 0 until m
                  else (0 until n).map(k => k * m / n)
                picks.distinct.map { fi =>
                  val img = reader.read(fi)
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "png", bos)
                  SampledFrame(id, fi, bos.toByteArray,
                    img.getWidth, img.getHeight)
                }
              }
            }
          } catch { case _: Exception => Nil } // corrupt asset -> no rows
          finally {
            if (reader != null) reader.dispose()
            if (in != null)
              try in.close() catch { case _: Exception => () }
          }
        }
      }(enc).toDF()
  }

  /** Frame sampling plumbing: split a payload into `n` byte slices
    * (stand-in for video frame extraction) — pure column ops, stays in
    * codegen; returns one row per (media_id, frame_no, frame_bytes). */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val len = octet_length(col("payload"))
    val step = greatest((len / n).cast("int"), lit(1))
    media.select(col("media_id"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_no", "k")),
        col("payload"), step.as("step"))
      .select(col("media_id"), col("frame_no"),
        expr("substring(payload, k * step + 1, step)").as("frame_bytes"))
      // payloads shorter than n bytes yield empty trailing slices — drop
      // them rather than hand empty frames to a decoder
      .filter(octet_length(col("frame_bytes")) > 0)
  }

  /** Perceptual difference hash (dHash, r8) — IMAGE near-dup dedup over
    * the REAL decoder: decode, scale to a 9×8 grayscale grid (bilinear,
    * the [[resizeImages]] path), emit a 64-bit hash where bit (y*8+x)
    * says "pixel (x,y) is brighter than its right neighbor". Re-encodes,
    * resizes, and mild brightness shifts preserve most bits, so
    * near-duplicate images land within a small Hamming distance — the
    * image-side analogue of the text SimHash pipeline, and it composes
    * with the SAME pigeonhole blocking ([[imageNearDups]]).
    *
    * Undecodable payloads emit `decodable = false` with hash 0 — the
    * quarantine contract of every decode stage here. Partition-local
    * map; at 100 TB this is one pass over the payload column. */
  def imageDHash(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[ImageHash]
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, kind, payload) =
            (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null) ImageHash(id, kind, 0L, decodable = false)
          else {
            val grid = new java.awt.image.BufferedImage(9, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = grid.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, 9, 8, null)
            } finally g.dispose()
            def lum(x: Int, y: Int): Int = {
              val rgb = grid.getRGB(x, y)
              (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
            }
            var hash = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (lum(x, y) > lum(x + 1, y))
                  hash |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            ImageHash(id, kind, hash, decodable = true)
          }
        }
      }(enc).toDF()
  }

  /** Audio loudness-contour hash (r8) — the audio analogue of
    * [[imageDHash]]: decode to 16-bit PCM (the [[decodeAudio]] path),
    * split into 33 equal segments, compute each segment's RMS, and emit
    * a 32-bit hash where bit i says "segment i is louder than segment
    * i+1". Re-encodes and level shifts preserve the contour, so
    * near-duplicate recordings land within a small Hamming distance.
    * Sub-quadratic pairing: [[audioNearDups]] ([[hammingPairs]] at the
    * contour's TRUE 32-bit geometry — the 64-bit image geometry would
    * make the high chunks constant and the join quadratic).
    * Undecodable payloads emit
    * `decodable = false` — the standard quarantine. */
  def audioContourHash(media: DataFrame): DataFrame = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val enc = org.apache.spark.sql.Encoders.product[ImageHash]
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val (id, kind, payload) =
            (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
          try {
            val raw = AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val src = raw.getFormat
            val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels,
              2 * src.getChannels, src.getSampleRate, false)
            val in = AudioSystem.getAudioInputStream(fmt, raw)
            val bytes =
              try in.readAllBytes()
              finally { in.close(); raw.close() }
            val nSamples = bytes.length / 2
            // shorter-than-33-sample clips still DECODE — empty trailing
            // segments just read RMS 0; only zero-length PCM quarantines
            if (nSamples == 0) ImageHash(id, kind, 0L, decodable = false)
            else {
              val sums = new Array[Double](33)
              val counts = new Array[Long](33)
              var i = 0
              while (i < nSamples) {
                val sm =
                  ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toDouble
                val seg = (i * 33L / nSamples).toInt
                sums(seg) += sm * sm
                counts(seg) += 1L
                i += 1
              }
              val rms = Array.tabulate(33)(j =>
                if (counts(j) == 0L) 0.0 else math.sqrt(sums(j) / counts(j)))
              var hash = 0L
              var j = 0
              while (j < 32) {
                if (rms(j) > rms(j + 1)) hash |= 1L << j
                j += 1
              }
              ImageHash(id, kind, hash, decodable = true)
            }
          } catch {
            case _: Exception => ImageHash(id, kind, 0L, decodable = false)
          }
        }
      }(enc).toDF()
  }

  /** Generic pigeonhole Hamming pairing over a `bits`-wide hash column:
    * split into `maxDist + 1` chunks; two hashes within the bound must
    * agree on at least one WHOLE chunk, so candidates come from
    * chunk-equality joins and only they are Hamming-verified. The
    * CALLER passes the true hash width — chunking a 32-bit hash with
    * 64-bit geometry would make the high chunks constant and the join
    * quadratic. Same plan shape (and worst-case caveats) as
    * `q_simhash_pairs`. `hashes` must carry (`media_id`, `dhash`) and
    * should be cached by the caller if producing it is expensive. */
  def hammingPairs(hashes: DataFrame, bits: Int, maxDist: Int)
      : DataFrame = {
    require(bits >= 1 && bits <= 64, "1 <= bits <= 64")
    require(maxDist >= 0 && maxDist < bits, "0 <= maxDist < bits")
    val nChunks = maxDist + 1
    val width = bits / nChunks
    require(width >= 1, "maxDist + 1 chunks need >= 1 bit each")
    // full-width chunk masks, no 63-bit clamp: at maxDist=0 the single
    // chunk spans all `bits` (for bits=64 that mask is -1L — `1L << 64`
    // would wrap to 1 under JVM shift-mod-64), so a bit-63-only
    // difference correctly fails the chunk-equality blocking instead of
    // leaking through as a candidate (ADVICE r8).
    def chunkMask(i: Int): Long =
      if (width == 64) -1L else ((1L << width) - 1) << (i * width)
    val chunked = hashes.select(col("media_id"), col("dhash"),
      explode(array((0 until nChunks).map { i =>
        struct(lit(i).as("ci"),
          col("dhash").bitwiseAND(lit(chunkMask(i))).as("cv"))
      }: _*)).as("c"))
      .select(col("media_id"), col("dhash"),
        col("c.ci").as("ci"), col("c.cv").as("cv"))
    val a = chunked.select(col("media_id").as("ia"),
      col("dhash").as("ha"), col("ci"), col("cv"))
    val b = chunked.select(col("media_id").as("ib"),
      col("dhash").as("hb"), col("ci").as("ci_b"), col("cv").as("cv_b"))
    a.join(b, col("ci") === col("ci_b") && col("cv") === col("cv_b") &&
        col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Near-duplicate image PAIRS within Hamming distance `maxDist` of
    * their [[imageDHash]]es — [[hammingPairs]] at 64-bit geometry over
    * the cached decode (both join sides read the hash frame; uncached,
    * every payload would ImageIO-decode twice). */
  def imageNearDups(media: DataFrame, maxDist: Int): DataFrame =
    hammingPairs(
      graft.Caching.cache(imageDHash(media)
        .filter(col("decodable"))
        .select(col("media_id"), col("dhash"))),
      bits = 64, maxDist = maxDist)

  /** Near-duplicate audio PAIRS within Hamming distance `maxDist` of
    * their [[audioContourHash]]es — [[hammingPairs]] at the contour's
    * TRUE 32-bit geometry (the caveat its scaladoc records). */
  def audioNearDups(media: DataFrame, maxDist: Int): DataFrame =
    hammingPairs(
      graft.Caching.cache(audioContourHash(media)
        .filter(col("decodable"))
        .select(col("media_id"), col("dhash"))),
      bits = 32, maxDist = maxDist)
}
