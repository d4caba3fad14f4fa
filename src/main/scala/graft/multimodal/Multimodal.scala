package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by the (stubbed) decoders. */
case class MediaFeatures(media_id: Long, kind: String, width: Int,
    height: Int, n_bytes: Long, features: Array[Float])

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-local batch transforms.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so [[stubDecode]] derives deterministic fake dimensions/features from
  * the payload bytes (documented, test-pinned). Everything around it is
  * the real Spark shape a production decoder plugs into:
  *
  *   - schema: `(media_id LONG, kind STRING, payload BINARY)` + metadata;
  *   - execution: `mapPartitions` — partition-local, iterator-to-iterator
  *     (no per-row task overhead, no driver collect), the Scala analogue
  *     of a Pandas-UDF `mapInPandas` batch loop;
  *   - scale: payloads never shuffle unless the plan demands it; feature
  *     vectors (small) flow onward, so repartition BEFORE decode by
  *     `media_id` to spread codec CPU, not after.
  *
  * A real deployment replaces the body of [[decodeBytes]] with the codec
  * call; nothing else changes.
  */
object Multimodal {
  /** Wrap any table into the canonical media frame (here: text bytes as
    * payload — the plumbing is payload-agnostic). */
  def asMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"))

  /** STUB decode: deterministic pseudo-metadata + an 8-dim feature vector
    * from payload bytes. Replace with a real codec at deployment. */
  private[multimodal] def decodeBytes(id: Long, kind: String,
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

  /** Batch decode: partition-local, iterator-to-iterator. */
  def stubDecode(media: DataFrame): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          decodeBytes(r.getLong(0), r.getString(1),
            r.getAs[Array[Byte]](2))
        }
      }(enc)
  }

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
}
