package graft.multimodal

/** Pure-JVM video CONTAINER metadata — no codec, no dependency: the
  * dimensions/duration a curation pipeline filters and buckets on,
  * recovered from the container headers alone.
  *
  *  - MP4 / QuickTime (ISO BMFF, public spec ISO/IEC 14496-12): walk the
  *    box tree; `moov/mvhd` carries timescale+duration, `moov/trak/tkhd`
  *    carries the track's presentation width/height (16.16 fixed point).
  *    The first track with nonzero dims is the video track (audio tracks
  *    encode 0×0).
  *  - AVI (Microsoft RIFF spec): walk the chunk tree; the `avih` main
  *    header carries dwWidth/dwHeight and dwTotalFrames ×
  *    dwMicroSecPerFrame = duration.
  *
  * Frame DECODE still requires a codec the JDK lacks —
  * [[Multimodal.decode]] quarantines video payloads this parser cannot
  * read (`width = height = -1`), and [[Multimodal.stubFeatures]] remains
  * only for kinds that are neither image, audio, nor video. Every read
  * is bounds-checked; malformed or hostile headers yield None, never an
  * exception or a fake dimension.
  */
object VideoMeta {
  final case class VideoInfo(width: Int, height: Int, durationMs: Long)

  def parse(payload: Array[Byte]): Option[VideoInfo] =
    try {
      if (isMp4(payload)) parseMp4(payload)
      else if (isAvi(payload)) parseAvi(payload)
      else None
    } catch { case _: Exception => None }

  // ---- shared byte readers (big-endian for MP4, little-endian for AVI)

  private def fourcc(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) ""
    else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  // ---- MP4 / ISO BMFF

  private val mp4TopBoxes =
    Set("ftyp", "moov", "mdat", "free", "skip", "wide", "styp", "pdin")

  private def isMp4(b: Array[Byte]): Boolean =
    b.length >= 16 && mp4TopBoxes.contains(fourcc(b, 4))

  private def parseMp4(b: Array[Byte]): Option[VideoInfo] = {
    var durationMs = -1L
    var w = -1
    var h = -1

    def mvhd(p: Int, end: Int): Unit = {
      if (p >= end) return
      val version = b(p) & 0xff
      val (ts, dur) =
        if (version == 1 && p + 32 <= end)
          (be32(b, p + 20), be64(b, p + 24))
        else if (version == 0 && p + 20 <= end)
          (be32(b, p + 12), be32(b, p + 16))
        else (0L, 0L)
      if (ts > 0) durationMs = dur * 1000L / ts
    }

    def tkhd(p: Int, end: Int): Unit = {
      if (p >= end) return
      val version = b(p) & 0xff
      // width/height close the fixed-length box: 16.16 fixed point at
      // payload offset 76 (v0) / 88 (v1) per ISO/IEC 14496-12 §8.3.2
      val off = if (version == 1) 88 else 76
      if (p + off + 8 <= end) {
        val tw = (be32(b, p + off) >> 16).toInt
        val th = (be32(b, p + off + 4) >> 16).toInt
        if (tw > 0 && th > 0 && w < 0) { w = tw; h = th }
      }
    }

    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return
      var off = start
      var continue = true
      while (continue && off + 8 <= end) {
        val size0 = be32(b, off)
        val typ = fourcc(b, off + 4)
        var hdr = 8L
        var size = size0
        if (size0 == 1 && off + 16 <= end) { size = be64(b, off + 8); hdr = 16 }
        else if (size0 == 0) size = end - off // box extends to the end
        if (size < hdr || off + size > end || size > Int.MaxValue)
          continue = false // malformed length — stop, never scan past it
        else {
          val pStart = (off + hdr).toInt
          val pEnd = (off + size).toInt
          typ match {
            case "moov" | "trak" => walk(pStart, pEnd, depth + 1)
            case "mvhd"          => mvhd(pStart, pEnd)
            case "tkhd"          => tkhd(pStart, pEnd)
            case _               => ()
          }
          off = pEnd
        }
      }
    }

    walk(0, b.length, 0)
    if (w > 0 && h > 0) Some(VideoInfo(w, h, math.max(0L, durationMs)))
    else None
  }

  // ---- AVI / RIFF

  private def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  private def parseAvi(b: Array[Byte]): Option[VideoInfo] = {
    def walk(start: Int, end: Int, depth: Int): Option[VideoInfo] = {
      if (depth > 8) return None
      var off = start
      while (off + 8 <= end) {
        val id = fourcc(b, off)
        val size = le32(b, off + 4)
        if (size < 0 || off + 8 + size > end) return None // malformed
        if (id == "LIST" && size >= 4) {
          // LIST payload: 4-byte list type, then sub-chunks
          val r = walk(off + 12, (off + 8 + size).toInt, depth + 1)
          if (r.isDefined) return r
        } else if (id == "avih" && size >= 40) {
          val p = off + 8
          val usPerFrame = le32(b, p)        // dwMicroSecPerFrame
          val totalFrames = le32(b, p + 16)  // dwTotalFrames
          val tw = le32(b, p + 32).toInt     // dwWidth
          val th = le32(b, p + 36).toInt     // dwHeight
          return if (tw > 0 && th > 0)
            Some(VideoInfo(tw, th, usPerFrame * totalFrames / 1000L))
          else None
        }
        off += (8 + size + (size & 1)).toInt // chunks are word-aligned
      }
      None
    }
    walk(12, b.length, 0)
  }
}
