package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video-container header parsers — the third leg of the multimodal
  * probe family ([[MultimodalCodecs.dims]] for images,
  * [[AudioCodecs.meta]] for audio): extract (format, width, height,
  * duration_ms) from container bytes alone, so duration filters,
  * resolution routing and corrupt-blob quarantine over a video corpus
  * never open a video decoder. MP4/ISO-BMFF (top-level box walk →
  * `moov` → `mvhd` for timescale/duration, first `trak` → `tkhd` for
  * the 16.16-fixed track dimensions), AVI (RIFF `hdrl`/`avih`
  * frame timing and dimensions) and WebM/Matroska (EBML element walk
  * → Segment → Info for TimestampScale/Duration, Tracks → TrackEntry
  * → Video for pixel dimensions — the dominant scraped-web video
  * container) per their public specs; anything unrecognized,
  * truncated or corrupt yields NULL, never a throw. */
object VideoCodecs {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  private def row(fmt: String, w: Int, h: Int, durMs: Long): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w, h, durMs))

  // ---- EBML (WebM / Matroska) ---------------------------------------

  /** EBML vint width from the first byte's marker bit (1..8); 0 =
    * invalid (a zero first byte encodes nothing). */
  private def vintLen(first: Int): Int = {
    var mask = 0x80; var len = 1
    while (len <= 8) {
      if ((first & mask) != 0) return len
      mask >>= 1; len += 1
    }
    0
  }

  /** One EBML vint at `i` (IDs keep the marker bit, sizes mask it).
    * Returns (value, width) or (−1, 0) when truncated/invalid. */
  private def readVint(b: Array[Byte], i: Int, to: Int,
                       maskMarker: Boolean): (Long, Int) = {
    if (i >= to) return (-1L, 0)
    val first = b(i) & 0xff
    val len = vintLen(first)
    if (len == 0 || i + len > to) return (-1L, 0)
    var v = if (maskMarker) (first & (0xff >>> len)).toLong else first.toLong
    var k = 1
    while (k < len) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
    (v, len)
  }

  /** First child element `id` (full ID, marker kept) among the
    * siblings in [from, to): payload bounds, or (−1, −1). An
    * unknown-size element (size vint all ones) extends to `to` when
    * it IS the match and ends the walk otherwise (siblings past it
    * are unreachable without parsing its children). Every step
    * strictly advances (id+size vints are ≥ 2 bytes). */
  private def findEbml(b: Array[Byte], from: Int, to: Int,
                       id: Long): (Int, Int) = {
    var i = from
    while (i < to) {
      val (eid, idLen) = readVint(b, i, to, maskMarker = false)
      if (idLen == 0) return (-1, -1)
      val (sz, szLen) = readVint(b, i + idLen, to, maskMarker = true)
      if (szLen == 0) return (-1, -1)
      val p = i + idLen + szLen
      val unknown = sz == (1L << (7 * szLen)) - 1
      if (eid == id) {
        if (unknown) return (p, to)
        if (sz > to - p) return (-1, -1)
        return (p, p + sz.toInt)
      }
      if (unknown || sz > to - p) return (-1, -1)
      i = p + sz.toInt
    }
    (-1, -1)
  }

  /** Unsigned-int payload of an EBML element (≤ 8 bytes). */
  private def ebmlUint(b: Array[Byte], from: Int, to: Int): Long = {
    var v = 0L; var i = from
    val end = math.min(to, from + 8)
    while (i < end) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** Float payload of an EBML element: 4 → IEEE-754 single, 8 →
    * double, anything else NaN. */
  private def ebmlFloat(b: Array[Byte], from: Int, to: Int): Double =
    (to - from) match {
      case 4 => java.lang.Float.intBitsToFloat(be32(b, from).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(be64(b, from))
      case _ => Double.NaN
    }

  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdDocType = 0x4282L

  /** WebM/Matroska header walk: EBML header (DocType → webm|mkv),
    * Segment → Info (TimestampScale ns/tick, default 1e6; Duration
    * float ticks) and Tracks → first TrackEntry → Video
    * (PixelWidth/PixelHeight). Null on anything truncated/corrupt. */
  private def ebmlMeta(b: Array[Byte]): InternalRow = {
    // the EBML header is itself an element: 1A45DFA3 + size + children
    val (hdrP, hdrEnd) = findEbml(b, 0, b.length, 0x1A45DFA3L)
    if (hdrP < 0) return null
    val fmt = {
      val (dtP, dtEnd) = findEbml(b, hdrP, hdrEnd, IdDocType)
      if (dtP < 0) "mkv"
      else new String(b, dtP, dtEnd - dtP, "US-ASCII") match {
        case "webm" => "webm"
        case _ => "mkv"
      }
    }
    val (segP, segEnd) = findEbml(b, hdrEnd, b.length, IdSegment)
    if (segP < 0) return null
    val (infoP, infoEnd) = findEbml(b, segP, segEnd, IdInfo)
    if (infoP < 0) return null
    val tsScale = {
      val (p, e) = findEbml(b, infoP, infoEnd, IdTimestampScale)
      if (p < 0) 1000000L else ebmlUint(b, p, e)
    }
    val dur = {
      val (p, e) = findEbml(b, infoP, infoEnd, IdDuration)
      if (p < 0) Double.NaN else ebmlFloat(b, p, e)
    }
    if (tsScale <= 0 || dur.isNaN || dur < 0) return null
    var w = 0; var h = 0
    val (trksP, trksEnd) = findEbml(b, segP, segEnd, IdTracks)
    if (trksP >= 0) {
      val (teP, teEnd) = findEbml(b, trksP, trksEnd, IdTrackEntry)
      if (teP >= 0) {
        val (vP, vEnd) = findEbml(b, teP, teEnd, IdVideo)
        if (vP >= 0) {
          val (wP, wEnd) = findEbml(b, vP, vEnd, IdPixelWidth)
          val (hP, hEnd) = findEbml(b, vP, vEnd, IdPixelHeight)
          if (wP >= 0) w = ebmlUint(b, wP, wEnd).toInt
          if (hP >= 0) h = ebmlUint(b, hP, hEnd).toInt
        }
      }
    }
    // duration ticks × ns/tick → ms; builder ticks are integral so
    // the double product is exact at header scales
    row(fmt, w, h, (dur * (tsScale.toDouble / 1e6)).toLong)
  }

  /** First child box of type `typ` inside [from, to): returns the
    * payload offset and end, or null bounds. Box = u32 BE size + 4cc;
    * size 1 → a u64 size follows (payload then starts at +16). */
  private def findBox(b: Array[Byte], from: Int, to: Int,
                      typ: String): (Int, Int) = {
    var i = from
    while (i + 8 <= to) {
      val sz0 = be32(b, i)
      val t = fourcc(b, i + 4)
      val (payload, size) =
        if (sz0 == 1L) {
          if (i + 16 > to) return (-1, -1)
          (i + 16, be64(b, i + 8))
        } else (i + 8, sz0)
      if (size < 8 || size > Int.MaxValue) return (-1, -1)
      val end = i + size.toInt
      if (end > to || end <= i) return (-1, -1)
      if (t == typ) return (payload, end)
      i = end
    }
    (-1, -1)
  }

  /** (format, width, height, duration_ms) of a recognized video
    * container header, else null. Pure byte inspection; total, never
    * throws. MP4 duration from mvhd timescale/duration (v0 and v1);
    * dimensions from the first trak's tkhd (16.16 fixed). AVI
    * duration from avih dwTotalFrames × dwMicroSecPerFrame. */
  def meta(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // WebM / Matroska: EBML magic
    if (b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)
      return ebmlMeta(b)
    // MP4 / ISO-BMFF: the first top-level box must be ftyp
    if (b.length >= 12 && fourcc(b, 4) == "ftyp") {
      val (moovP, moovEnd) = findBox(b, 0, b.length, "moov")
      if (moovP < 0) return null
      val (mvhdP, mvhdEnd) = findBox(b, moovP, moovEnd, "mvhd")
      if (mvhdP < 0) return null
      val ver = b(mvhdP) & 0xff
      val (ts, dur) =
        if (ver == 1) {
          if (mvhdP + 32 > mvhdEnd) return null
          (be32(b, mvhdP + 20), be64(b, mvhdP + 24))
        } else {
          if (mvhdP + 24 > mvhdEnd) return null
          (be32(b, mvhdP + 12), be32(b, mvhdP + 16))
        }
      if (ts <= 0) return null
      // FRAGMENTED MP4 (DASH/CMAF segments): the movie header carries
      // duration 0 and the real figure rides moov → mvex → mehd
      // (FullBox, fragment_duration in mvhd-timescale units — 64-bit
      // at v1, 32-bit at v0). Without this branch every fragmented
      // file reported 0 ms. mehd is optional; absent stays 0 (the
      // total then only exists by summing fragments, which a header
      // probe must not do).
      var durU = dur
      if (durU == 0) {
        val (mvexP, mvexEnd) = findBox(b, moovP, moovEnd, "mvex")
        if (mvexP >= 0) {
          val (mehdP, mehdEnd) = findBox(b, mvexP, mvexEnd, "mehd")
          // an empty-payload mehd (size 8) puts the version byte AT
          // the payload end — reading it would throw (review-caught)
          if (mehdP >= 0 && mehdP < mehdEnd) {
            val mv = b(mehdP) & 0xff
            if (mv == 1 && mehdP + 12 <= mehdEnd)
              durU = be64(b, mehdP + 4)
            else if (mv == 0 && mehdP + 8 <= mehdEnd)
              durU = be32(b, mehdP + 4)
          }
        }
      }
      // first trak's tkhd: width/height ride as 16.16 fixed at the
      // tail of the (v0: 84-byte, v1: 96-byte) body after ver/flags
      var w = 0; var h = 0
      val (trakP, trakEnd) = findBox(b, moovP, moovEnd, "trak")
      if (trakP >= 0) {
        val (tkP, tkEnd) = findBox(b, trakP, trakEnd, "tkhd")
        if (tkP >= 0) {
          val tv = b(tkP) & 0xff
          val dimOff = tkP + 4 + (if (tv == 1) 84 else 72)
          if (dimOff + 8 <= tkEnd) {
            w = be32(b, dimOff).toInt >>> 16
            h = be32(b, dimOff + 4).toInt >>> 16
          }
        }
      }
      return row("mp4", w, h, durU * 1000L / ts)
    }
    // AVI: RIFF("AVI ") → LIST("hdrl") → avih main header
    if (b.length >= 12 && fourcc(b, 0) == "RIFF" &&
        fourcc(b, 8) == "AVI ") {
      var i = 12
      while (i + 8 <= b.length) {
        val id = fourcc(b, i)
        val chunkSz = le32(b, i + 4)
        if (id == "LIST") {
          if (i + 12 > b.length) return null
          if (fourcc(b, i + 8) == "hdrl") {
            // children start after the 4-byte list type
            var j = i + 12
            val listEnd = math.min(b.length.toLong, i + 8 + chunkSz).toInt
            while (j + 8 <= listEnd) {
              if (fourcc(b, j) == "avih") {
                val p = j + 8
                if (p + 40 > b.length) return null
                val uspf = le32(b, p)
                val frames = le32(b, p + 16)
                val w = le32(b, p + 32).toInt
                val h = le32(b, p + 36).toInt
                return row("avi", w, h, frames * uspf / 1000L)
              }
              // a declared child size past the list can never need
              // walking, and the step must strictly advance — a
              // 0xFFFFFFF8-ish size would otherwise wrap j negative
              // or freeze it (review-caught)
              val csz = le32(b, j + 4)
              if (csz > listEnd - j - 8) return null
              j += 8 + csz.toInt
              j += (j & 1) // RIFF chunks pad to even
            }
            return null
          }
        }
        // i-relative guard BEFORE the step: a ~2 GB declared chunk
        // near the end of the buffer would overflow `i` (review-caught)
        if (chunkSz > b.length - i - 8) return null
        i += 8 + chunkSz.toInt + (chunkSz.toInt & 1)
      }
      return null
    }
    null
  }
}

/** `graft_video_meta(binary)` → struct(format, width, height,
  * duration_ms) | null — codegen'd video header probe
  * ([[VideoCodecs.meta]]): one static call per row inside whole-stage
  * codegen, no decode; corrupt headers are data (NULL), never a
  * throw. */
case class VideoMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = VideoMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_meta"

  override def nullSafeEval(v: Any): Any =
    VideoCodecs.meta(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
      |  graft.multimodal.VideoCodecs.meta($b);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VideoMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  private[graft] def builder(exprs: Seq[Expression]): Expression =
    VideoMeta(exprs.head)
}
