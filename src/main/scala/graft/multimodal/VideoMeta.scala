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
  * the 16.16-fixed track dimensions) and AVI (RIFF `hdrl`/`avih`
  * frame timing and dimensions) per their public specs; anything
  * unrecognized, truncated or corrupt yields NULL, never a throw. */
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
      return row("mp4", w, h, dur * 1000L / ts)
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
              j += 8 + le32(b, j + 4).toInt
              j += (j & 1) // RIFF chunks pad to even
            }
            return null
          }
        }
        if (chunkSz > Int.MaxValue - 16) return null
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
