package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header parsers for the multimodal tier — the piece of
  * "decode" that needs NO codec, only byte arithmetic, and that a
  * 100 TB image corpus scan actually runs hot: extracting format and
  * pixel dimensions from the container bytes so downstream routing
  * (resolution buckets, aspect filters, corrupt-blob quarantine)
  * never touches a pixel decoder. PNG (IHDR), JPEG (SOF marker walk),
  * GIF (logical screen descriptor), WEBP (RIFF: VP8/VP8L/VP8X) and
  * AVIF/HEIC (ISO-BMFF ispe property walk)
  * per their public format specs; anything else — including
  * truncated or corrupt headers — yields NULL, never a throw (a
  * quarantine filter must be able to SELECT the bad blobs). */
object MultimodalCodecs {

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def le32(b: Array[Byte], i: Int): Int =
    le16(b, i) | (le16(b, i + 2) << 16)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w, h))

  /** (format, width, height) of a recognized container header, else
    * null. Pure byte inspection; total, never throws. */
  def dims(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // PNG: 8-byte signature, then the IHDR chunk (len+type at 8..15,
    // width/height big-endian at 16/20)
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      return if (w > 0 && h > 0) row("png", w, h) else null
    }
    // GIF: "GIF87a"/"GIF89a", then little-endian logical screen size
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6); val h = le16(b, 8)
      return if (w > 0 && h > 0) row("gif", w, h) else null
    }
    // WEBP: RIFF container ("RIFF" + size + "WEBP"), first chunk at
    // 12 — "VP8 " lossy (14-bit dims after the 0x9d012a sync code),
    // "VP8L" lossless (0x2f signature, then 14-bit-packed dims−1),
    // "VP8X" extended (24-bit LE canvas dims−1). The dominant
    // web-scraped-corpus format; was quarantined as corrupt before.
    if (b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P') {
      if (b.length >= 30 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
          b(15) == ' ') {
        // 3-byte frame tag at 20, sync code 9D 01 2A at 23
        if ((b(23) & 0xff) != 0x9d || (b(24) & 0xff) != 0x01 ||
            (b(25) & 0xff) != 0x2a) return null
        val w = le16(b, 26) & 0x3fff; val h = le16(b, 28) & 0x3fff
        return if (w > 0 && h > 0) row("webp", w, h) else null
      }
      if (b.length >= 25 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
          b(15) == 'L') {
        if ((b(20) & 0xff) != 0x2f) return null // lossless signature
        val v = le32(b, 21)
        val w = (v & 0x3fff) + 1; val h = ((v >> 14) & 0x3fff) + 1
        return row("webp", w, h)
      }
      if (b.length >= 30 && b(12) == 'V' && b(13) == 'P' && b(14) == '8' &&
          b(15) == 'X') {
        val w = le24(b, 24) + 1; val h = le24(b, 27) + 1
        return row("webp", w, h)
      }
      return null // unknown/truncated first chunk
    }
    // AVIF/HEIC: ISO-BMFF — "ftyp" with an AV1/HEVC image brand, then
    // a bounded box walk meta(FullBox) → iprp → ipco → ispe(FullBox:
    // width, height BE32). The same container family the video walk
    // parses for MP4; for still images the DIMENSIONS PROPERTY, not a
    // movie header, carries the answer. Multiple ispe boxes (thumb +
    // primary) resolve to the LARGEST — the primary item. Strictly
    // advancing; malformed sizes stop the walk (NULL, never a throw).
    if (b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') {
      val brand = new String(b, 8, 4, "US-ASCII")
      val fmt = brand match {
        case "avif" | "avis" => "avif"
        case "heic" | "heix" | "mif1" | "msf1" => "heic"
        case _ => return null // some other BMFF (an MP4 is not an image)
      }
      var bw = 0; var bh = 0
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 8) return
        var i = start
        while (i + 8 <= end) {
          val sz = be32(b, i)
          if (sz < 8 || sz > end - i) return // 64-bit/malformed: stop
          val t = new String(b, i + 4, 4, "US-ASCII")
          if (t == "ispe" && sz >= 20) {
            val w = be32(b, i + 12); val h = be32(b, i + 16)
            if (w > 0 && h > 0 && w.toLong * h > bw.toLong * bh) {
              bw = w; bh = h
            }
          } else if (t == "meta") walk(i + 12, i + sz, depth + 1)
          else if (t == "iprp" || t == "ipco")
            walk(i + 8, i + sz, depth + 1)
          i += sz
        }
      }
      walk(0, b.length, 0)
      return if (bw > 0) row(fmt, bw, bh) else null
    }
    // BMP: "BM", then the DIB header at 14 — BITMAPINFOHEADER-family
    // (size >= 40: LE32 width at 18, LE32 height at 22, negative
    // height = top-down) or the legacy BITMAPCOREHEADER (size 12:
    // LE16 dims). The bitmap scraped corpora still carry (favicons,
    // screenshots); was quarantined as corrupt before.
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dib = le32(b, 14)
      if (dib >= 40) {
        // >= 2^31 widths parse as negative Ints and fail w > 0
        val w = le32(b, 18); val h = le32(b, 22)
        val ah = math.abs(h)
        return if (w > 0 && ah > 0) row("bmp", w, ah) else null
      }
      if (dib == 12 && b.length >= 22) {
        val w = le16(b, 18); val h = le16(b, 20)
        return if (w > 0 && h > 0) row("bmp", w, h) else null
      }
      return null
    }
    // TIFF: "II*\0" (little-endian) or "MM\0*" (big-endian), then the
    // FIRST IFD's ImageWidth(256)/ImageLength(257) entries — SHORT or
    // LONG, inline in the 4-byte value field (endian-aware; a SHORT
    // occupies the field's first two bytes). Bounded walk over the
    // declared entry count; malformed offsets → NULL, never a throw.
    if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42))) {
      val le = b(0) == 'I'
      def u16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
      def u32(i: Int): Int = if (le) le32(b, i) else be32(b, i)
      val ifd = u32(4)
      // LONG arithmetic: a hostile IFD offset near Int.MaxValue would
      // wrap `ifd + 2` negative and dodge the bounds check, then
      // throw on the index — the probe must yield NULL, never throw
      // (review-caught)
      if (ifd < 8 || ifd.toLong + 2 > b.length) return null
      val n = u16(ifd)
      if (n <= 0 || n > 4096) return null
      var (w, h) = (0, 0)
      var e = 0
      while (e < n && ifd.toLong + 2 + (e + 1) * 12 <= b.length) {
        val p = ifd + 2 + e * 12
        val tag = u16(p); val typ = u16(p + 2)
        val value = typ match {
          case 3 => u16(p + 8) // SHORT rides the field's first bytes
          case 4 => u32(p + 8)
          case _ => -1
        }
        if (tag == 256) w = value else if (tag == 257) h = value
        e += 1
      }
      return if (w > 0 && h > 0) row("tiff", w, h) else null
    }
    // JPEG: SOI then a marker walk to the first frame header (SOFn,
    // excluding DHT/JPG/DAC which reuse the C-range), whose payload
    // is precision(1) height(2) width(2)
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // marker stream broken
        var m = b(i + 1) & 0xff
        while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff }
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i += 2 // standalone marker, no payload
        } else if (m == 0xd9) {
          return null // EOI before any frame header
        } else {
          if (i + 3 >= b.length) return null
          val len = be16(b, i + 2)
          if (len < 2) return null
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc) {
            if (i + 8 >= b.length) return null
            val h = be16(b, i + 5); val w = be16(b, i + 7)
            return if (w > 0 && h > 0) row("jpeg", w, h) else null
          }
          i += 2 + len
        }
      }
      null
    } else null
  }
}

/** `graft_image_dims(binary)` → struct(format, width, height) | null —
  * codegen'd header probe (see [[MultimodalCodecs.dims]]). Stays
  * inside whole-stage codegen: one static call per row, no decode. */
case class ImageDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageDims.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dims"

  override def nullSafeEval(v: Any): Any =
    MultimodalCodecs.dims(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
      |  graft.multimodal.MultimodalCodecs.dims($b);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object ImageDims {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private[graft] def builder(exprs: Seq[Expression]): Expression =
    ImageDims(exprs.head)
}
