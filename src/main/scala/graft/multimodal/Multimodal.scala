package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride through the engine
  * as opaque `BinaryType` columns with a typed metadata struct, exactly
  * as an image/audio/video corpus does at 100 TB — the engine never
  * interprets the bytes except at explicit decode/feature steps.
  *
  * The container ships no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB ([[decodeStub]]): it computes a fake feature
  * vector (a 16-bin byte histogram) in place of a real
  * decode+embed. Everything around it — the binary schema, the
  * partition-preserving `mapPartitions` batch shape (the Scala analog
  * of PySpark's `mapInPandas`: one iterator of rows per partition in,
  * one out, no shuffle), the frame-sampling plan — is real and tested.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata struct to the documents
    * table (text bytes stand in for media bytes; schema and plan are
    * what a real media table looks like). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(
        lit("utf8-text").as("format"),
        length(col("text")).cast(LongType).as("n_units"),
        col("lang").as("source_lang")).as("media_meta"))

  /** Per-payload metadata projection: byte length + content digest —
    * the "stat the blob without decoding it" scan. Narrow, codegen'd,
    * pushdown-friendly (only payload/doc_id are read). */
  def binaryMeta(docs: DataFrame): DataFrame =
    withBinaryPayload(docs).select(
      col("doc_id"),
      octet_length(col("payload")).cast(LongType).as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("media_meta.format").as("format"),
      col("media_meta.source_lang").as("source_lang"))

  /** Frame sampling: cut each payload into fixed-width frames on a
    * stride (overlapping when stride < width — the video-keyframe /
    * audio-window pattern), via `sequence` + `posexplode`. The explode
    * is partition-local: no shuffle, output rows stay with their input
    * partition, so a 1000-executor scan fans out frames in place. */
  def sampleFrames(docs: DataFrame, width: Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        length(col("text")).as("n"))
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0),
          ceil(col("n").cast(DoubleType) / stride).cast(IntegerType) - 1)))
      .withColumn("frame_txt", substring_index_frame(width, stride))
      .filter(length(col("frame_txt")) > 0)
      .select(col("doc_id"), col("pos").cast(LongType).as("frame_no"),
        md5(col("frame_txt")).as("frame_md5"),
        length(col("frame_txt")).cast(LongType).as("frame_len"))

  private def substring_index_frame(width: Int, stride: Int) =
    substring(col("text"), lit(1) + col("pos") * stride, lit(width))

  private val featureBins = 16

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** STUB decode + feature-extract over the binary payload, with the
    * real distributed shape: `mapPartitions` over (doc_id, payload)
    * rows — the JVM analog of a `mapInPandas` batch UDF. A real
    * pipeline would decode media and run a feature model per batch
    * here; the container has no codecs, so the "features" are a
    * deterministic 16-bin byte histogram (L1-normalized). Partition
    * count and row locality are preserved — no shuffle. */
  def decodeStub(withPayload: DataFrame): DataFrame = {
    val input = withPayload.select(col("doc_id").cast(LongType),
      col("payload").cast(BinaryType))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](featureBins)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) * featureBins / 256) += 1.0
          i += 1
        }
        val n = math.max(bytes.length, 1).toDouble
        Row(id, bytes.length.toLong, hist.map(_ / n).toSeq)
      }
    }(RowEncoder.encoderFor(decodedSchema))
  }

  // ---- genuine container headers (no codecs needed) ----------------

  private def be32(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 8, "0"))
  private def be16(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 4, "0"))
  private def le16(c: org.apache.spark.sql.Column) = {
    val h = lpad(hex(c), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def le32(c: org.apache.spark.sql.Column) = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def bin(hexStr: String) = lit(
    hexStr.replaceAll(" ", "").sliding(2, 2).toArray
      .map(Integer.parseInt(_, 16).toByte))

  /** A VALID container header for the given dimensions, format
    * rotated per doc — real PNG signature+IHDR, a real JPEG
    * SOI/APP0/SOF0 marker stream, a real GIF logical screen
    * descriptor, a real WEBP RIFF/VP8L bitstream head — built from
    * in-plan byte arithmetic (the payload a
    * real media table carries, minus the pixel data the engine never
    * reads anyway). The builder and [[MultimodalCodecs.dims]] are
    * independent code paths over the published byte layouts, so a
    * parse of a built payload is a genuine round trip. */
  def containerPayload(fmtSel: org.apache.spark.sql.Column,
                       w: org.apache.spark.sql.Column,
                       h: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(fmtSel === 0,
      concat(bin("89504E470D0A1A0A 0000000D 49484452"), // sig + IHDR
        be32(w), be32(h),
        bin("0806000000 00000000"))) // bit depth/color/CRC stand-in
      .when(fmtSel === 1,
        concat(bin("FFD8 FFE00010 4A46494600 0101 00 0001 0001 0000"),
          bin("FFC00011 08"), be16(h), be16(w),
          bin("03 012200 021101 031101 FFD9")))
      .when(fmtSel === 2,
        concat(lit("GIF89a".getBytes("US-ASCII")), le16(w), le16(h),
          bin("F70000 3B")))
      .otherwise(
        // WEBP VP8L (lossless): RIFF("WEBP") + VP8L chunk — the 0x2f
        // signature then the 14-bit-packed (w−1, h−1) LE dims word.
        // RIFF size = "WEBP"(4) + chunk header(8) + data(5) = 17.
        concat(lit("RIFF".getBytes("US-ASCII")), le32(lit(17)),
          lit("WEBPVP8L".getBytes("US-ASCII")), le32(lit(5)),
          bin("2F"), le32((w - 1) + (h - 1) * 16384)))

  private def be64(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 16, "0"))
  private def be24col(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 6, "0"))
  private def zeros(n: org.apache.spark.sql.Column) =
    unhex(call_function("repeat", lit("00"), n.cast("int")))
  private def byte1(c: org.apache.spark.sql.Column) =
    unhex(lpad(hex(c), 2, "0"))

  /** A VALID audio container header for the given parameters, format
    * selected per row — a real WAV RIFF/fmt/data chunk layout, a real
    * FLAC STREAMINFO block (bit-packed rate/channels/bps/samples), a
    * real ID3v2-tagged MPEG-1 Layer III frame head with CBR padding —
    * built from in-plan byte arithmetic. The builder and
    * [[AudioCodecs.meta]] are independent code paths over the
    * published byte layouts, so a parse of a built payload is a
    * genuine round trip.
    *
    *   fmtSel: 0 = WAV (16-bit PCM, `units` frames)
    *           1 = FLAC (16 bps, `units` total samples)
    *           2 = MP3 (`kbpsIdx` ∈ 1..14 bitrate index, `mp3Rate` ∈
    *               {44100,48000,32000}, `padBytes` of CBR stream body)
    *           3 = VBR MP3: a real Xing (vbrKind 0 — after the
    *               channel-dependent side info) or Fraunhofer VBRI
    *               (vbrKind 1 — fixed 32-byte offset) header carrying
    *               `vbrFrames` as the authoritative frame count
    */
  def audioPayload(fmtSel: org.apache.spark.sql.Column,
                   rate: org.apache.spark.sql.Column,
                   ch: org.apache.spark.sql.Column,
                   units: org.apache.spark.sql.Column,
                   mp3Rate: org.apache.spark.sql.Column,
                   kbpsIdx: org.apache.spark.sql.Column,
                   padBytes: org.apache.spark.sql.Column,
                   vbrFrames: org.apache.spark.sql.Column = lit(0),
                   vbrKind: org.apache.spark.sql.Column = lit(0))
      : org.apache.spark.sql.Column = {
    val block = ch * 2 // 16-bit PCM frame bytes
    val byteRate = rate * block
    val dataSize = units * block
    val wav = concat(lit("RIFF".getBytes("US-ASCII")),
      le32(dataSize + 36), lit("WAVEfmt ".getBytes("US-ASCII")),
      le32(lit(16)), le16(lit(1)), le16(ch), le32(rate), le32(byteRate),
      le16(block), le16(lit(16)),
      lit("data".getBytes("US-ASCII")), le32(dataSize))
    // STREAMINFO packed group: rate(20) | ch-1(3) | bps-1=15(5) | samples(36)
    val packed = rate.cast("long") * lit(17592186044416L) + // << 44
      (ch.cast("long") - 1) * lit(2199023255552L) + // << 41
      lit(15L) * lit(68719476736L) + // << 36
      units.cast("long")
    val flac = concat(lit("fLaC".getBytes("US-ASCII")),
      bin("80"), be24col(lit(34)), zeros(lit(10)), be64(packed),
      zeros(lit(16)))
    // MP3: ID3v2.3 tag with a 16-byte body (exercises the syncsafe
    // skip), then FF FB (MPEG-1 Layer III), bitrate/sample-rate
    // nibbles, channel-mode byte, CBR body
    val srIdx = when(mp3Rate === 44100, 0).when(mp3Rate === 48000, 1)
      .otherwise(2)
    val mp3 = concat(lit("ID3".getBytes("US-ASCII")),
      bin("0300 00 00000010"), zeros(lit(16)),
      bin("FFFB"), byte1(shiftleft(kbpsIdx, 4) + shiftleft(srIdx, 2)),
      byte1(when(ch === 1, 0xc0).otherwise(0x00)), zeros(padBytes))
    // VBR: the same ID3+frame head, then side-info padding and the
    // Xing ("Xing" + flags(FRAMES) + frame count — the side-info
    // offset is 17 bytes mono / 32 otherwise, per the public layout)
    // or VBRI ("VBRI" at +32 always: version, delay, quality, bytes,
    // then the frame count) variable-bitrate header
    val vbrHead = concat(lit("ID3".getBytes("US-ASCII")),
      bin("0300 00 00000010"), zeros(lit(16)),
      bin("FFFB"), byte1(shiftleft(kbpsIdx, 4) + shiftleft(srIdx, 2)),
      byte1(when(ch === 1, 0xc0).otherwise(0x00)))
    val xing = concat(vbrHead, zeros(when(ch === 1, 17).otherwise(32)),
      lit("Xing".getBytes("US-ASCII")), be32(lit(1)), be32(vbrFrames),
      zeros(lit(16)))
    val vbri = concat(vbrHead, zeros(lit(32)),
      lit("VBRI".getBytes("US-ASCII")), be16(lit(1)), be16(lit(0)),
      be16(lit(0)), be32(lit(0)), be32(vbrFrames), zeros(lit(16)))
    when(fmtSel === 0, wav).when(fmtSel === 1, flac)
      .when(fmtSel === 2, mp3)
      .otherwise(when(vbrKind === 0, xing).otherwise(vbri))
  }

  private def le64(c: org.apache.spark.sql.Column) = {
    val h = lpad(hex(c), 16, "0")
    unhex(concat((0 until 8).reverse.map(k =>
      substring(h, k * 2 + 1, 2)): _*))
  }

  /** Round-13 audio formats — same independent-builder contract as
    * [[audioPayload]]:
    *
    *   fmtSel: 0 = Ogg/Opus: a BOS page carrying a real OpusHead
    *           (ch, `preSkip`, `rate` as the informational input
    *           rate) and an EOS page whose granule position is
    *           preSkip + `units` 48 kHz samples
    *           1 = M4A/AAC: real ftyp(M4A ) + moov/trak/mdia( mdhd
    *           v0 with timescale=`rate`, duration=`units`,
    *           minf/stbl/stsd/mp4a with `ch` + 16.16 `rate`)
    *           2 = raw ADTS AAC: `frames` frames of 23 bytes each,
    *           AAC-LC, `rate` ∈ {48000,44100,32000,16000,8000}
    *           3 = Ogg/Vorbis: identification header (ch, `rate`) and
    *           an EOS page whose granule is `units` samples at the
    *           STREAM's rate */
  def audioPayload2(fmtSel: org.apache.spark.sql.Column,
                    rate: org.apache.spark.sql.Column,
                    ch: org.apache.spark.sql.Column,
                    units: org.apache.spark.sql.Column,
                    preSkip: org.apache.spark.sql.Column,
                    frames: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val page1 = concat(lit("OggS".getBytes("US-ASCII")),
      bin("00 02"), le64(lit(0L)), le32(lit(7)), le32(lit(0)),
      le32(lit(0)), bin("01 13"),
      lit("OpusHead".getBytes("US-ASCII")), bin("01"), byte1(ch),
      le16(preSkip), le32(rate), le16(lit(0)), bin("00"))
    val page2 = concat(lit("OggS".getBytes("US-ASCII")),
      bin("00 04"), le64(preSkip.cast("long") + units.cast("long")),
      le32(lit(7)), le32(lit(1)), le32(lit(0)), bin("01 01 00"))
    val opus = concat(page1, page2)
    // M4A box tree, all sizes static: mdhd 32, mp4a 36, stsd 52,
    // stbl 60, minf 68, mdia 108, trak 116, moov 124, ftyp 16
    val mdhd = concat(be32(lit(32)), lit("mdhd".getBytes("US-ASCII")),
      zeros(lit(12)), be32(rate), be32(units), zeros(lit(4)))
    val mp4a = concat(be32(lit(36)), lit("mp4a".getBytes("US-ASCII")),
      zeros(lit(8)), zeros(lit(8)), be16(ch), be16(lit(16)),
      zeros(lit(4)), be32(rate.cast("long") * 65536L))
    val stsd = concat(be32(lit(52)), lit("stsd".getBytes("US-ASCII")),
      zeros(lit(4)), be32(lit(1)), mp4a)
    val stbl = concat(be32(lit(60)), lit("stbl".getBytes("US-ASCII")), stsd)
    val minf = concat(be32(lit(68)), lit("minf".getBytes("US-ASCII")), stbl)
    val mdia = concat(be32(lit(108)), lit("mdia".getBytes("US-ASCII")),
      mdhd, minf)
    val trak = concat(be32(lit(116)), lit("trak".getBytes("US-ASCII")), mdia)
    val m4a = concat(be32(lit(16)), lit("ftypM4A ".getBytes("US-ASCII")),
      zeros(lit(4)),
      be32(lit(124)), lit("moov".getBytes("US-ASCII")), trak)
    // ADTS: one 23-byte AAC-LC frame's hex, repeated `frames` times.
    // header: FF F1, profile 01 | sfi<<2 | ch>>2, (ch&3)<<6 | len
    // bits, len middle byte, (len&7)<<5 | 0x1F, FC; body zeros
    val sfi = when(rate === 48000, 3).when(rate === 44100, 4)
      .when(rate === 32000, 5).when(rate === 16000, 8).otherwise(11)
    val flen = 23
    val frameHex = concat(lit("FFF1"),
      lpad(hex(lit(0x40) + shiftleft(sfi, 2) + shiftright(ch, 2)), 2, "0"),
      lpad(hex(shiftleft(ch.cast("int") % 4, 6) + lit(flen >> 11)), 2, "0"),
      lpad(hex(lit((flen >> 3) & 0xff)), 2, "0"),
      lpad(hex(lit(((flen & 7) << 5) | 0x1f)), 2, "0"),
      lit("FC"), call_function("repeat", lit("00"), lit(flen - 7)))
    val adts = unhex(call_function("repeat", frameHex, frames))
    // Vorbis identification header: \x01"vorbis" + version(4) +
    // ch(1) + rate LE32 + bitrate triple (12 zeros) + blocksizes +
    // framing = 30 bytes
    val vorbId = concat(bin("01"), lit("vorbis".getBytes("US-ASCII")),
      le32(lit(0)), byte1(ch), le32(rate), zeros(lit(12)), bin("00 01"))
    val vorbis = concat(lit("OggS".getBytes("US-ASCII")),
      bin("00 02"), le64(lit(0L)), le32(lit(9)), le32(lit(0)),
      le32(lit(0)), bin("01 1E"), vorbId,
      lit("OggS".getBytes("US-ASCII")),
      bin("00 04"), le64(units.cast("long")), le32(lit(9)),
      le32(lit(1)), le32(lit(0)), bin("01 01 00"))
    when(fmtSel === 0, opus).when(fmtSel === 1, m4a)
      .when(fmtSel === 2, adts).otherwise(vorbis)
  }

  /** Round-13 still-image ISO-BMFF formats (AVIF/HEIC): real
    * ftyp(brand) + meta(FullBox)/iprp/ipco/ispe(w, h) trees. */
  def containerPayload2(fmtSel: org.apache.spark.sql.Column,
                        w: org.apache.spark.sql.Column,
                        h: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val brand = when(fmtSel === 0, lit("avif")).otherwise(lit("heic"))
    // ispe 20, ipco 28, iprp 36, meta 48, ftyp 16
    concat(be32(lit(16)), lit("ftyp".getBytes("US-ASCII")),
      encode(brand, "US-ASCII"), zeros(lit(4)),
      be32(lit(48)), lit("meta".getBytes("US-ASCII")), zeros(lit(4)),
      be32(lit(36)), lit("iprp".getBytes("US-ASCII")),
      be32(lit(28)), lit("ipco".getBytes("US-ASCII")),
      be32(lit(20)), lit("ispe".getBytes("US-ASCII")), zeros(lit(4)),
      be32(w), be32(h))
  }

  /** Round-14 legacy raster formats — same independent-builder
    * contract:
    *
    *   fmtSel: 0 = BMP: "BM" file header + a real 40-byte
    *           BITMAPINFOHEADER (LE dims, 24 bpp; `flipped` makes the
    *           height NEGATIVE — the top-down encoding readers must
    *           abs())
    *           1 = TIFF little-endian ("II*\0"): IFD with
    *           ImageWidth(256) as SHORT and ImageLength(257) as LONG
    *           — both inline-value layouts exercised
    *           2 = TIFF big-endian ("MM\0*"), same entries */
  def containerPayload3(fmtSel: org.apache.spark.sql.Column,
                        w: org.apache.spark.sql.Column,
                        h: org.apache.spark.sql.Column,
                        flipped: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val bmp = concat(lit("BM".getBytes("US-ASCII")),
      le32(lit(54)), zeros(lit(4)), le32(lit(54)),
      le32(lit(40)), le32(w),
      // two's-complement negative height via 2^32 − h
      when(flipped === 1, le32(lit(4294967296L) - h.cast("long")))
        .otherwise(le32(h)),
      le16(lit(1)), le16(lit(24)), zeros(lit(24)))
    // IFD at 8: count 2; entry = tag(2) type(2) count(4) value(4);
    // SHORT rides the value field's FIRST two bytes (endian-aware)
    val tiffLe = concat(lit("II".getBytes("US-ASCII")), bin("2A00"),
      le32(lit(8)), le16(lit(2)),
      le16(lit(256)), le16(lit(3)), le32(lit(1)), le16(w), zeros(lit(2)),
      le16(lit(257)), le16(lit(4)), le32(lit(1)), le32(h),
      le32(lit(0)))
    val tiffBe = concat(lit("MM".getBytes("US-ASCII")), bin("002A"),
      be32(lit(8).cast("long")), be16(lit(2)),
      be16(lit(256)), be16(lit(3)), be32(lit(1).cast("long")),
      be16(w), zeros(lit(2)),
      be16(lit(257)), be16(lit(4)), be32(lit(1).cast("long")),
      be32(h.cast("long")),
      be32(lit(0).cast("long")))
    when(fmtSel === 0, bmp).when(fmtSel === 1, tiffLe)
      .otherwise(tiffBe)
  }

  /** A FRAGMENTED MP4 header (DASH/CMAF shape): mvhd carries
    * duration 0 and the real figure rides moov → mvex → mehd
    * (v1 64-bit when `mehdV1` = 1, else v0 32-bit), in `timescale`
    * units. */
  def fragMp4Payload(w: org.apache.spark.sql.Column,
                     h: org.apache.spark.sql.Column,
                     timescale: org.apache.spark.sql.Column,
                     fragUnits: org.apache.spark.sql.Column,
                     mehdV1: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def be32c(c: org.apache.spark.sql.Column) =
      unhex(lpad(hex(c), 8, "0"))
    def be64c(c: org.apache.spark.sql.Column) =
      unhex(lpad(hex(c.cast("long")), 16, "0"))
    val ftyp = concat(be32c(lit(16)), lit("ftypisom".getBytes("US-ASCII")),
      zeros(lit(4)))
    val mvhd = concat(be32c(lit(108)), lit("mvhd".getBytes("US-ASCII")),
      zeros(lit(12)), be32c(timescale), be32c(lit(0)), zeros(lit(80)))
    val tkhd = concat(be32c(lit(92)), lit("tkhd".getBytes("US-ASCII")),
      zeros(lit(76)), be32c(w.cast("long") * 65536L),
      be32c(h.cast("long") * 65536L))
    val trak = concat(be32c(lit(100)), lit("trak".getBytes("US-ASCII")),
      tkhd)
    val mehd = when(mehdV1 === 1,
      concat(be32c(lit(20)), lit("mehd".getBytes("US-ASCII")),
        bin("01000000"), be64c(fragUnits)))
      .otherwise(
        concat(be32c(lit(16)), lit("mehd".getBytes("US-ASCII")),
          zeros(lit(4)), be32c(fragUnits)))
    val mvexSz = when(mehdV1 === 1, lit(28)).otherwise(lit(24))
    val mvex = concat(be32c(mvexSz), lit("mvex".getBytes("US-ASCII")),
      mehd)
    val moovSz = mvexSz + 216
    concat(ftyp, be32c(moovSz), lit("moov".getBytes("US-ASCII")),
      mvhd, trak, mvex)
  }

  /** A VALID video container header for the given parameters — a real
    * MP4 ftyp + moov(mvhd v0, trak(tkhd v0 with 16.16-fixed dims))
    * box tree, or a real AVI RIFF('AVI ')/LIST('hdrl')/avih main
    * header — built from in-plan byte arithmetic. Independent of
    * [[VideoCodecs.meta]]'s parse path, so a parse of a built payload
    * is a genuine round trip.
    *
    *   fmtSel: 0 = MP4 (`timescale` units/s, `durUnits` total)
    *           1 = AVI (`uspf` µs/frame, `frames` total)
    *           2 = WebM/Matroska (EBML: DocType `webm` when mkvDoc 0
    *               else `matroska`; Duration = `ebmlTicks` as an
    *               IEEE-754 double, TimestampScale = `ebmlScaleMul`
    *               × 1e6 ns — so duration_ms = ticks × mul)
    */
  def videoPayload(fmtSel: org.apache.spark.sql.Column,
                   w: org.apache.spark.sql.Column,
                   h: org.apache.spark.sql.Column,
                   timescale: org.apache.spark.sql.Column,
                   durUnits: org.apache.spark.sql.Column,
                   uspf: org.apache.spark.sql.Column,
                   frames: org.apache.spark.sql.Column,
                   mkvDoc: org.apache.spark.sql.Column = lit(0),
                   ebmlTicks: org.apache.spark.sql.Column = lit(1),
                   ebmlScaleMul: org.apache.spark.sql.Column = lit(1))
      : org.apache.spark.sql.Column = {
    def be32c(c: org.apache.spark.sql.Column) =
      unhex(lpad(hex(c), 8, "0"))
    val ftyp = concat(be32c(lit(16)), lit("ftypisom".getBytes("US-ASCII")),
      zeros(lit(4)))
    // mvhd v0: ver/flags + creation/modification + timescale +
    // duration + (rate/volume/reserved/matrix/predefined/next-id = 80)
    val mvhd = concat(be32c(lit(108)), lit("mvhd".getBytes("US-ASCII")),
      zeros(lit(12)), be32c(timescale), be32c(durUnits), zeros(lit(80)))
    // tkhd v0: ver/flags + 20 (times/id/duration) + 8 + 8 + matrix(36),
    // then width/height as 16.16 fixed
    val tkhd = concat(be32c(lit(92)), lit("tkhd".getBytes("US-ASCII")),
      zeros(lit(76)), be32c(w.cast("long") * 65536L),
      be32c(h.cast("long") * 65536L))
    val trak = concat(be32c(lit(100)), lit("trak".getBytes("US-ASCII")),
      tkhd)
    val mp4 = concat(ftyp, be32c(lit(216)),
      lit("moov".getBytes("US-ASCII")), mvhd, trak)
    // avih: uspf, (maxbytes/padding/flags = 12), totalframes,
    // (initial/streams/sugbuf = 12), width, height, reserved(16)
    val avih = concat(lit("avih".getBytes("US-ASCII")), le32(lit(56)),
      le32(uspf), zeros(lit(12)), le32(frames), zeros(lit(12)),
      le32(w), le32(h), zeros(lit(16)))
    val avi = concat(lit("RIFF".getBytes("US-ASCII")), le32(lit(80)),
      lit("AVI LIST".getBytes("US-ASCII")), le32(lit(68)),
      lit("hdrl".getBytes("US-ASCII")), avih)
    // EBML: header(DocType) + Segment(Info(TimestampScale, Duration),
    // Tracks(TrackEntry(Video(PixelWidth, PixelHeight)))) — 1-byte
    // sizes throughout (every payload here is < 127 bytes). The
    // Duration element is a float by spec: its 8 bytes are the
    // IEEE-754 double of the integer tick count, built from in-plan
    // arithmetic ([[dblBits]]).
    val ebmlHdr = when(mkvDoc === 0,
      concat(bin("1A45DFA3 87 4282 84"), lit("webm".getBytes("US-ASCII"))))
      .otherwise(
        concat(bin("1A45DFA3 8B 4282 88"),
          lit("matroska".getBytes("US-ASCII"))))
    val info = concat(bin("1549A966 93"),
      bin("2AD7B1 84"), be32(ebmlScaleMul.cast("long") * 1000000L),
      bin("4489 88"), be64(dblBits(ebmlTicks)))
    val tracks = concat(bin("1654AE6B 8C AE 8A E0 88"),
      bin("B0 82"), be16(w), bin("BA 82"), be16(h))
    val webm = concat(ebmlHdr, bin("18538067 A9"), info, tracks)
    when(fmtSel === 0, mp4).when(fmtSel === 1, avi).otherwise(webm)
  }

  /** IEEE-754 double bit pattern of a POSITIVE INTEGER column, as a
    * bigint — pure column arithmetic (no float-bits builtin exists):
    * exponent from the binary digit count, mantissa by shifting the
    * value's leading bit onto bit 52 and dropping it. Exact for
    * 1 ≤ n < 2^52. */
  private def dblBits(n: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val e = (length(conv(n.cast("long"), 10, 2)) - 1).cast("long")
    val mant = call_function("shiftleft", n.cast("long"),
      (lit(52L) - e).cast("int")) - lit(4503599627370496L)
    (e + 1023L) * lit(4503599627370496L) + mant
  }
}
