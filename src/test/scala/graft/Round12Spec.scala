package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-12 specs: the probe family's new containers (WebM/MKV EBML
  * walk, Xing/VBRI VBR durations) and the walk-guard hardening the
  * round-11 advice flagged (hostile chunk sizes must neither loop nor
  * throw). */
class Round12Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ---- byte-building helpers ----------------------------------------

  private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def be32(v: Long) = Array[Byte](
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def le32(v: Long) = Array[Byte](
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def ascii(s: String) = s.getBytes("US-ASCII")
  private def hexb(s: String) = s.replaceAll(" ", "")
    .sliding(2, 2).toArray.map(Integer.parseInt(_, 16).toByte)

  /** Hand-built EBML header, independent of BOTH the in-plan builder
    * and the parser. */
  private def webmBytes(doc: String, w: Int, h: Int, ticks: Long,
                        scaleNs: Long): Array[Byte] = {
    val docType = hexb("4282") ++
      Array((0x80 | doc.length).toByte) ++ ascii(doc)
    val hdr = hexb("1A45DFA3") ++
      Array((0x80 | docType.length).toByte) ++ docType
    val info = hexb("1549A966 93") ++
      hexb("2AD7B1 84") ++ be32(scaleNs) ++
      hexb("4489 88") ++
      be64(java.lang.Double.doubleToLongBits(ticks.toDouble))
    val tracks = hexb("1654AE6B 8C AE 8A E0 88") ++
      hexb("B0 82") ++ be16(w) ++ hexb("BA 82") ++ be16(h)
    hdr ++ hexb("18538067") ++
      Array((0x80 | (info.length + tracks.length)).toByte) ++
      info ++ tracks
  }

  private def videoMeta(b: Array[Byte]) =
    Option(graft.multimodal.VideoCodecs.meta(b))
      .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getLong(3)))
  private def audioMeta(b: Array[Byte]) =
    Option(graft.multimodal.AudioCodecs.meta(b))
      .map(r => (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2),
        r.getLong(3)))

  test("EBML walk: webm and matroska headers parse dims, DocType and scaled float duration") {
    // TimestampScale 3e6 ns/tick, 437 ticks -> 1311 ms
    assert(videoMeta(webmBytes("webm", 320, 240, 437, 3000000L))
      .contains(("webm", 320, 240, 1311L)))
    assert(videoMeta(webmBytes("matroska", 1920, 1080, 10, 1000000L))
      .contains(("mkv", 1920, 1080, 10L)))
    // default TimestampScale (no element) = 1e6: strip Info down to
    // Duration only
    val noScale = {
      val docType = hexb("4282 84") ++ ascii("webm")
      val hdr = hexb("1A45DFA3") ++
        Array((0x80 | docType.length).toByte) ++ docType
      val info = hexb("1549A966 8B 4489 88") ++
        be64(java.lang.Double.doubleToLongBits(7.0))
      hdr ++ hexb("18538067") ++
        Array((0x80 | info.length).toByte) ++ info
    }
    // no Tracks element: dims 0, duration still parses
    assert(videoMeta(noScale).contains(("webm", 0, 0, 7L)))
    // truncations never throw, and a cut inside Segment yields null
    val full = webmBytes("webm", 320, 240, 437, 3000000L)
    (0 to full.length).foreach(n => videoMeta(full.take(n)))
    assert(videoMeta(full.take(20)).isEmpty)
  }

  test("MP3 VBR: Xing (mono and stereo), Info and VBRI frame counts beat the CBR estimate") {
    // ID3v2.3 tag with 16-byte body, then FF FB (MPEG-1 L3),
    // bitrate idx 9 (128kbps), rate idx 1 (48000)
    def head(mono: Boolean) =
      ascii("ID3") ++ hexb("0300 00 00000010") ++
        new Array[Byte](16) ++
        hexb("FFFB") ++ Array[Byte](((9 << 4) | (1 << 2)).toByte,
        if (mono) 0xc0.toByte else 0x00.toByte)
    def xing(mono: Boolean, tag: String, frames: Long) =
      head(mono) ++ new Array[Byte](if (mono) 17 else 32) ++
        ascii(tag) ++ be32(1) ++ be32(frames) ++ new Array[Byte](16)
    def vbri(frames: Long) =
      head(mono = false) ++ new Array[Byte](32) ++
        ascii("VBRI") ++ be16(1) ++ be16(0) ++ be16(0) ++ be32(0) ++
        be32(frames) ++ new Array[Byte](16)
    // 1000 frames x 1152 samples at 48 kHz = 24000 ms
    assert(audioMeta(xing(mono = false, "Xing", 1000))
      .contains(("mp3", 48000, 2, 24000L)))
    assert(audioMeta(xing(mono = true, "Xing", 1000))
      .contains(("mp3", 48000, 1, 24000L)))
    assert(audioMeta(xing(mono = false, "Info", 500))
      .contains(("mp3", 48000, 2, 12000L)))
    assert(audioMeta(vbri(500)).contains(("mp3", 48000, 2, 12000L)))
    // a frames-flag-less Xing falls through to the CBR estimate
    val noFrames = head(mono = false) ++ new Array[Byte](32) ++
      ascii("Xing") ++ be32(0) ++ new Array[Byte](20)
    val cbr = audioMeta(noFrames).get
    assert(cbr._1 == "mp3" && cbr._4 ==
      (noFrames.length - 26).toLong * 8000L / 128000L)
    // truncations of the VBR layouts never throw
    val x = xing(mono = false, "Xing", 1000)
    (0 to x.length).foreach(n => audioMeta(x.take(n)))
  }

  test("hostile chunk sizes: AVI inner/outer walks and the WAV walk terminate with null, never loop or throw") {
    // AVI hdrl child declaring size 0xFFFFFFF8 — the advice's
    // infinite-loop case (j += 8 + (-8) left j unchanged)
    val aviEvil = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(100) ++ ascii("hdrl") ++
      ascii("JUNK") ++ le32(0xFFFFFFF8L) ++ new Array[Byte](40)
    assert(videoMeta(aviEvil).isEmpty)
    // ...and 0xFFFFFFF0 (the j-negative / AIOOBE case)
    val aviEvil2 = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("LIST") ++ le32(100) ++ ascii("hdrl") ++
      ascii("JUNK") ++ le32(0xFFFFFFF0L) ++ new Array[Byte](40)
    assert(videoMeta(aviEvil2).isEmpty)
    // AVI outer walk: a ~2 GB declared chunk near the end must not
    // wrap `i` negative
    val aviOuter = ascii("RIFF") ++ le32(200) ++ ascii("AVI ") ++
      ascii("JUNK") ++ le32(0x7ffffff0L) ++ new Array[Byte](8)
    assert(videoMeta(aviOuter).isEmpty)
    // WAV: a huge declared chunk BEFORE fmt/data stops the walk
    // (null — fields never found), and one AFTER them still parses
    val wavEvilFirst = ascii("RIFF") ++ le32(1000) ++ ascii("WAVE") ++
      ascii("JUNK") ++ le32(0x7ffffff0L) ++ new Array[Byte](8) ++
      ascii("fmt ") ++ le32(16) ++ new Array[Byte](16)
    assert(audioMeta(wavEvilFirst).isEmpty)
    val wavTail = ascii("RIFF") ++ le32(1000) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++
      hexb("0100 0200") ++ le32(8000) ++ le32(32000) ++
      hexb("0400 1000") ++
      ascii("data") ++ le32(0x7ffffff0L) // header-only payload
    assert(audioMeta(wavTail).contains(
      ("wav", 8000, 2, 0x7ffffff0L * 1000L / 32000L)))
    // arbitrary-byte fuzz over the NEW branches too (EBML magic +
    // random tails)
    val rnd = new scala.util.Random(12)
    (0 until 300).foreach { _ =>
      val tail = Array.fill[Byte](rnd.nextInt(96))(rnd.nextInt.toByte)
      videoMeta(hexb("1A45DFA3") ++ tail)
      audioMeta(ascii("ID3") ++ tail)
      videoMeta(ascii("RIFF") ++ tail)
      audioMeta(ascii("RIFF") ++ tail)
    }
  }

  test("StreamDlq: an empty (or all-null-ts) first batch leaves later batches un-fenced") {
    val work = tmp("graft-r12dlq-")
    val (state, mainD, dlqD) = (s"$work/st", s"$work/main", s"$work/dlq")
    def batch(rows: (Long, String)*) = rows.toSeq
      .toDF("event_id", "ts_s")
      .select(col("event_id"),
        col("ts_s").cast("timestamp").as("ts"))
    val schema = batch().schema
    // batch 0 is EMPTY: no watermark can exist yet (the advice bug
    // persisted Long.MinValue here, and `w - horizon` then
    // underflowed so every later row was silently dead-lettered)
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(), "ts", horizonMs = 3600000L, batchId = 0L)
    // batch 1: all-null event time — still no watermark
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(1L -> null), "ts", horizonMs = 3600000L, batchId = 1L)
    // batch 2: first real event times — must ALL land in main
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(2L -> "2024-01-01 09:00:00", 3L -> "2024-01-01 10:00:00"),
      "ts", horizonMs = 3600000L, batchId = 2L)
    def ids(dir: String) = graft.streaming.StreamDlq
      .readSide(spark, dir, schema)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids(mainD) == Seq(1L, 2L, 3L),
      s"rows were dead-lettered under a phantom watermark: main=${ids(mainD)}")
    assert(ids(dlqD).isEmpty)
    // and the watermark NOW exists: batch 3's stale row routes to dlq
    graft.streaming.StreamDlq.applyBatch(spark, state, mainD, dlqD,
      batch(4L -> "2024-01-01 08:30:00", 5L -> "2024-01-01 10:30:00"),
      "ts", horizonMs = 3600000L, batchId = 3L)
    assert(ids(dlqD) == Seq(4L), "the real watermark must still fence")
    assert(ids(mainD) == Seq(1L, 2L, 3L, 5L))
  }

  test("mergeInto: a NULL op row fails loud instead of silently deleting its key") {
    import graft.sink.MorLog
    val work = tmp("graft-r12mrg-")
    val dir = s"$work/t"
    MorLog.create(spark.range(0, 10)
      .select(col("id"), (col("id") * 2).as("v")), dir)
    val bad = Seq((1L, 111L, null.asInstanceOf[String]),
      (2L, 222L, "U")).toDF("id", "v", "_op")
    val e = intercept[IllegalArgumentException] {
      MorLog.mergeInto(spark, dir, bad, "id", "_op")
    }
    assert(e.getMessage.contains("NULL"))
    // nothing committed, nothing tombstoned
    assert(MorLog.versions(spark, dir) == Seq(0))
    assert(MorLog.read(spark, dir).count() == 10)
  }

  test("deleteWhere on a shallow clone: file-drop accounting subtracts the dropped files' pre-existing tombstones") {
    import graft.sink.MorLog
    val work = tmp("graft-r12cln-")
    val (src, dst) = (s"$work/src", s"$work/dst")
    // two single-file versions with disjoint id ranges, so stats can
    // prove a whole-file drop
    MorLog.create(spark.range(0, 50)
      .select(col("id"), (col("id") % 7).as("g")).coalesce(1), src)
    MorLog.append(spark, src, spark.range(50, 100)
      .select(col("id"), (col("id") % 7).as("g")).coalesce(1))
    // one pre-existing tombstone INSIDE the file the delete will drop
    assert(MorLog.deleteWhere(spark, src, col("id") === 75L) == 1L)
    MorLog.shallowClone(spark, src, dst)
    // metadata-only drop of the upper file (clone references it by
    // ABSOLUTE path; the tombstone set keys by basename — the advice
    // bug returned 50 here, recounting id=75)
    val n = MorLog.deleteWhere(spark, dst, col("id") >= 50L)
    assert(graft.sink.MorLogStats.lastFilesDropped == 1,
      "the upper file must drop wholesale (metadata-only tier)")
    assert(n == 49L, s"newly-deleted must exclude the pre-existing " +
      s"tombstone, got $n")
    assert(MorLog.read(spark, dst).count() == 50L)
    // the source is untouched
    assert(MorLog.read(spark, src).count() == 99L)
  }

  test("q250/q254 round trip: the in-plan builders and the parsers agree on every new format branch") {
    val d = "/root/testdata/sf0.001"
    val a = queries.LlmQueries.audioMeta(spark, d)
    // non-vacuity: both VBR layouts present and parsed
    val vbr = a.filter(col("doc_id") % 4 === 3 &&
      col("doc_id") % 29 =!= 0)
    val n3 = vbr.filter(col("doc_id") % 8 === 3).count()
    val n7 = vbr.filter(col("doc_id") % 8 === 7).count()
    assert(n3 > 0 && n7 > 0, s"need both Xing ($n3) and VBRI ($n7) rows")
    assert(vbr.filter(col("format").isNull).count() == 0,
      "a VBR payload failed to parse")
    val bad = vbr.filter(col("duration_ms") =!=
      expr("""(doc_id % 2000 + 100) * 1152 * 1000 div
        (CASE (doc_id % 5) % 3 WHEN 0 THEN 44100
         WHEN 1 THEN 48000 ELSE 32000 END)""")).count()
    assert(bad == 0, s"$bad VBR duration mismatches")
    val v = queries.LlmQueries.videoMeta(spark, d)
    val ebml = v.filter(col("doc_id") % 3 === 2 &&
      col("doc_id") % 23 =!= 0).persist()
    assert(ebml.filter(col("format") === "webm").count() > 0)
    assert(ebml.filter(col("format") === "mkv").count() > 0)
    val vbad = ebml.filter(col("duration_ms") =!=
      (col("doc_id") % 900 + 1) * (col("doc_id") % 4 + 1) ||
      col("width") =!= col("doc_id") % 1280 + 16).count()
    assert(vbad == 0, s"$vbad EBML round-trip mismatches")
    ebml.unpersist()
  }
}
